#!/bin/bash
# r13 evidence runner (r12 verdict #1): the sf10 isolated heavy-op table
# with per-op spill attribution on the BINARY-digest vault, plus the full
# quiet sf10 ratio table. Mirrors the r11 methodology (BENCH_sf10_r11):
# fresh-JVM isolated runs for the five heaviest ops (their "big" is the
# headline), one quiet full run for the rest. MUST run on a quiet box.
set -u
cd /root/repo
export SPARK_DRIVER_MEM=48g
export SPARK_GRAFT_CPUS=32
export GRAFT_SPILL_ROOT=/tmp
OUT=/tmp/sf10_r13
mkdir -p "$OUT"

ISOLATED="dv_go_build dv_go_derived dv_go_build_bucketed graph_pagerank text_lm_score"
for op in $ISOLATED; do
  echo "=== isolated $op ==="
  sbt -error "runMain graft.Sf1Bench /root/testdata/sf0.1 /tmp/sf10 $op" \
    > "$OUT/iso_$op.json" 2> "$OUT/iso_$op.log"
  echo "exit=$? $(tail -c 400 "$OUT/iso_$op.json")"
done

# full quiet table: every Sf1Bench watched op (39 — the r11 35 plus the
# r12 additions incl. corpus_pack_write, whose spill decides verdict #6)
FULL=$(python3 - <<'EOF'
import re
src = open('src/main/scala/graft/Sf1Bench.scala').read()
block = re.search(r'val Ops: Seq\[String\] = Seq\((.*?)\)\n', src, re.S).group(1)
print(','.join(re.findall(r'"(\w+)"', block)))
EOF
)
echo "=== full quiet table: $FULL ==="
sbt -error "runMain graft.Sf1Bench /root/testdata/sf0.1 /tmp/sf10 $FULL" \
  > "$OUT/full.json" 2> "$OUT/full.log"
echo "exit=$?"
echo done
