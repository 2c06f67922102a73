#!/bin/bash
# r15 sf10 spot gate (r14 verdict #8): the standing 26-check set re-run on
# the r15 tree — 20 DuckDB hash checks + 6 bit-exact numpy verifications.
# Precondition: /tmp/sf10 generated (Sf1Gen 100x) and /tmp/sf10_verify
# holds VerifyOne dumps for all 25 distinct ops. MUST run on a quiet box.
set -u
cd /root/repo
OUT=/tmp/sf10_r15
mkdir -p "$OUT"

DUCK_OPS=ann_cosine_int8,ann_cosine_ivf,ann_cosine_ivf_probe,ann_cosine_lsh,ann_ivf_incr,corpus_epoch_plan,corpus_pack_segments,corpus_pack_write,corpus_token_budget,dedup_embed_cosine_prod,dedup_exact,dedup_minhash_lsh,dedup_simhash,dv_go_derived,dv_load_from_repo,dv_pit_incr,graph_pagerank,knn_cosine,text_bm25

echo "=== DuckDB compare (19 light ops) ==="
DUCKDB_SPILL_CAP=65GB python3 tools/verify_local.py /tmp/sf10 /tmp/sf10_verify \
  --only "$DUCK_OPS" --timeout 1800 2>&1 | tee "$OUT/duck_light.log"

echo "=== DuckDB compare (dedup_cluster — needs the 65GB spill cap + 1800s) ==="
DUCKDB_SPILL_CAP=65GB python3 tools/verify_local.py /tmp/sf10 /tmp/sf10_verify \
  --only dedup_cluster --timeout 1800 2>&1 | tee "$OUT/duck_cluster.log"

echo "=== numpy oracles ==="
python3 tools/scale_oracle_embed.py /tmp/sf10 /tmp/sf10_verify 2>&1 | tee "$OUT/np_embed.log"
python3 tools/scale_oracle_cluster.py /tmp/sf10 /tmp/sf10_verify --rounds-const 14 2>&1 | tee "$OUT/np_cluster.log"
python3 tools/scale_oracle_pq.py /tmp/sf10 /tmp/sf10_verify 2>&1 | tee "$OUT/np_pq.log"
python3 tools/scale_oracle_pq.py /tmp/sf10 /tmp/sf10_verify --ops ann_cosine_ivf 2>&1 | tee "$OUT/np_ivf.log"
echo done
