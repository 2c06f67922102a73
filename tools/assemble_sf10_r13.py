#!/usr/bin/env python3
"""Assemble BENCH_sf10_r13.json + SPILL_BUDGET_r13.json from the
tools/sf10_evidence_r13.sh outputs (r12 verdict #1 — the measurement the
r12 round claimed but never committed).

Usage: python3 tools/assemble_sf10_r13.py /tmp/sf10_r13 [quiet_local_bench.json]
"""
import json
import os
import sys

RUN = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_r13"
LOCAL = sys.argv[2] if len(sys.argv) > 2 else None
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ISOLATED = ["dv_go_build", "dv_go_derived", "dv_go_build_bucketed",
            "graph_pagerank", "text_lm_score"]


def load_line(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"metric"'):
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    full = load_line(f"{RUN}/full.json")
    iso = {}
    local = None
    if LOCAL and os.path.exists(LOCAL):
        local = json.load(open(LOCAL))
    for op in ISOLATED:
        d = load_line(f"{RUN}/iso_{op}.json")["ops"][op]
        if local and op in local.get("queries", {}):
            d["ratio_vs_quiet_local_small"] = round(d["big"] / local["queries"][op], 2)
        iso[op] = d

    bench = {
        "metric": "sf10_ratios_quiet",
        "sf_small": full["sf_small"],
        "sf_big": full["sf_big"],
        "n_ops": full["n_ops"],
        "failed": full["failed"],
        "max_ratio": full["max_ratio"],
        "methodology": (
            "r11 methodology re-run on the r13 tree (BINARY-digest vault): one quiet "
            "full run for the light set (39 watched ops — the r11 35 plus r12's "
            "ann_range_cosine/text_char_diversity/corpus_zipf_check/corpus_pack_write), "
            "PLUS fresh-JVM isolated re-runs for the five heaviest ops whose isolated "
            "'big' IS their headline. Small side timed twice per op, ratio = big / FIRST "
            "small pass; per-op spill_peak_mb = du(/tmp) peak minus op-start baseline "
            "sampled every 3 s during the big side (GRAFT_SPILL_ROOT inside Sf1Bench). "
            "Machine-noise disclosure: this host re-times identical code 2-7x slower than "
            "the r11 session's absolutes (r12 finding) — RATIOS and SPILL BYTES are the "
            "designed metrics, not absolute seconds."),
        "isolated": iso,
        "ops": full["ops"],
    }
    with open(f"{REPO}/BENCH_sf10_r13.json", "w") as f:
        json.dump(bench, f, indent=1)

    rows = []
    seen = set()
    for op, d in iso.items():
        if "spill_peak_mb" in d:
            rows.append({"op": op, "peak_gb": round(d["spill_peak_mb"] / 1000.0, 1),
                         "wall_s": d["big"], "source": "isolated fresh-JVM run"})
            seen.add(op)
    for op, d in full["ops"].items():
        if op not in seen and d.get("spill_peak_mb", 0) >= 1000:
            rows.append({"op": op, "peak_gb": round(d["spill_peak_mb"] / 1000.0, 1),
                         "wall_s": d["big"], "source": "full quiet run"})
    rows.sort(key=lambda r: -r["peak_gb"])

    r11_build, r11_bucketed = 46.5, 52.3
    build = next(r for r in rows if r["op"] == "dv_go_build")
    bucketed = next(r for r in rows if r["op"] == "dv_go_build_bucketed")
    spill = {
        "metric": "transient_disk_budget_per_op",
        "what": ("peak du -sb /tmp minus op-start baseline, sampled every 3 s during each "
                 "op's sf10 big-side run — the r12 BINARY-digest measurement the r11 "
                 "verdict demanded (done-bar: dv_go_build spill measurably below the r11 "
                 "46.5 GB; SPILL_BUDGET_r11.json is the comparison row). r12 never "
                 "committed this measurement; r13 closes it."),
        "binary_digest_verdict": {
            "dv_go_build": {"r11_hex_gb": r11_build, "r13_binary_gb": build["peak_gb"],
                            "reduction_pct": round(100 * (1 - build["peak_gb"] / r11_build), 1)},
            "dv_go_build_bucketed": {"r11_hex_gb": r11_bucketed, "r13_binary_gb": bucketed["peak_gb"],
                                     "reduction_pct": round(100 * (1 - bucketed["peak_gb"] / r11_bucketed), 1)},
        },
        "sf10_top_consumers_gb": rows[:10],
        "corpus_pack_write_gb": round(
            full["ops"].get("corpus_pack_write", {}).get("spill_peak_mb", 0) / 1000.0, 2),
        "headroom": "node disk 252 GB, ~78 GB free at run start; per-op rows in BENCH_sf10_r13.json",
    }
    with open(f"{REPO}/SPILL_BUDGET_r13.json", "w") as f:
        json.dump(spill, f, indent=1)
    print("wrote BENCH_sf10_r13.json + SPILL_BUDGET_r13.json")
    print(json.dumps(spill["binary_digest_verdict"], indent=1))


if __name__ == "__main__":
    main()
