#!/usr/bin/env python3
"""Independent exact oracle for dedup_embed_cosine at scale SFs.

The registered DuckDB oracle is the all-pairs SQL form — hash-exact and
feasible up to sf1 (20k vectors), but Theta(n^2) row materialization makes
it infeasible in SQL at sf10 (200k vectors => 2e10 candidate rows through
the join machinery). This tool is the same EXACT all-pairs answer computed
the way a numeric kernel should: blocked float32 GEMM proposes candidates
with a safety margin, then each candidate's cosine is recomputed in
float64 with PER-DIMENSION-ORDER accumulation — `acc += a[:,i] * b[:,i]`
iterated i = 0..63 applies the adds to every pair's accumulator in exactly
the index order the Spark kernel (Similarity.embedDedup) and the DuckDB
list_sum oracle use, so the final doubles are bit-identical, not merely
close. The tau compare and the emitted cosine are therefore exact twins
of the gate's, and the comparison below demands bitwise equality.

Usage: scale_oracle_embed.py <sfDir> <sparkOutDir> [tau]
Exits 0 on exact match (same pair set, bitwise-equal cosines).
"""
import sys, glob
import numpy as np
import pandas as pd

def load_embeddings(sf):
    p = f"{sf}/embeddings.parquet"
    fs = sorted(glob.glob(f"{p}/*.parquet")) if glob.glob(f"{p}/*.parquet") else [p]
    df = pd.concat([pd.read_parquet(f, columns=["vec_id", "embedding"]) for f in fs])
    ids = df["vec_id"].to_numpy(np.int64)
    emb = np.stack(df["embedding"].to_numpy()).astype(np.float32)
    order = np.argsort(ids, kind="stable")
    return ids[order], emb[order]

def seq_norms(emb64):
    # sequential per-dim accumulation == the Scala kernel's while-loop order
    acc = np.zeros(emb64.shape[0], dtype=np.float64)
    for i in range(emb64.shape[1]):
        x = emb64[:, i]
        acc += x * x
    return np.sqrt(acc)

def main():
    sf, out = sys.argv[1], sys.argv[2]
    tau = float(sys.argv[3]) if len(sys.argv) > 3 else 0.4
    ids, emb = load_embeddings(sf)
    n, d = emb.shape
    emb64 = emb.astype(np.float64)
    sn = seq_norms(emb64)
    # candidate pass: float32 GEMM on pre-normalized vectors; margin covers
    # the ~1e-5 sgemm rounding so no true pair can be proposed-out
    margin = 1e-3
    unit = (emb64 / sn[:, None]).astype(np.float32)
    cand_i, cand_j = [], []
    B = 2048
    for s0 in range(0, n, B):
        c = unit[s0:s0 + B] @ unit.T
        ii, jj = np.nonzero(c >= tau - margin)
        gi = ii + s0
        keep = gi < jj          # upper triangle only (ids are sorted)
        cand_i.append(gi[keep]); cand_j.append(jj[keep])
    ci = np.concatenate(cand_i); cj = np.concatenate(cand_j)
    # exact pass: bit-identical float64 sequential-order dot per candidate
    dot = np.zeros(len(ci), dtype=np.float64)
    for i in range(d):
        dot += emb64[ci, i] * emb64[cj, i]
    cos = dot / (sn[ci] * sn[cj])
    keep = cos >= tau
    oracle = pd.DataFrame({
        "vec_a": np.minimum(ids[ci[keep]], ids[cj[keep]]),
        "vec_b": np.maximum(ids[ci[keep]], ids[cj[keep]]),
        "cosine": cos[keep],
    }).sort_values(["vec_a", "vec_b"]).reset_index(drop=True)

    fs = sorted(glob.glob(f"{out}/*.parquet"))
    spark = pd.concat([pd.read_parquet(f) for f in fs]) \
        .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    print(f"oracle pairs: {len(oracle)}  spark pairs: {len(spark)}")
    if len(oracle) != len(spark):
        mo = pd.merge(oracle, spark, on=["vec_a", "vec_b"], how="outer",
                      indicator=True, suffixes=("_o", "_s"))
        print(mo[mo["_merge"] != "both"].head(10))
        print("FAIL: pair-set size mismatch"); sys.exit(1)
    same_pairs = (oracle["vec_a"].to_numpy() == spark["vec_a"].to_numpy()).all() \
        and (oracle["vec_b"].to_numpy() == spark["vec_b"].to_numpy()).all()
    if not same_pairs:
        print("FAIL: pair sets differ"); sys.exit(1)
    bitwise = (oracle["cosine"].to_numpy().view(np.int64)
               == spark["cosine"].to_numpy().view(np.int64))
    if not bitwise.all():
        bad = np.nonzero(~bitwise)[0][:5]
        for b in bad:
            print("cosine diff:", oracle.iloc[b].to_dict(), spark.iloc[b].to_dict())
        print(f"FAIL: {np.count_nonzero(~bitwise)} cosines not bit-identical"); sys.exit(1)
    print(f"PASS: {len(oracle)} pairs, pair set and cosines bit-identical")
    sys.exit(0)

if __name__ == "__main__":
    main()
