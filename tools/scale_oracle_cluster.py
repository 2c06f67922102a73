#!/usr/bin/env python3
"""Independent oracle for dedup_cluster_embed at scale SFs.

The registered DuckDB oracle unrolls min-label propagation over the pair
graph produced by the ALL-PAIRS embed SQL — infeasible past sf1 (the
pair CTE is Theta(n^2) candidate rows). At scale the pair set itself is
verified bit-exactly by scale_oracle_embed.py; THIS tool closes the
clustering on top of it with a driver-independent union-find (the same
adjudication the r8 judge used): components over the verified pair set,
canon = component minimum, sizes, is_canonical — compared row-for-row
against Spark's dedup_cluster_embed dump.

Usage: scale_oracle_cluster.py <sfDir> <sparkVerifyDir> [--rounds-const N]
  <sparkVerifyDir> must contain dedup_embed_cosine/ (the verified pairs)
  and dedup_cluster_embed/ (the clustering under test) parquet dirs.
  --rounds-const N: additionally replay the unrolled oracle's EXACT
  propagate+jump algorithm on THIS pair graph and fail unless N leaves
  >= 2 rounds of convergence margin — the same measurement
  CcOracleConvergenceSpec makes at sf0.1, applied at the SF under test
  (ADVICE r9: a bigger graph could need more rounds than sf0.1 did —
  the exact failure mode r8 hit — so any SF that trusts an unrolled
  fixed-round DuckDB oracle should run this first).
Exits 0 on exact match.
"""
import sys, glob
import numpy as np
import pandas as pd


def rounds_needed(edges, target, nodes, max_rounds=40):
    """Smallest propagate+jump round count after which labels equal the
    union-find component minimum (the unrolled oracle's convergence
    criterion). Mirrors CcOracleConvergenceSpec.roundsNeeded."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lbl = {n: n for n in nodes}
    for k in range(1, max_rounds + 1):
        p = {n: min([l] + [lbl[m] for m in adj.get(n, ())]) for n, l in lbl.items()}
        lbl = {n: p.get(l, l) for n, l in p.items()}  # pointer jump
        if lbl == target:
            return k
    return None


def load_dir(path, cols):
    fs = sorted(glob.glob(f"{path}/*.parquet")) or [path]
    return pd.concat([pd.read_parquet(f, columns=cols) for f in fs])


def main():
    sf, out = sys.argv[1], sys.argv[2]
    emb = f"{sf}/embeddings.parquet"
    efs = sorted(glob.glob(f"{emb}/*.parquet")) or [emb]
    vec_ids = pd.concat([pd.read_parquet(f, columns=["vec_id"]) for f in efs])["vec_id"].to_numpy(np.int64)
    pairs = load_dir(f"{out}/dedup_embed_cosine", ["vec_a", "vec_b"])
    spark = load_dir(f"{out}/dedup_cluster_embed",
                     ["vec_id", "canon_id", "cluster_size", "is_canonical"]) \
        .sort_values("vec_id").reset_index(drop=True)

    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["vec_a"].to_numpy(np.int64), pairs["vec_b"].to_numpy(np.int64)):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # canon = component minimum

    canon = np.array([find(v) for v in vec_ids], dtype=np.int64)
    sizes = pd.Series(canon).value_counts()
    oracle = pd.DataFrame({
        "vec_id": vec_ids,
        "canon_id": canon,
        "cluster_size": sizes.loc[canon].to_numpy(np.int64),
        "is_canonical": (vec_ids == canon).astype(np.int64),
    }).sort_values("vec_id").reset_index(drop=True)

    if len(oracle) != len(spark):
        print(f"FAIL: row count {len(spark)} vs oracle {len(oracle)}"); sys.exit(1)
    for c in ["vec_id", "canon_id", "cluster_size", "is_canonical"]:
        same = oracle[c].to_numpy(np.int64) == spark[c].to_numpy(np.int64)
        if not same.all():
            bad = np.nonzero(~same)[0][:5]
            for b in bad:
                print(f"{c} diff @ row {b}:", oracle.iloc[b].to_dict(), spark.iloc[b].to_dict())
            print(f"FAIL: {np.count_nonzero(~same)} mismatches in {c}"); sys.exit(1)
    n_cl = int((oracle["canon_id"] != oracle["vec_id"]).sum())
    print(f"PASS: {len(oracle)} rows, clustering exact (union-find ground truth; "
          f"{len(sizes[sizes > 1])} multi-member clusters, max size {int(sizes.max())}, "
          f"{n_cl} non-canonical members)")
    if "--rounds-const" in sys.argv:
        const = int(sys.argv[sys.argv.index("--rounds-const") + 1])
        edges = list(zip(pairs["vec_a"].to_numpy(np.int64).tolist(),
                         pairs["vec_b"].to_numpy(np.int64).tolist()))
        target = {int(v): int(find(v)) for v in vec_ids}
        needed = rounds_needed(edges, target, [int(v) for v in vec_ids])
        if needed is None or needed > const - 2:
            print(f"FAIL: this pair graph needs {needed} propagate+jump rounds; "
                  f"unrolled const {const} leaves < 2 rounds margin — do NOT trust "
                  f"the fixed-round DuckDB oracle at this SF")
            sys.exit(1)
        print(f"rounds: graph needs {needed}, const {const} (margin {const - needed}) OK")
    sys.exit(0)


if __name__ == "__main__":
    main()
