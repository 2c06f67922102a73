#!/usr/bin/env python3
"""Design-time parameter sweep for ann_cosine_ivf (round 8).

Replicates the Spark implementation exactly — fixed-point BIGINT
quantization floor(e*4096), seed = K lowest vec_ids, integer-sum
centroids, cosine assignment with (sim DESC, cent_id ASC) tie-break —
and measures recall@3 vs the exact brute-force top-3 for the
vec_id % 10 == 0 query set, sweeping (K, lloyd_iters, nprobe).

Usage: python3 tools/ivf_sweep.py <corpusDir> [--json out.json]
  --json: additionally emit the sweep as a committed-artifact JSON
  (r9 verdict #6: the demo-corpus recall evidence should be reviewable
  across rounds, not live only in test assertions) — one entry per
  (K, iters, nprobe) with recall@3, scan fraction and cell stats, plus
  the corpus provenance.
"""
import json
import sys

import duckdb
import numpy as np

d = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
json_out = sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv else None
# testdata is a single parquet file; Spark-written corpora (Sf1Gen,
# DemoGen) are directories of part files — handle both
import os
p = f"{d}/embeddings.parquet"
src = f"{p}/*.parquet" if os.path.isdir(p) else p
rows = duckdb.sql(
    f"select vec_id, embedding from '{src}' order by vec_id"
).fetchall()
ids = np.array([r[0] for r in rows], dtype=np.int64)
emb = np.array([r[1] for r in rows], dtype=np.float64)  # float32 -> exact in f64
n, dim = emb.shape
q = np.floor(emb * 4096.0).astype(np.int64)

nrm = np.sqrt((emb * emb).sum(axis=1))
qmask = ids % 10 == 0
qidx = np.where(qmask)[0]

# exact ground truth top-3 (excluding self)
cos = (emb @ emb.T) / np.outer(nrm, nrm)
np.fill_diagonal(cos, -2.0)
gt = {}
for qi in qidx:
    order = np.lexsort((ids, -cos[qi]))[:3]
    gt[qi] = set(order.tolist())


def train(K, iters):
    cents = q[np.argsort(ids)[:K]].astype(object)  # exact big-int arithmetic
    cids = np.sort(ids)[:K].astype(np.int64)
    for _ in range(iters):
        sims = assign_sims(cents)
        cell = best_cell(sims, cids)
        new_c, new_ids = [], []
        for ci in np.unique(cell):
            new_c.append(q[cell == ci].sum(axis=0))
            new_ids.append(ci)
        cents = np.array(new_c, dtype=object)
        cids = np.array(new_ids, dtype=np.int64)
    return cents, cids


def assign_sims(cents):
    cn = np.array([float(sum(int(v) * int(v) for v in c)) for c in cents])
    dots = q.astype(np.float64) @ np.array(cents.tolist(), dtype=np.float64).T
    return dots / np.sqrt(cn)


def best_cell(sims, cids):
    # argmax sim, ties to lowest cent_id: lexsort on (-sim, cid)
    order = np.argsort(cids)
    best = np.empty(len(sims), dtype=np.int64)
    for i in range(len(sims)):
        j = max(range(sims.shape[1]), key=lambda c: (sims[i, c], -cids[c]))
        best[i] = cids[j]
    return best


entries = []
for K in (16, 32):
    for iters in (2, 4, 6, 8):
        cents, cids = train(K, iters)
        sims = assign_sims(cents)
        cell = best_cell(sims, cids)
        cellmap = {c: np.where(cell == c)[0] for c in np.unique(cell)}
        sizes = sorted((len(v) for v in cellmap.values()), reverse=True)
        for nprobe in (2, 3, 4, 6):
            hits = tot = probed = 0
            for qi in qidx:
                pr = sorted(range(sims.shape[1]),
                            key=lambda c: (-sims[qi, c], cids[c]))[:nprobe]
                cand = np.concatenate([cellmap.get(cids[c], np.empty(0, np.int64))
                                       for c in pr]).astype(np.int64)
                probed += len(cand)
                cand = cand[cand != qi]
                top = cand[np.lexsort((ids[cand], -cos[qi][cand]))[:3]]
                hits += len(gt[qi] & set(top.tolist()))
                tot += 3
            print(f"K={K:3d} iters={iters} nprobe={nprobe} "
                  f"recall@3={hits / tot:.3f} scan={probed / (len(qidx) * n):.3f} "
                  f"max_cell={sizes[0]} cells={len(cellmap)}")
            entries.append(dict(K=K, iters=iters, nprobe=nprobe,
                                recall_at3=round(hits / tot, 4),
                                scan_fraction=round(probed / (len(qidx) * n), 4),
                                cells=len(cellmap), max_cell=int(sizes[0])))
if json_out:
    with open(json_out, "w") as f:
        json.dump(dict(corpus=d, n_vectors=int(n), n_queries=int(len(qidx)),
                       ground_truth="exact brute-force top-3 cosine",
                       sweep=entries), f, indent=1)
    print(f"wrote {json_out} ({len(entries)} entries)")
