#!/usr/bin/env python3
"""Independent exact oracle for the PQ/IVF ANN family at scale SFs.

The registered DuckDB oracles for emb_pq_codes / ann_l2_pq / ann_ivf_pq
unroll the codebook training as CROSS JOIN + window CTEs — feasible to
sf1, but the n x K assignment windows exceed DuckDB memory at sf10
(r9 verdict #3: the sf10 spot-gate had an ANN blind spot). This tool is
the scale_oracle_embed.py pattern applied to product quantization: a
bit-exact numpy replay of the INTEGER codebook training, encoding, ADC
tables and IVF routing, compared row-for-row against the Spark dumps.

Bit-exactness, op by op (mirrors Pq.scala / Similarity.scala):
- quantize: q = floor(float64(e) * 4096) as int64 (scale is a power of
  two — exact in every engine).
- PQ training (per subspace m of M=4, Dsub=16, K=8): seeds = q of
  vec_id < 8 labeled by ACTUAL vec_id; one Lloyd iteration; assignment =
  argmin exact-int64 L2^2 (ties -> lowest cell id = numpy argmin's first
  occurrence over cell-ascending centroids); update = floor(double(sum)/n)
  per dim (sums < 2^40 so the division is exact); empty cells keep seeds.
- codes / ADC: all distances are exact int64 sums of squared integer
  differences — no floats anywhere, so equality is integer equality.
- IVF training (K=16, 2 Lloyd iterations): centroids are per-cell integer
  SUMS (cosine is scale-invariant); sim = float64(int64 dot) /
  sqrt(float64(arbitrary-precision norm)) — python ints reproduce the
  Scala BigInt norm, and int64->float64 is the same IEEE conversion in
  both engines; assignment = argmax sim (ties -> lowest cent_id); cells
  with no members DROP from the next round (Spark groupBy semantics),
  unlike PQ's keep-seed rule.
- ann_cosine_ivf (optional --ops entry): the r10 capped query population
  (vec_id % max(10, ceil(n/1000)) == 0) probes its NProbe=8 best cells;
  candidate cosines are float64 PER-DIMENSION-ORDER accumulation over the
  RAW float32 embeddings (the scale_oracle_embed.py trick) — bit-identical
  to graftCosine / the list_sum oracle, compared bitwise. This is the
  numpy fallback for the SF where even the now-linear SQL oracle is too
  slow in DuckDB.

Usage: scale_oracle_pq.py <sfDir> <sparkVerifyDir>
         [--ops emb_pq_codes,ann_l2_pq,ann_ivf_pq,ann_cosine_ivf]
  <sparkVerifyDir> must contain a <op>/ parquet dir per requested op
  (graft.Verify / graft.VerifyOne output layout).
Exits 0 when every requested op matches exactly.
"""
import sys, glob
import numpy as np
import pandas as pd

DIM, SCALE = 64, 4096
M, DSUB, KPQ = 4, 16, 8
PQ_QUERIES, PQ_TOPK = 50, 5
IVF_K, NPROBE, IVF_TOPK, IVF_QUERY_CAP = 16, 8, 3, 1000


def load_embeddings(sf):
    p = f"{sf}/embeddings.parquet"
    fs = sorted(glob.glob(f"{p}/*.parquet")) or [p]
    df = pd.concat([pd.read_parquet(f, columns=["vec_id", "embedding"]) for f in fs])
    ids = df["vec_id"].to_numpy(np.int64)
    emb = np.stack(df["embedding"].to_numpy()).astype(np.float32)
    order = np.argsort(ids, kind="stable")
    return ids[order], emb[order]


def load_dump(out, op):
    fs = sorted(glob.glob(f"{out}/{op}/*.parquet"))
    if not fs:
        print(f"FAIL: no Spark dump at {out}/{op}")
        sys.exit(1)
    return pd.concat([pd.read_parquet(f) for f in fs])


def compare(op, oracle, spark, keys, int_cols, bit_cols=()):
    oracle = oracle.sort_values(keys).reset_index(drop=True)
    spark = spark[oracle.columns].sort_values(keys).reset_index(drop=True)
    if len(oracle) != len(spark):
        print(f"FAIL {op}: rows spark={len(spark)} oracle={len(oracle)}")
        return False
    for c in int_cols:
        same = oracle[c].to_numpy(np.int64) == spark[c].to_numpy(np.int64)
        if not same.all():
            for b in np.nonzero(~same)[0][:5]:
                print(f"{op} {c} diff @ {b}:", oracle.iloc[b].to_dict(), spark.iloc[b].to_dict())
            print(f"FAIL {op}: {np.count_nonzero(~same)} mismatches in {c}")
            return False
    for c in bit_cols:
        same = (oracle[c].to_numpy(np.float64).view(np.int64)
                == spark[c].to_numpy(np.float64).view(np.int64))
        if not same.all():
            for b in np.nonzero(~same)[0][:5]:
                print(f"{op} {c} diff @ {b}:", oracle.iloc[b].to_dict(), spark.iloc[b].to_dict())
            print(f"FAIL {op}: {np.count_nonzero(~same)} not bit-identical in {c}")
            return False
    print(f"PASS {op}: {len(oracle)} rows exact")
    return True


# ---------------------------------------------------------------- PQ
def train_pq(ids, q):
    """[m] -> list of (cell_id, centroid int64[DSUB]) in cell-id order."""
    seed_mask = ids < KPQ
    seed_ids = ids[seed_mask]
    order = np.argsort(seed_ids)
    seed_ids = seed_ids[order]
    books = []
    for m in range(M):
        sub = q[:, m * DSUB:(m + 1) * DSUB]
        seeds = sub[seed_mask][order]
        # assignment: argmin exact L2^2, first occurrence = lowest cell id
        d2 = ((sub[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2)  # n x K int64
        cell = d2.argmin(axis=1)
        cents = []
        for j, cid in enumerate(seed_ids):
            members = sub[cell == j]
            if len(members) == 0:
                cents.append((int(cid), seeds[j].copy()))
            else:
                s = members.sum(axis=0, dtype=np.int64)
                cents.append((int(cid), np.floor(s.astype(np.float64) / len(members)).astype(np.int64)))
        books.append(cents)
    return books


def encode_pq(q, books):
    """n x M int codes (cell LABELS, not indices)."""
    codes = np.empty((q.shape[0], M), dtype=np.int64)
    for m in range(M):
        sub = q[:, m * DSUB:(m + 1) * DSUB]
        cents = np.stack([c for _, c in books[m]])
        d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        idx = d2.argmin(axis=1)
        labels = np.array([cid for cid, _ in books[m]], dtype=np.int64)
        codes[:, m] = labels[idx]
    return codes


def pq_dtable(q, books, query_rows):
    """[qi, m, cell-index] -> exact int64 d2 (labels are cell-ascending)."""
    tbl = np.empty((len(query_rows), M, KPQ), dtype=np.int64)
    for m in range(M):
        sub = q[query_rows][:, m * DSUB:(m + 1) * DSUB]
        cents = np.stack([c for _, c in books[m]])
        tbl[:, m, :] = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return tbl


def topk_rows(qid, nids, key, extra, k):
    """rank by (key asc, nid asc); returns list of row dicts."""
    order = np.lexsort((nids, key))[:k]
    return [dict(query_id=int(qid), rank=r + 1, neighbor_id=int(nids[i]),
                 **{kk: vv[i] for kk, vv in extra.items()})
            for r, i in enumerate(order)]


# ---------------------------------------------------------------- IVF
def train_ivf(ids, q):
    """2 Lloyd iterations; returns (labels int64[C], cents int64[C, DIM])."""
    seed_mask = ids < IVF_K
    order = np.argsort(ids[seed_mask])
    labels = ids[seed_mask][order]
    cents = q[seed_mask][order].copy()
    for _ in range(2):
        cell_idx = ivf_assign(q, labels, cents)
        new_labels, new_cents = [], []
        for j, cid in enumerate(labels):
            members = q[cell_idx == j]
            if len(members):  # empty cells DROP (Spark groupBy semantics)
                new_labels.append(cid)
                new_cents.append(members.sum(axis=0, dtype=np.int64))
        labels = np.array(new_labels, dtype=np.int64)
        cents = np.stack(new_cents)
    return labels, cents


def ivf_sims(q, cents):
    """float64 sim matrix: float64(int64 dot) / sqrt(float64(exact norm))."""
    # python ints for norms — the Scala BigInt / DuckDB HUGEINT twin
    norms = np.array([float(sum(int(v) * int(v) for v in c)) for c in cents])
    dots = (q @ cents.T).astype(np.float64)  # int64 matmul, exact
    return dots / np.sqrt(norms)[None, :]


def ivf_assign(q, labels, cents):
    return ivf_sims(q, cents).argmax(axis=1)  # ties -> first = lowest cent_id


def seq_dot(a64, b64):
    acc = np.zeros(a64.shape[0], dtype=np.float64)
    for i in range(a64.shape[1]):
        acc += a64[:, i] * b64[:, i]
    return acc


def main():
    sf, out = sys.argv[1], sys.argv[2]
    ops = ["emb_pq_codes", "ann_l2_pq", "ann_ivf_pq"]
    if "--ops" in sys.argv:
        ops = sys.argv[sys.argv.index("--ops") + 1].split(",")
    ids, emb = load_embeddings(sf)
    q = np.floor(emb.astype(np.float64) * SCALE).astype(np.int64)
    ok = True

    need_pq = bool({"emb_pq_codes", "ann_l2_pq", "ann_ivf_pq"} & set(ops))
    if need_pq:
        books = train_pq(ids, q)
        codes = encode_pq(q, books)

    if "emb_pq_codes" in ops:
        oracle = pd.DataFrame({
            "vec_id": np.repeat(ids, M),
            "m": np.tile(np.arange(M, dtype=np.int64), len(ids)),
            "code": codes.reshape(-1),
        })
        ok &= compare("emb_pq_codes", oracle, load_dump(out, "emb_pq_codes"),
                      ["vec_id", "m"], ["vec_id", "m", "code"])

    q_mask = ids < PQ_QUERIES
    q_rows = np.nonzero(q_mask)[0]
    if "ann_l2_pq" in ops and len(q_rows):
        tbl = pq_dtable(q, books, q_rows)
        # code labels -> cell indices for table lookup
        label_to_idx = [{cid: j for j, (cid, _) in enumerate(books[m])} for m in range(M)]
        code_idx = np.stack([np.vectorize(label_to_idx[m].get)(codes[:, m])
                             for m in range(M)], axis=1)
        rows = []
        for qi, ri in enumerate(q_rows):
            d2 = np.zeros(len(ids), dtype=np.int64)
            for m in range(M):
                d2 += tbl[qi, m][code_idx[:, m]]
            keep = ids != ids[ri]
            rows += topk_rows(ids[ri], ids[keep], d2[keep],
                              {"approx_d2": d2[keep]}, PQ_TOPK)
        oracle = pd.DataFrame(rows)
        ok &= compare("ann_l2_pq", oracle, load_dump(out, "ann_l2_pq"),
                      ["query_id", "rank"],
                      ["query_id", "rank", "neighbor_id", "approx_d2"])

    need_ivf = bool({"ann_ivf_pq", "ann_cosine_ivf"} & set(ops))
    if need_ivf:
        labels, cents = train_ivf(ids, q)
        cell_idx = ivf_assign(q, labels, cents)
        cell_of = labels[cell_idx]

    if "ann_ivf_pq" in ops and len(q_rows):
        tbl = pq_dtable(q, books, q_rows)
        label_to_idx = [{cid: j for j, (cid, _) in enumerate(books[m])} for m in range(M)]
        code_idx = np.stack([np.vectorize(label_to_idx[m].get)(codes[:, m])
                             for m in range(M)], axis=1)
        sims = ivf_sims(q[q_rows], cents)
        rows = []
        for qi, ri in enumerate(q_rows):
            # top NPROBE cells: sim desc, cent_id asc (lexsort on (-sim, label))
            probe = np.lexsort((labels, -sims[qi]))[:NPROBE]
            cand = np.nonzero(np.isin(cell_idx, probe) & (ids != ids[ri]))[0]
            d2 = np.zeros(len(cand), dtype=np.int64)
            for m in range(M):
                d2 += tbl[qi, m][code_idx[cand, m]]
            rows += topk_rows(ids[ri], ids[cand], d2,
                              {"approx_d2": d2, "cell": cell_of[cand]}, PQ_TOPK)
        oracle = pd.DataFrame(rows)[["query_id", "rank", "neighbor_id", "cell", "approx_d2"]]
        ok &= compare("ann_ivf_pq", oracle, load_dump(out, "ann_ivf_pq"),
                      ["query_id", "rank"],
                      ["query_id", "rank", "neighbor_id", "cell", "approx_d2"])

    if "ann_cosine_ivf" in ops:
        mod = max(10, int(np.ceil(len(ids) / IVF_QUERY_CAP)))
        qrows = np.nonzero(ids % mod == 0)[0]
        emb64 = emb.astype(np.float64)
        nrm = np.sqrt(seq_dot(emb64, emb64))
        sims = ivf_sims(q[qrows], cents)
        rows = []
        for qi, ri in enumerate(qrows):
            probe = np.lexsort((labels, -sims[qi]))[:NPROBE]
            cand = np.nonzero(np.isin(cell_idx, probe) & (ids != ids[ri]))[0]
            dot = seq_dot(emb64[cand], np.broadcast_to(emb64[ri], (len(cand), DIM)))
            cos = dot / (nrm[ri] * nrm[cand])
            order = np.lexsort((ids[cand], -cos))[:IVF_TOPK]
            rows += [dict(query_id=int(ids[ri]), rank=r + 1,
                          neighbor_id=int(ids[cand][i]), cell=int(cell_of[cand][i]),
                          cosine=cos[i])
                     for r, i in enumerate(order)]
        oracle = pd.DataFrame(rows)[["query_id", "rank", "neighbor_id", "cell", "cosine"]]
        ok &= compare("ann_cosine_ivf", oracle, load_dump(out, "ann_cosine_ivf"),
                      ["query_id", "rank"],
                      ["query_id", "rank", "neighbor_id", "cell"], ["cosine"])

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
