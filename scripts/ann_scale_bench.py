#!/usr/bin/env python
"""ANN-at-scale rehearsal: build the IVF index and probe it (plus the
SRP-LSH path) on a synthetic 1M-vector corpus ~200x the driver's
embeddings table, with CLUSTERED structure so recall is meaningful,
and measure recall@k against an exact numpy brute-force on the same
queries.

The sf-scale driver gate (q_knn_ivf_recall, q_knn_lsh) proves the
operators are CORRECT; this rehearsal measures that the build-once /
probe-many contract and the bucket/cell pruning hold at a scale jump:
index build is one KMeans fit + one partitioned write, a batched
probe touches only nprobe/n_centroids of the corpus, and recall stays
high on clustered data (the realistic near-dup/embedding regime).

Corpus (deterministic, seeded): `n_centers` Gaussian centers in R^dim;
each center gets `per_center` members at noise sigma=0.08 (cosine to
own center ~0.99, cross-center ~0). Queries are `n_queries` corpus
members (exclude_self probing). Parquet written directly with pyarrow
in chunks — never GB-scale Python lists through createDataFrame.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_corpus(path: str, n_centers: int, per_center: int, dim: int,
               seed: int = 11) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, dim)).astype(np.float32)
    writer = None
    vid = 0
    chunk_centers = max(1, 200_000 // per_center)
    for lo in range(0, n_centers, chunk_centers):
        hi = min(lo + chunk_centers, n_centers)
        c = np.repeat(centers[lo:hi], per_center, axis=0)
        vecs = c + rng.normal(scale=0.08, size=c.shape).astype(np.float32)
        n = vecs.shape[0]
        ids = np.arange(vid, vid + n, dtype=np.int64)
        vid += n
        tbl = pa.table({
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), type=pa.float32()), dim
            ).cast(pa.list_(pa.float32())),
        })
        if writer is None:
            writer = pq.ParquetWriter(path, tbl.schema)
        writer.write_table(tbl)
    if writer:
        writer.close()
    return vid


def brute_topk_numpy(path: str, qids: np.ndarray, k: int):
    """Exact cosine top-k (excluding self) for each query id, driver-side
    numpy — the ground truth the Spark probes are scored against."""
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    V = t.column("embedding").combine_chunks().flatten().to_numpy().reshape(
        t.num_rows, -1
    )
    ids = t.column("vec_id").to_numpy()
    norms = np.linalg.norm(V, axis=1)
    order = np.argsort(ids)
    pos_of = {int(i): int(p) for p, i in enumerate(ids)}
    truth = {}
    Q = V[[pos_of[int(q)] for q in qids]]
    Qn = norms[[pos_of[int(q)] for q in qids]]
    sims = (Q @ V.T) / (Qn[:, None] * norms[None, :])
    for row, q in enumerate(qids):
        s = sims[row].copy()
        s[pos_of[int(q)]] = -np.inf  # exclude self
        top = np.argpartition(-s, k)[:k]
        top = top[np.argsort(-s[top], kind="stable")]
        truth[int(q)] = set(int(ids[i]) for i in top)
    del order
    return truth


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--centers", type=int, default=10000)
    ap.add_argument("--per-center", type=int, default=100)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--centroids", type=int, default=256)
    ap.add_argument("--nprobe", type=int, default=8)
    args = ap.parse_args()

    n_total = args.centers * args.per_center
    corpus = f"/tmp/ocr_ann_scale_{args.centers}_{args.per_center}_{args.dim}"
    path = f"{corpus}/embeddings.parquet"
    if not os.path.exists(path):
        os.makedirs(corpus, exist_ok=True)
        t0 = time.perf_counter()
        n = gen_corpus(path, args.centers, args.per_center, args.dim)
        print(f"generated {n} vectors in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    from pyspark.sql import functions as F

    from ocr_tool_spark.dataprep import similarity
    from ocr_tool_spark.session import build_session

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{max(8, args.cores)}g")
    spark = build_session(app_name="ann-scale", cores=args.cores,
                          extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(path)

    # queries: one member of every (n_centers/n_queries)-th cluster
    stride = max(1, n_total // args.queries)
    qids = np.arange(0, n_total, stride, dtype=np.int64)[: args.queries]

    t0 = time.perf_counter()
    truth = brute_topk_numpy(path, qids, args.k)
    brute_sec = time.perf_counter() - t0

    index_path = f"{corpus}/ivf_{args.centroids}"
    t0 = time.perf_counter()
    assigned, centroids = similarity.ivf_build(
        e, index_path, n_centroids=args.centroids
    )
    build_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    assigned, centroids = similarity.ivf_build(
        e, index_path, n_centroids=args.centroids
    )
    rebuild_sec = time.perf_counter() - t0  # must be a pure params read

    q = e.filter(F.col("vec_id").isin([int(x) for x in qids]))
    t0 = time.perf_counter()
    got = similarity.ivf_search(
        assigned, centroids, q, k=args.k, nprobe=args.nprobe
    ).collect()
    probe_sec = time.perf_counter() - t0
    by_q: dict[int, set[int]] = {}
    for r in got:
        by_q.setdefault(int(r.qid), set()).add(int(r.vec_id))
    ivf_recall = float(np.mean([
        len(by_q.get(int(qq), set()) & truth[int(qq)]) / args.k for qq in qids
    ]))

    # SRP-LSH single-probe path on a sample of queries (lsh_topk is a
    # one-query API; amortize over 10)
    lsh_hits, lsh_n = 0, 0
    t0 = time.perf_counter()
    for qq in qids[:10]:
        rows = similarity.lsh_topk(
            e, int(qq), k=args.k, dim=args.dim, n_bits=8, n_tables=6
        ).collect()
        lsh_hits += len({int(r.vec_id) for r in rows} & truth[int(qq)])
        lsh_n += args.k
    lsh_sec = time.perf_counter() - t0

    print(json.dumps({
        "metric": "ANN at scale: IVF build-once/probe-many + SRP-LSH vs exact brute force",
        "vectors": int(n_total), "dim": args.dim, "cores": args.cores,
        "k": args.k, "n_queries": int(len(qids)),
        "ivf": {
            "n_centroids": args.centroids, "nprobe": args.nprobe,
            "build_sec": round(build_sec, 2),
            "rebuild_noop_sec": round(rebuild_sec, 2),
            "batched_probe_sec": round(probe_sec, 2),
            "probes_per_sec": round(len(qids) / probe_sec, 1),
            "recall_at_k": round(ivf_recall, 4),
            "scan_fraction": round(args.nprobe / args.centroids, 4),
        },
        "lsh": {
            "n_bits": 8, "n_tables": 6, "queries": 10,
            "sec": round(lsh_sec, 2),
            "recall_at_k": round(lsh_hits / lsh_n, 4),
        },
        "brute_numpy_sec": round(brute_sec, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
