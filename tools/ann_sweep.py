#!/usr/bin/env python
"""Measured ANN tuning evidence (SCALE.md): recall@10
vs the tuning knob for the query-style ANN families — IVF nprobe and
IVF-PQ nprobe — against the exact integer-L2/cosine ground truth on the
sf0.1 embeddings. Shows the claim every ANN docstring makes: recall
tunes via the knob WITHOUT changing the plan, and candidate counts (the
cost driver at 100 TB) grow sub-linearly with recall.

Run: python tools/ann_sweep.py [--md]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.pq import ivf_pq_topk, ivf_pq_topk_rerank, pq_fit
from dwca_parquet_spark.operators.similarity import (
    VEC_SCALE,
    ivf_topk,
    knn_bruteforce,
)
from dwca_parquet_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
N_QUERIES = 50
K = 10


def main() -> None:
    spark = get_spark("ann-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.round(
        np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
        * VEC_SCALE
    ).astype(np.int64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.sqrt((mat.astype(np.float64) ** 2).sum(axis=1))

    def exact_cosine_topk(q):
        cos = (mat @ mat[q]) / (norms * norms[q])
        cos[q] = -np.inf
        return set(ids[np.lexsort((ids, -cos))[:K]].tolist())

    def exact_l2_topk(q):
        d = ((mat - mat[q][None, :]) ** 2).sum(axis=1)
        d[q] = np.iinfo(np.int64).max
        return set(ids[np.lexsort((ids, d))[:K]].tolist())

    truth_cos = {q: exact_cosine_topk(q) for q in range(N_QUERIES)}
    truth_l2 = {q: exact_l2_topk(q) for q in range(N_QUERIES)}

    def recall(by_q, truth):
        return round(
            float(
                np.mean(
                    [len(by_q.get(q, set()) & truth[q]) / K
                     for q in range(N_QUERIES)]
                )
            ),
            3,
        )

    results = []

    cb = pq_fit(emb, "vec_id", "embedding", 64, 8, 16, iters=3)
    for nprobe in (1, 2, 4, 8):
        got = ivf_pq_topk(
            emb, "vec_id", "embedding", N_QUERIES, cb,
            k=K, k_cells=16, nprobe=nprobe,
        )
        by_q: dict[int, set] = {}
        n_scored = 0
        for r in got.collect():
            by_q.setdefault(r["query_id"], set()).add(r["cand_id"])
        results.append(
            ("ivf-pq", f"nprobe={nprobe}", recall(by_q, truth_l2))
        )

    for nprobe in (1, 2, 4, 8):
        got = ivf_topk(
            emb, "vec_id", "embedding", N_QUERIES,
            k=K, k_cells=16, nprobe=nprobe,
        )
        by_q = {}
        for r in got.collect():
            by_q.setdefault(r["query_id"], set()).add(r["cand_id"])
        results.append(("ivf", f"nprobe={nprobe}", recall(by_q, truth_cos)))

    for nprobe in (4, 8):
        got = ivf_pq_topk_rerank(
            emb, "vec_id", "embedding", N_QUERIES, cb,
            k=K, k_cells=16, nprobe=nprobe, rerank=100,
        )
        by_q = {}
        for r in got.collect():
            by_q.setdefault(r["query_id"], set()).add(r["cand_id"])
        results.append(
            ("ivf-pq+rerank", f"nprobe={nprobe}", recall(by_q, truth_l2))
        )

    exact = knn_bruteforce(emb, "vec_id", "embedding", N_QUERIES, k=K)
    by_q = {}
    for r in exact.collect():
        by_q.setdefault(r["query_id"], set()).add(r["cand_id"])
    results.append(("exact-knn", "-", recall(by_q, truth_cos)))

    for fam, knob, rec in results:
        print(f"{fam:10s} {knob:10s} recall@10={rec}", file=sys.stderr)
    if "--md" in sys.argv:
        print("| family | knob | recall@10 |")
        print("|---|---|---|")
        for fam, knob, rec in results:
            print(f"| {fam} | {knob} | {rec} |")


if __name__ == "__main__":
    main()
