#!/usr/bin/env python
"""Measured evidence for the binary-quantization family (ops 108-109;
SCALE.md): recall and wall-clock for Hamming top-k (+rerank) vs the
exact scan on CLUSTERED synthetic embeddings (the regime 1-bit codes
are built for — the t2 table is structureless, the worst case, and its
floor is recorded in test_sq.py/SURVEY), plus the multi-index search's
candidate-pair bound vs all-pairs.

Run: python tools/bq_sweep.py [--quick]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.similarity import knn_bruteforce
from dwca_parquet_spark.operators.sq import (
    bq_fit,
    bq_hamming_neighbors_mih,
    bq_hamming_topk,
)
from dwca_parquet_spark.session import get_spark
from r5_ops_sweep import make_blobs

K = 10
N_QUERIES = 30


def recall_vs_exact(spark, emb, tag: str, **kw) -> None:
    t0 = time.time()
    exact = {
        (r["query_id"], r["cand_id"])
        for r in knn_bruteforce(
            emb, "vec_id", "embedding", N_QUERIES, K
        ).collect()
    }
    t_exact = time.time() - t0
    t0 = time.time()
    got = {
        (r["query_id"], r["cand_id"])
        for r in bq_hamming_topk(
            emb, "vec_id", "embedding", N_QUERIES, K, **kw
        ).collect()
    }
    t_bq = time.time() - t0
    rec = len(got & exact) / len(exact)
    print(
        f"bq_hamming_topk {tag}: recall@{K} {rec:.3f}, "
        f"{t_bq:.1f} s vs exact scan {t_exact:.1f} s"
    )


def main() -> None:
    quick = "--quick" in sys.argv
    spark = get_spark("bq-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    n = 20_000 if quick else 100_000
    emb = make_blobs(spark, n).persist()
    emb.count()
    model = bq_fit(emb, "embedding", 64)
    recall_vs_exact(spark, emb, f"n={n} plain", model=model)
    recall_vs_exact(
        spark, emb, f"n={n} rerank=100", model=model, rerank=100
    )

    radius = 7
    t0 = time.time()
    pairs = bq_hamming_neighbors_mih(
        emb, "vec_id", "embedding", radius, model=model
    )
    n_pairs = pairs.count()
    dt = time.time() - t0
    all_pairs = n * (n - 1) // 2
    # candidate bound: re-run the candidate stage only (pre-verify)
    print(
        f"bq_mih n={n} radius={radius}: {n_pairs} pairs in {dt:.1f} s "
        f"(all-pairs would be {all_pairs:,})"
    )


if __name__ == "__main__":
    main()
