#!/usr/bin/env python
"""Indexed-BM25 probe flatness vs corpus size (op 127).

The claim under test: a probe against the materialized inverted index
touches only the queried terms' postings, so probe wall-clock is ~flat
in corpus size, while op 123's direct BM25 (two corpus scans) grows
linearly — the build being the explicit one-time cost that repeated
probes amortize. The corpus is the sf0.1 documents table replicated
with distinct ids and a per-replica suffix (so postings/df stats grow
genuinely). Results recorded in SCALE.md (round 8).

Usage: python tools/invindex_sweep.py [mult ...]   (default: 1 16 64)
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dwca_parquet_spark.cache import release_caches  # noqa: E402
from dwca_parquet_spark.operators.invindex import (  # noqa: E402
    bm25_index_build,
    bm25_topk_indexed,
)
from dwca_parquet_spark.operators.text import bm25_topk  # noqa: E402
from dwca_parquet_spark.session import get_spark  # noqa: E402

QUERY = "data quality"


def mat(df):
    df.agg(F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()


def main() -> int:
    mults = [int(a) for a in sys.argv[1:]] or [1, 16, 64]
    spark = get_spark("invindex-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(
        "/root/testdata/sf0.1/documents.parquet"
    ).select("doc_id", "text")
    for mult in mults:
        reps = spark.range(mult).select(F.col("id").alias("_m"))
        corpus = base.crossJoin(reps).select(
            (F.col("doc_id") + F.col("_m") * F.lit(1_000_000)).alias(
                "doc_id"
            ),
            F.when(F.col("_m") == 0, F.col("text"))
            .otherwise(
                F.concat(
                    F.col("text"), F.lit(" variant"),
                    F.col("_m").cast("string"),
                )
            )
            .alias("text"),
        )
        cpath, ipath = f"/tmp/invindex_c{mult}", f"/tmp/invindex_i{mult}"
        corpus.write.mode("overwrite").parquet(cpath)
        corpus = spark.read.parquet(cpath)
        n = corpus.count()
        t0 = time.perf_counter()
        bm25_index_build(corpus, "doc_id", "text", ipath)
        tb = time.perf_counter() - t0
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            mat(bm25_topk_indexed(spark, ipath, QUERY, 20))
            ts.append(time.perf_counter() - t0)
        ds = []
        for _ in range(3):
            t0 = time.perf_counter()
            mat(bm25_topk(corpus, "doc_id", "text", QUERY, 20))
            ds.append(time.perf_counter() - t0)
            release_caches()
            spark.catalog.clearCache()
        print(
            f"docs={n:>9,}  build={tb:7.2f}s  "
            f"indexed_probe={statistics.median(ts):5.2f}s  "
            f"direct_bm25={statistics.median(ds):6.2f}s"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
