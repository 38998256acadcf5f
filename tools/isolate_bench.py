"""Isolated-query timing with EXACTLY bench.py's methodology (same
session factory, same materialize(), same cache release between reps,
same median-of-RUNS) for a subset of headline queries and/or r5-tier
rows — the round-13 iteration probe, so before/after A/Bs don't pay a
full bench run per change. Canary readings are stamped pre/post per the
VERDICT r12 evidence contract (numbers from windows with canary > 0.6 s
don't count).

Usage: python tools/isolate_bench.py q30_minhash_lsh_pairs r8_group_hh
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_RUNS.
"""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from dwca_parquet_spark import queries as Q  # noqa: E402
from dwca_parquet_spark.cache import release_caches  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    pre = bench.canary_sec()
    spark = bench.get_spark("dwca-parquet-spark-isolate")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{bench.SF_DIR}/region.parquet").count()
    r5 = bench.r5_tier_specs()
    out = {}
    for name in names:
        if name in Q.QUERIES:
            fn = lambda s: Q.QUERIES[name](s, bench.SF_DIR)  # noqa: E731
        elif name in r5:
            fn = r5[name][0]
        else:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(name)
        times = []
        for _ in range(bench.RUNS):
            t0 = time.perf_counter()
            bench.materialize(fn(spark))
            times.append(time.perf_counter() - t0)
            release_caches()
            spark.catalog.clearCache()
        out[name] = [round(t, 4) for t in times]
        print(f"{name}: median {statistics.median(times):.4f}s  {out[name]}")
    post = bench.canary_sec()
    print(f"canary pre={pre} post={post}")


if __name__ == "__main__":
    main()
