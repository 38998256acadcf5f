#!/usr/bin/env python
"""Measured evidence for op 165 (interval_agg) vs interval_join+groupBy
(SCALE.md round 12).

Claim: when the caller needs per-interval aggregates, the banded
decomposition (full buckets from one per-bucket partial pass + two edge
buckets of raw points) does O(|points| + |intervals|·span/w + edge
pairs) work, while join+groupBy materializes the full pair stream —
O(pairs) — only to collapse it. The gap scales with pair multiplicity,
so the sweep grows BOTH sides and reports the pair count next to the
wall-clocks, plus an output-equality check between the two plans.

Fixture: points uniform over [0, R); intervals of fixed span S at
hashed offsets (pair count ≈ |points|·|intervals|·S/R) — R sets the
PAIR MULTIPLICITY (pairs per interval), the axis that decides the
winner. At low multiplicity (~30/interval) the pair stream is cheap
and join+groupBy is competitive or better (measured honestly below);
interval_agg's O(points + edges) advantage appears and grows in the
dense regime (hundreds of pairs per interval — q59's shape at 600, and
exactly where 100 TB pair streams explode). Width w = S/16 for
interval_agg (edges ≈ 2/16 of each interval's mass); the join uses
w = S/2 (its best shape: minimal interval blow-up). Each case times a
SECOND run (first run warms codegen + page cache — the sweep measures
the plans, not JVM warm-up).

Run: python tools/interval_agg_sweep.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dwca_parquet_spark.cache import release_caches
from dwca_parquet_spark.operators.relational import interval_agg, interval_join
from dwca_parquet_spark.session import get_spark

SPAN = 2_000
CASES = [
    # (n_points, n_intervals, value range R)  → pairs/interval ≈ n_pts·S/R
    (150_000, 20_000, 10_000_000),    # sparse: ~30 pairs/interval
    (150_000, 20_000, 500_000),       # q59 regime: ~600 pairs/interval
    (1_500_000, 200_000, 5_000_000),  # dense at 10×: ~600/interval, 120M pairs
]


def main() -> int:
    from bench import canary_sec

    pre = canary_sec()
    spark = get_spark("interval-agg-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n_pts, n_ivs, R in CASES:
        pts = spark.range(n_pts).select(
            (F.abs(F.xxhash64("id", F.lit(1))) % R).alias("p"),
            (F.col("id") % 1000).alias("val"),
        )
        ivs = spark.range(n_ivs).select(
            F.col("id").alias("iid"),
            (F.abs(F.xxhash64("id", F.lit(2))) % (R - SPAN)).alias("lo"),
        ).withColumn("hi", F.col("lo") + SPAN)

        agg_df = interval_agg(
            pts, ivs, "p", "lo", "hi", "iid", SPAN // 16,
            sum_cols={"sv": "val"},
        )
        for attempt in range(2):  # 2nd run is the record (warm)
            t0 = time.perf_counter()
            a_n, a_c, a_s = agg_df.agg(
                F.count(F.lit(1)), F.sum("n_points"), F.sum("sv")
            ).first()
            t_agg = time.perf_counter() - t0
            release_caches()
            spark.catalog.clearCache()

        join_df = (
            interval_join(pts, ivs, "p", "lo", "hi", SPAN // 2)
            .groupBy("iid")
            .agg(F.count(F.lit(1)).alias("n_points"), F.sum("val").alias("sv"))
        )
        for attempt in range(2):
            t0 = time.perf_counter()
            j_n, j_c, j_s = join_df.agg(
                F.count(F.lit(1)), F.sum("n_points"), F.sum("sv")
            ).first()
            t_join = time.perf_counter() - t0
            release_caches()
            spark.catalog.clearCache()

        match = (a_n, a_c, a_s) == (j_n, j_c, j_s)
        rows.append((n_pts, n_ivs, int(a_c or 0), t_agg, t_join, match))
        print(
            f"points={n_pts:>9,} intervals={n_ivs:>7,} pairs={int(a_c or 0):>12,} "
            f"interval_agg={t_agg:6.1f}s join+groupBy={t_join:6.1f}s "
            f"speedup={t_join / t_agg:4.1f}x match={match}",
            flush=True,
        )
    post = canary_sec()
    print(f"canary pre {pre} post {post}")
    spark.stop()
    return 0 if all(r[5] for r in rows) else 1


if __name__ == "__main__":
    sys.exit(main())
