#!/usr/bin/env python
"""AUC at 20M rows of continuous scores (op 124) — the bucketed
two-level rank plan under genuine distinct-score volume, value-checked
bit-for-bit against the DuckDB twin at the same scale. Records the
round-8 SCALE.md row; exits non-zero on any mismatch."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dwca_parquet_spark.operators.evaluation import (  # noqa: E402
    auc_roc,
    sql_auc_roc,
)
from dwca_parquet_spark.session import get_spark  # noqa: E402

N = 20_000_000
PATH = "/tmp/auc_scale_20m"


def main() -> int:
    spark = get_spark("auc-scale")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(N).select(
        (F.xxhash64("id") % 2 == 0).alias("label"),
        (
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10**9)) / 1e9
            + F.when(F.xxhash64("id") % 2 == 0, 0.08).otherwise(0.0)
        ).alias("score"),
    )
    df.write.mode("overwrite").parquet(PATH)
    pq = spark.read.parquet(PATH)
    t0 = time.perf_counter()
    row = auc_roc(pq, "label", "score").collect()[0]
    ts = time.perf_counter() - t0
    print(f"spark  auc={row['auc']:.6f} P={row['n_pos']} N={row['n_neg']} "
          f"{ts:.2f}s")
    con = duckdb.connect()
    t0 = time.perf_counter()
    want = con.execute(
        sql_auc_roc(f"read_parquet('{PATH}/*.parquet')", "label", "score")
    ).fetchone()
    td = time.perf_counter() - t0
    print(f"duckdb auc={want[0]:.6f} P={want[1]} N={want[2]} {td:.2f}s")
    assert (row["auc"], row["n_pos"], row["n_neg"]) == tuple(want)
    print(f"bit-identical at {N:,} rows; spark/duck {ts / td:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
