#!/usr/bin/env python
"""Find the honest bench volume for the r8_group_hh row (VERDICT r9 ask
#2): at sf0.1 the identical tokenize+hash scan alone (0.54 s) exceeds 2x
the whole DuckDB oracle, so the ratio measures the fixture, not the
operator. This sweep replicates the sf0.1 documents table R-fold on BOTH
engines (explode(sequence(1,R)) / CROSS JOIN generate_series) and times
Spark heavy_hitters_by_group vs the exact-counts DuckDB oracle, to pick
the R where scan cost < oracle time and record the ratio at that point.

Usage: python tools/group_hh_bench_scale.py [R ...]   (default 1 4 8 16)
"""
from __future__ import annotations

import statistics
import sys
import time

import duckdb
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from dwca_parquet_spark.operators.sketch import heavy_hitters_by_group
from dwca_parquet_spark.operators.text import tokens
from dwca_parquet_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
RUNS = 3


def spark_side(spark, r: int):
    d = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("source").isNotNull())
        .select(
            "source",
            F.explode(F.sequence(F.lit(1), F.lit(r))).alias("_rep"),
            F.explode(tokens(F.col("text"))).alias("token"),
        )
        .select("source", "token")
    )
    return heavy_hitters_by_group(d, "source", "token", 32)


ORACLE = """
WITH c AS (SELECT source AS grp,
                  unnest(string_split_regex(trim(
                    regexp_replace(regexp_replace(lower(text),
                      '[^\\x20-\\x7e]', '', 'g'),
                      '\\s+', ' ', 'g')), ' ')) AS item
           FROM documents CROSS JOIN generate_series(1, {r})
           WHERE source IS NOT NULL AND text IS NOT NULL),
     g AS (SELECT grp, item, count(*) AS cnt FROM c
           WHERE item != '' GROUP BY 1, 2),
     t AS (SELECT grp, sum(cnt) AS n FROM g GROUP BY grp)
SELECT g.grp, g.item, g.cnt FROM g JOIN t USING (grp)
WHERE g.cnt > t.n / 33.0
"""


def materialize(df):
    return df.agg(
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns]))
    ).collect()[0][0]


def main() -> None:
    rs = [int(a) for a in sys.argv[1:]] or [1, 4, 8, 16]
    spark = get_spark()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    for r in rs:
        st = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            materialize(spark_side(spark, r))
            st.append(time.perf_counter() - t0)
        ot = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(ORACLE.format(r=r)).fetchall()
            ot.append(time.perf_counter() - t0)
        s, o = statistics.median(st), statistics.median(ot)
        # the scan-only floor at this R: tokenize+hash+count, no HH
        ft = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            d = (
                spark.read.parquet(f"{SF_DIR}/documents.parquet")
                .filter(F.col("source").isNotNull())
                .select(
                    "source",
                    F.explode(F.sequence(F.lit(1), F.lit(r))).alias("_rep"),
                    F.explode(tokens(F.col("text"))).alias("token"),
                )
                .select(
                    F.xxhash64("source").alias("g"),
                    F.xxhash64("token").alias("i"),
                )
            )
            d.agg(F.bit_xor(F.col("g").bitwiseXOR(F.col("i")))).collect()
            ft.append(time.perf_counter() - t0)
        f = statistics.median(ft)
        print(
            f"R={r:3d}  spark={s:7.2f}s  oracle={o:7.2f}s  "
            f"ratio={s / o:5.2f}x  scan_floor={f:6.2f}s  "
            f"floor_vs_oracle={f / o:4.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
