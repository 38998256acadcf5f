"""Table profiling (SURVEY §2 round-4 extension): per-column null /
distinct / min-max statistics in ONE pass over the data.

Every ingestion round at 100 TB starts with "what actually landed": null
fractions, cardinalities, value ranges — the inputs to partition-layout
choices (distinct counts size bucket/partition counts), join-strategy
choices (broadcastability), and data-quality gates. The reference has no
profiling surface (its only query is templates/query.sql:1-5); DuckDB
exposes the same need as SUMMARIZE.

Shape: one aggregate over the table computing 4 statistics per column,
then an unpivot (stack) of the single result row into long format — one
job, one pass, one row shuffled. Two modes:

- ``approx=True`` (the 100 TB default): approx_count_distinct (HLL) —
  all statistics are plain aggregates, ONE scan with map-side partials,
  no expand.
- ``approx=False`` (the oracle-exact mode): count(DISTINCT col) per
  column — Spark plans multi-distinct via Expand (one duplicated stream
  per distinct column), so cost grows with column count; use on samples
  or when exactness matters.

min/max surface as strings (cast) so one long-format schema covers every
column type; the differential test compares on types whose string form is
engine-portable (ints, strings, dates, decimals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


PROFILE_SCHEMA = (
    "column string, n_rows long, n_nulls long, n_distinct long, "
    "min_value string, max_value string"
)


def profile_table(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Long-format profile: one row per column —
    (column, n_rows, n_nulls, n_distinct, min_value, max_value)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(F.count(col).alias(f"_nn{i}"))
        if approx:
            aggs.append(F.approx_count_distinct(col).alias(f"_nd{i}"))
        else:
            aggs.append(F.countDistinct(col).alias(f"_nd{i}"))
        aggs.append(F.min(col).cast("string").alias(f"_mn{i}"))
        aggs.append(F.max(col).cast("string").alias(f"_mx{i}"))
    one = df.agg(*aggs)
    stack_args = []
    for i, c in enumerate(cols):
        stack_args.append(f"'{c}', _nn{i}, _nd{i}, _mn{i}, _mx{i}")
    return one.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) "
            "AS (column, _nonnull, n_distinct, min_value, max_value)"
        ),
        F.col("_n_rows").alias("n_rows"),
    ).select(
        "column",
        "n_rows",
        (F.col("n_rows") - F.col("_nonnull")).alias("n_nulls"),
        "n_distinct",
        "min_value",
        "max_value",
    )


def sql_profile_table(source: str, columns: list[str]) -> str:
    """DuckDB oracle for the exact mode (same statistics, same long form)."""
    parts = []
    for c in columns:
        parts.append(
            f"SELECT '{c}' AS \"column\", CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count(*) - count({c}) AS BIGINT) AS n_nulls, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"CAST(min({c}) AS VARCHAR) AS min_value, "
            f"CAST(max({c}) AS VARCHAR) AS max_value FROM {source}"
        )
    return " UNION ALL ".join(parts)
