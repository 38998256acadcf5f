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


# ---------------------------------------------------------------------------
# Declarative data-quality expectations (the gate profiling feeds)
# ---------------------------------------------------------------------------
# An ingestion round ends with assertions, not vibes: null bounds, value
# ranges, uniqueness, referential containment. Expectations are DATA
# (rule rows in, violation rows out) so the gate composes with the rest
# of the engine — a violations table joins, persists, and alerts like any
# other table, and an empty violations table IS the green light.
#
# Rule kinds (column-level unless noted):
#   not_null            — null count must be 0
#   unique              — no value occurs twice (nulls ignored)
#   min / max           — numeric bound (inclusive), args: value
#   in_set              — args: allowed values (list)
#   matches             — args: regex the (string) column must fully match
#   row_count_min       — table-level, args: value
#
# Shape: ONE aggregate pass computes every rule's violation count
# (conditional sums — map-side combinable; `unique` adds one distinct
# aggregate). Output: (rule_idx, kind, column, violations, passed).


def check_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate rule dicts ({kind, column?, value?, values?, pattern?})
    against ``df`` in one aggregate job; returns one row per rule."""
    aggs: list[Column] = []
    metas = []
    for i, r in enumerate(rules):
        kind = r["kind"]
        col = r.get("column")
        c = F.col(col) if col else None
        if kind == "not_null":
            v = F.sum(F.when(c.isNull(), 1).otherwise(0))
        elif kind == "unique":
            v = F.count(c) - F.countDistinct(c)
        elif kind == "min":
            v = F.sum(F.when(c < F.lit(r["value"]), 1).otherwise(0))
        elif kind == "max":
            v = F.sum(F.when(c > F.lit(r["value"]), 1).otherwise(0))
        elif kind == "in_set":
            allowed = F.array(*[F.lit(x) for x in r["values"]])
            v = F.sum(
                F.when(
                    c.isNotNull() & ~F.array_contains(allowed, c), 1
                ).otherwise(0)
            )
        elif kind == "matches":
            v = F.sum(
                F.when(
                    c.isNotNull() & ~c.rlike("^(?:" + r["pattern"] + ")$"),
                    1,
                ).otherwise(0)
            )
        elif kind == "row_count_min":
            v = F.when(
                F.count(F.lit(1)) < F.lit(r["value"]),
                F.lit(r["value"]) - F.count(F.lit(1)),
            ).otherwise(0)
        else:
            raise ValueError(f"unknown expectation kind: {kind}")
        aggs.append(F.coalesce(v, F.lit(0)).cast("long").alias(f"_v{i}"))
        metas.append((i, kind, col or ""))
    one = df.agg(*aggs)
    stack = ", ".join(
        f"{i}, '{kind}', '{col}', _v{i}" for i, kind, col in metas
    )
    return one.select(
        F.expr(
            f"stack({len(metas)}, {stack}) "
            "AS (rule_idx, kind, column, violations)"
        )
    ).withColumn("passed", F.col("violations") == 0)


def sql_check_expectations(source: str, rules: list[dict]) -> str:
    """DuckDB oracle: same rules, same one-pass conditional aggregation."""
    selects = []
    for i, r in enumerate(rules):
        kind, col = r["kind"], r.get("column", "")
        if kind == "not_null":
            v = f"sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)"
        elif kind == "unique":
            v = f"count({col}) - count(DISTINCT {col})"
        elif kind == "min":
            v = f"sum(CASE WHEN {col} < {r['value']} THEN 1 ELSE 0 END)"
        elif kind == "max":
            v = f"sum(CASE WHEN {col} > {r['value']} THEN 1 ELSE 0 END)"
        elif kind == "in_set":
            vals = ", ".join(
                "'" + str(x).replace("'", "''") + "'" for x in r["values"]
            )
            v = (
                f"sum(CASE WHEN {col} IS NOT NULL AND {col} NOT IN ({vals}) "
                "THEN 1 ELSE 0 END)"
            )
        elif kind == "matches":
            pat = r["pattern"].replace("'", "''")
            v = (
                f"sum(CASE WHEN {col} IS NOT NULL AND NOT "
                f"regexp_full_match({col}, '{pat}') THEN 1 ELSE 0 END)"
            )
        elif kind == "row_count_min":
            v = (
                f"CASE WHEN count(*) < {r['value']} "
                f"THEN {r['value']} - count(*) ELSE 0 END"
            )
        else:
            raise ValueError(f"unknown expectation kind: {kind}")
        selects.append(
            f"SELECT {i} AS rule_idx, '{kind}' AS kind, '{col}' AS \"column\", "
            f"CAST(coalesce({v}, 0) AS BIGINT) AS violations, "
            f"coalesce({v}, 0) = 0 AS passed FROM {source}"
        )
    return " UNION ALL ".join(selects)
