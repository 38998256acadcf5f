"""Incremental aggregate maintenance — mergeable rollup state (SURVEY §2
round-4 extension).

The reporting layer over a 100 TB corpus (per-source token counts,
per-domain doc counts, per-day quality means) cannot re-aggregate the
corpus per batch. The standard answer is a stored STATE table of
mergeable partial aggregates, advanced per batch:

    state' = merge(state, partial(batch))

with merge defined per aggregate kind so that folding batches in any
grouping reproduces the from-scratch aggregate exactly (the same algebra
Spark itself uses for map-side partials, lifted to table level):
  count → sum;  sum → sum;  min → min;  max → max;
  mean  → (sum, count) carried, surfaced as sum/count at read time.

Sums of floating columns are carried as DECIMAL(38,s) with a caller-chosen
scale s (``value_scale``, default 2) — values are quantized to s decimal
places on entry, so the exactness guarantee is relative to the s-quantized
data; pick s to cover the column's precision. Decimal is an exact,
order-insensitive representation. A double-summed state would drift by
fold order (measured: the same lineitem sum differs in the 9th digit
between two groupings), which breaks the defining property of mergeable
state; decimal sums make every fold order bit-identical, and the mean
derives from the same decimal on every engine.

Pairs with operators/cdc.py (facts merge) the way partial aggregation
pairs with shuffle: CDC advances the FACTS, rollup advances the
SUMMARIES, neither rescans history. With state and batch partials
bucketed on the group key the merge is Exchange-free on the state side —
same lever as the CDC plan pin.

Shuffle shape per batch: ONE map-side-combinable groupBy over the batch
(batch-sized, bounded by |batch| keys), then a groupBy over
state ∪ partial — cardinality = |touched keys|, never corpus rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# aggregate kinds: name -> (partial builder, merge fn)
_MERGES = {
    "cnt": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def _state_cols(value_cols: list[str]) -> list[str]:
    out = ["cnt"]
    for v in value_cols:
        out += [f"sum_{v}", f"min_{v}", f"max_{v}"]
    return out


def rollup_partial(
    batch: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    value_scale: int = 2,
) -> DataFrame:
    """Per-key partial aggregate of one batch — the mergeable unit.

    ``value_scale`` is the decimal scale values are quantized to BEFORE
    summing (default 2 — currency-style): sum_v/mean_v are exact statistics
    of the values rounded to that many decimal places. For finer-grained
    columns (per-day quality scores in [0,1]) pass a larger scale, e.g.
    value_scale=9 — the precision budget decimal(18+s-2, s) keeps ~1e16
    of integer headroom at any scale."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("cnt")]
    s = value_scale
    for v in value_cols:
        aggs += [
            F.sum(F.col(v).cast(f"decimal({16 + s},{s})"))
            .cast(f"decimal(38,{s})")
            .alias(f"sum_{v}"),
            F.min(v).alias(f"min_{v}"),
            F.max(v).alias(f"max_{v}"),
        ]
    return batch.groupBy(*key_cols).agg(*aggs)


def rollup_merge(
    state: DataFrame,
    partial: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    value_scale: int = 2,
) -> DataFrame:
    """state ⊕ partial: exact, associative, commutative.

    Shape: a FULL OUTER equi-join on the keys + a combining projection —
    not union+groupBy. Union erases the children's output partitioning in
    Catalyst, so a union-based merge re-shuffles even co-bucketed inputs;
    the join form keeps both bucketed sides Exchange-free (plan-pinned in
    test_rollup.py). least/greatest skip nulls, and absent-side counts
    and sums coalesce to zero."""
    rename = {c: f"_p_{c}" for c in _state_cols(value_cols)}
    p = partial
    for old, new in rename.items():
        p = p.withColumnRenamed(old, new)
    joined = state.join(p, key_cols, "full_outer")
    cols: list[Column] = [F.col(k) for k in key_cols]
    cols.append(
        (F.coalesce(F.col("cnt"), F.lit(0)) + F.coalesce(F.col("_p_cnt"), F.lit(0)))
        .alias("cnt")
    )
    zero = F.lit(0).cast(f"decimal(38,{value_scale})")
    for v in value_cols:
        cols += [
            (
                F.coalesce(F.col(f"sum_{v}"), zero)
                + F.coalesce(F.col(f"_p_sum_{v}"), zero)
            )
            .cast(f"decimal(38,{value_scale})")
            .alias(f"sum_{v}"),
            F.least(F.col(f"min_{v}"), F.col(f"_p_min_{v}")).alias(f"min_{v}"),
            F.greatest(F.col(f"max_{v}"), F.col(f"_p_max_{v}")).alias(f"max_{v}"),
        ]
    return joined.select(*cols)


def rollup_read(
    state: DataFrame, value_cols: list[str], mean_decimals: int = 6
) -> DataFrame:
    """Surface derived statistics (means) from the carried partials."""
    out = state
    for v in value_cols:
        out = out.withColumn(
            f"mean_{v}",
            F.round(
                F.col(f"sum_{v}").cast("double") / F.col("cnt").cast("double"),
                mean_decimals,
            ),
        )
    return out


def sql_rollup_from_scratch(
    source: str,
    key_cols: list[str],
    value_cols: list[str],
    value_scale: int = 2,
) -> str:
    """DuckDB oracle: the from-scratch aggregate any merge sequence must
    equal (same column names as the state table + read-time means)."""
    keys = ", ".join(key_cols)
    s = value_scale
    parts = [f"CAST(count(*) AS BIGINT) AS cnt"]
    for v in value_cols:
        dsum = f"sum(CAST({v} AS DECIMAL({16 + s},{s})))"
        parts += [
            f"CAST({dsum} AS DECIMAL(38,{s})) AS sum_{v}",
            f"min({v}) AS min_{v}",
            f"max({v}) AS max_{v}",
            f"round(CAST({dsum} AS DOUBLE) / count(*), 6) AS mean_{v}",
        ]
    return f"SELECT {keys}, {', '.join(parts)} FROM {source} GROUP BY {keys}"


# ---------------------------------------------------------------------------
# Mergeable percentile state: fixed log2 histogram
# ---------------------------------------------------------------------------
# Exact percentiles are not mergeable (they need the sorted data); the
# mergeable form is a histogram with FIXED bucket boundaries — counts add,
# so shard/day/corpus folds are exact over the histogram itself, and any
# percentile reads off the cumulative counts with relative value error
# bounded by the bucket width. Log2 buckets (value ∈ [2^i, 2^{i+1}) →
# bucket i) give ≤ 2× relative error over the whole positive range with
# ~64 buckets — the latency/size/length-distribution workhorse. Integer
# bucket arithmetic (comparison chain, no log()) keeps it engine-portable
# like sketch.py's rho.


def log_hist_partial(
    df: DataFrame, value_col: str, max_bucket: int = 40
) -> DataFrame:
    """(bucket, cnt): bucket = floor(log2(v)) for v ≥ 1 (clamped into
    [0, max_bucket]; v < 1 → bucket 0 via the CASE floor; NULLs are
    EXCLUDED — they count in no bucket, matching the SQL oracle's WHERE
    clause, so merge/percentile denominators cover non-null values only).
    One combinable groupBy, ≤ max_bucket+1 rows."""
    v = F.col(value_col)
    bucket = F.lit(0)
    for i in range(1, max_bucket + 1):
        bucket = F.when(v >= F.lit(float(2**i)), F.lit(i)).otherwise(bucket)
    return (
        df.filter(v.isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def log_hist_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counts add — associative, shard-parallel (the CMS/HLL contract)."""
    return a.unionByName(b).groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def log_hist_percentile(hist: DataFrame, q: float) -> float:
    """Approximate q-quantile from the histogram (bounded collect): the
    geometric midpoint of the bucket holding the q·N-th value — relative
    error ≤ √2 of the true quantile by construction."""
    rows = sorted(
        (r["bucket"], r["cnt"]) for r in hist.collect()
    )
    total = sum(c for _, c in rows)
    target = q * total
    run = 0
    for bucket, c in rows:
        run += c
        if run >= target:
            return float(2**bucket) * (2**0.5)
    return float(2 ** rows[-1][0]) * (2**0.5) if rows else 0.0


def sql_log_hist(source: str, value_expr: str, max_bucket: int = 40) -> str:
    """DuckDB oracle for the identical histogram."""
    bucket = "0"
    for i in range(1, max_bucket + 1):
        bucket = f"CASE WHEN {value_expr} >= {float(2**i)} THEN {i} ELSE {bucket} END"
    return (
        f"SELECT {bucket} AS bucket, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM {source} WHERE {value_expr} IS NOT NULL GROUP BY 1"
    )
