"""Structured Streaming lift of operators/events.py.

The reference has no data-streaming semantics (its RQ/Redis queue is job
orchestration — ``/root/reference/src/dwca_parquet/dependencies.py:33-34``),
so these are the engine's own upgrade path (SURVEY §7.6): the SAME
transformations as the batch operators, run under ``readStream`` with
watermarked event time, so a pipeline can switch batch↔streaming without
rewriting logic.

- ``stream_tumbling_agg``: F.window + watermark → append-mode windowed
  counts/sums; late rows beyond the watermark drop deterministically.
- ``stream_sessionize``: session windows via the built-in
  ``F.session_window`` (gap-based, watermark-closed) — the streaming
  equivalent of the batch lag+cumsum formulation.
- ``stream_attribution_join``: watermarked stream-stream inner join with a
  two-sided time bound (state evictable on both sides).

Tests drive both with a file source feeding the events fixture and a
memory sink (tests/test_streaming.py); production swaps source/sink strings
(kafka, delta, …) — the transformation body is identical.

Scale: state lives in the state store keyed by (window, key) /
(user, session); watermarks bound state size. Shuffle partitioning follows
``spark.sql.shuffle.partitions`` exactly as in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.events import ts_micros
from dwca_parquet_spark.operators.relational import dec_sum


def with_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize the event-time column to a proper TIMESTAMP ('event_time'),
    whatever the storage representation (ns-longs included)."""
    return df.withColumn("event_time", F.timestamp_micros(ts_micros(df, ts_col)))


def stream_tumbling_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation (same shape as the batch
    ``tumbling_agg``; append output mode emits a window once the watermark
    passes its end)."""
    src = with_event_time(stream, ts_col).withWatermark("event_time", watermark)
    return (
        src.groupBy(F.window("event_time", duration).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum(value_col).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            key_col,
            "n_events",
            "total_value",
        )
    )


def stream_sliding_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding (hopping) windows — same shape as the batch
    ``sliding_agg``: F.window with a slide emits one row per (event,
    window) pair before aggregation, so state and shuffle grow only by the
    overlap factor duration/slide; windows finalize as the watermark
    passes their end."""
    src = with_event_time(stream, ts_col).withWatermark("event_time", watermark)
    return (
        src.groupBy(
            F.window("event_time", duration, slide).alias("w"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum(value_col).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            key_col,
            "n_events",
            "total_value",
        )
    )


def stream_sessionize(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows on a stream (built-in session_window state
    operator; sessions close when the watermark passes last_event + gap)."""
    src = with_event_time(stream, ts_col).withWatermark("event_time", watermark)
    return (
        src.groupBy(
            F.session_window("event_time", f"{gap_minutes} minutes").alias("sw"),
            F.col(user_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.unix_micros(F.col("sw.start")).alias("start_us"),
            F.unix_micros(F.col("sw.end")).alias("end_us"),
            "n_events",
        )
    )


def stream_attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    ts_col: str = "ts",
    tolerance: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: every (click, purchase) pair of
    the same user where the purchase lands within ``tolerance`` after the
    click — the attribution primitive.

    Both sides carry watermarks and the join condition bounds the time
    range in BOTH directions, which is what lets Structured Streaming
    evict state: a buffered click can be dropped once the watermark passes
    ``click_time + tolerance``, a purchase once matched candidates are
    final. State is O(events inside the watermark horizon), keyed by
    user — the same shuffle key as the batch equi-join. Append output mode;
    the identical expression on batch DataFrames gives the batch parity
    result (tests/test_streaming.py).
    """
    c = (
        with_event_time(clicks, ts_col)
        .withWatermark("event_time", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("event_time").alias("click_time"),
        )
    )
    p = (
        with_event_time(purchases, ts_col)
        .withWatermark("event_time", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("event_time").alias("purchase_time"),
            F.col("value").alias("purchase_value"),
        )
    )
    return (
        c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("click_time") <= F.col("purchase_time"))
            & (
                F.col("purchase_time")
                <= F.col("click_time") + F.expr(f"INTERVAL {tolerance}")
            ),
        )
        .select(
            F.col("c_user").alias("user_id"),
            "click_id",
            "purchase_id",
            F.date_format("click_time", "yyyy-MM-dd HH:mm:ss").alias("click_at"),
            F.date_format("purchase_time", "yyyy-MM-dd HH:mm:ss").alias(
                "purchase_at"
            ),
            "purchase_value",
        )
    )
