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
