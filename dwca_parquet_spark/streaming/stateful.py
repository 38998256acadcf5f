"""Custom stateful streaming operators (applyInPandasWithState) + streaming
dedup.

Two upgrade paths the batch engine's users need when moving to streams:

- ``stream_dedup_exact``: exact dedup on a content fingerprint across
  micro-batches. Uses the built-in ``dropDuplicatesWithinWatermark`` —
  state is bounded by the watermark, which is the only sane contract for an
  unbounded stream (a global forever-dedup grows state without bound; at
  100 TB/day the watermark IS the retention policy). Built-in operator ⇒
  state store, checkpointing, and RocksDB spilling all come for free.

- ``stream_user_stats``: the canonical custom stateful operator shape —
  ``applyInPandasWithState`` keeping (count, total) per key with a
  processing-time timeout. Use this template when the built-ins
  (window/session_window/dropDuplicates*) genuinely can't express the
  semantics; the state value is a small fixed-width tuple, never a buffer
  of raw events, so state size is O(keys), not O(events).

The batch operators these lift are operators/dedup.py (text_key) and the
events aggregations; transformation bodies are shared where Spark allows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from dwca_parquet_spark.functions import hashing as H
from dwca_parquet_spark.streaming.events import with_event_time


def stream_dedup_exact(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """First-seen rows per normalized-text fingerprint within the watermark.

    Same key derivation as the batch ``dedup_exact`` (normalize → poly
    hash), then ``dropDuplicatesWithinWatermark`` on the hash: a duplicate
    arriving within the watermark of the first occurrence is dropped;
    state for a fingerprint is evicted once the watermark passes it.
    """
    keyed = with_event_time(stream, ts_col).withColumn(
        "text_hash",
        H.poly_hash(H.normalize_text(F.col(text_col))),
    )
    return keyed.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["text_hash"]
    ).select(id_col, "text_hash", "event_time")


def stream_dedup_canonical_url(
    stream: DataFrame,
    url_col: str,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """First-seen crawl record per CANONICAL URL within the watermark —
    the streaming face of the crawl-dedup key (operators/text.py
    canonical_url is a pure column expression, so it composes with
    Structured Streaming unchanged; that is the point of expression-level
    operators). State is one entry per distinct canonical URL inside the
    watermark, evicted as it passes — the recrawl-suppression contract a
    continuous crawler needs."""
    from dwca_parquet_spark.operators.text import canonical_url

    keyed = with_event_time(stream, ts_col).withColumn(
        "canonical_url", canonical_url(F.col(url_col))
    )
    return (
        keyed.withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["canonical_url"])
        .select(url_col, "canonical_url", "event_time")
    )


USER_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value_micros", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total_micros", LongType()),
    ]
)


def _user_stats_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running (count, integer-micros total) per user, emitted every batch.

    Value accumulates as integer micro-units so the running total is exact
    and order-independent (same protocol as the batch dec_sum oracle)."""
    n, total = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # round-half-up at the 6th decimal, matching operators.relational
        total += int(
            (pdf["value"].astype("float64") * 1_000_000).round().astype("int64").sum()
        )
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value_micros": [total],
        }
    )


def stream_user_stats(
    stream: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user running event count + exact value total (update mode).

    The applyInPandasWithState template: group by key, fold each incoming
    Arrow batch into a fixed-width state tuple, emit the updated aggregate.
    NoTimeout here because the fixture is bounded; production sets a
    timeout and drops idle keys to bound state.
    """
    src = stream.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(value_col).cast("double").alias("value"),
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _user_stats_fn,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
