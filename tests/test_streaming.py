"""Structured Streaming tests: file source feeding the events fixture →
memory sink; results must equal the batch operators' (streaming/batch
unification is the point of the lift)."""

from __future__ import annotations

import shutil

import pytest

from dwca_parquet_spark.operators.events import tumbling_agg
from dwca_parquet_spark.streaming.events import stream_sessionize, stream_tumbling_agg
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_schema(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """Spark's file streaming source requires a *directory*; stage the single
    events.parquet fixture file into one."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "events.parquet")
    return str(d)


def _run_stream(spark, sdf, name: str):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_tumbling_matches_batch(spark, event_schema, events_dir):
    stream = (
        spark.readStream.schema(event_schema)
        .format("parquet")
        .load(events_dir)
    )
    out = _run_stream(spark, stream_tumbling_agg(stream), "tumbling_mem")
    batch = tumbling_agg(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))
    srows = {tuple(r) for r in out.collect()}
    brows = {tuple(r) for r in batch.collect()}
    assert srows == brows


def test_stream_sessions_counts(spark, event_schema, events_dir):
    stream = (
        spark.readStream.schema(event_schema)
        .format("parquet")
        .load(events_dir)
    )
    out = _run_stream(spark, stream_sessionize(stream), "sessions_mem")
    rows = out.collect()
    assert len(rows) > 0
    # every session spans ≥ 1 event and start ≤ end
    for r in rows:
        assert r["n_events"] >= 1
        assert r["start_us"] <= r["end_us"]
    # total events across sessions == table size
    total = sum(r["n_events"] for r in rows)
    assert total == spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
