"""Structured Streaming tests: file source feeding the events fixture →
memory sink; results must equal the batch operators' (streaming/batch
unification is the point of the lift)."""

from __future__ import annotations

import shutil

import pytest

from dwca_parquet_spark.operators.events import sliding_agg, tumbling_agg
from dwca_parquet_spark.streaming.events import (
    stream_sessionize,
    stream_sliding_agg,
    stream_tumbling_agg,
)
from dwca_parquet_spark.streaming.stateful import (
    stream_dedup_exact,
    stream_user_stats,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_schema(spark):
    # the conftest session is deliberately plain (driver parity); events.ts
    # is parquet TIMESTAMP(NANOS), so opt into the ns-as-long read here
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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


def test_stream_sliding_matches_batch(spark, event_schema, events_dir):
    stream = (
        spark.readStream.schema(event_schema)
        .format("parquet")
        .load(events_dir)
    )
    out = _run_stream(spark, stream_sliding_agg(stream), "sliding_mem")
    batch = sliding_agg(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))
    srows = {tuple(r) for r in out.collect()}
    brows = {tuple(r) for r in batch.collect()}
    assert srows == brows


def test_stream_dedup_exact_matches_batch(spark, tmp_path):
    """Streaming dedup keeps exactly one row per text fingerprint — the
    same distinct-hash count the batch dedup_exact operator produces."""
    from dwca_parquet_spark.operators.dedup import dedup_exact

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    # stage documents with a synthetic event time (ns-longs, one second
    # apart, starting 2023 — an event AT epoch 0 equals the initial
    # watermark and would be dropped as late)
    staged = docs.selectExpr(
        "doc_id",
        "text",
        "1700000000000000000 + CAST(doc_id AS LONG) * 1000000000 AS ts",
    )
    d = tmp_path / "docs_stream"
    staged.write.parquet(str(d))
    stream = (
        spark.readStream.schema(staged.schema).format("parquet").load(str(d))
    )
    dedup = stream_dedup_exact(stream, "doc_id", "text")
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_mem")
    n_batch_groups = dedup_exact(docs, "doc_id", "text").count()
    assert out.count() == n_batch_groups
    assert out.select("text_hash").distinct().count() == n_batch_groups


def test_stream_user_stats_stateful(spark, event_schema, events_dir):
    """applyInPandasWithState running totals: final per-user state equals
    the batch groupBy, exactly (integer-micros accumulation)."""
    stream = (
        spark.readStream.schema(event_schema)
        .format("parquet")
        .load(events_dir)
    )
    q = (
        stream_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode may emit a row per micro-batch; the last per user wins
    out = spark.sql(
        """
        SELECT user_id, n_events, total_value_micros FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY n_events DESC) AS rn
          FROM user_stats_mem) WHERE rn = 1
        """
    )
    import pyspark.sql.functions as F

    batch = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.round(F.col("value").cast("double") * 1_000_000, 0).cast("long")
            ).alias("total_value_micros"),
        )
    )
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


def test_stream_stream_attribution_join(spark, event_schema, events_dir):
    """Stream-stream inner join (watermarked, time-bounded) equals the same
    expression evaluated on batch DataFrames."""
    from dwca_parquet_spark.streaming.events import stream_attribution_join

    def split(df):
        return (
            df.filter(df.event_type == "click"),
            df.filter(df.event_type == "purchase"),
        )

    stream = (
        spark.readStream.schema(event_schema).format("parquet").load(events_dir)
    )
    joined = stream_attribution_join(*split(stream))
    q = (
        joined.writeStream.format("memory")
        .queryName("attr_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM attr_mem")

    batch = stream_attribution_join(
        *split(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))
    )
    srows = sorted(tuple(r) for r in out.collect())
    brows = sorted(tuple(r) for r in batch.collect())
    assert len(brows) > 0, "fixture produced no click→purchase pairs"
    assert srows == brows


def test_stream_dedup_canonical_url_matches_batch(spark, tmp_path):
    """Streaming canonical-URL dedup keeps one record per canonical key —
    equal to the batch canonicalize_urls + distinct count, on a stream
    containing tracking-param/port/case variants of the same pages."""
    from dwca_parquet_spark.operators.text import canonicalize_urls
    from dwca_parquet_spark.streaming.stateful import (
        stream_dedup_canonical_url,
    )

    urls = [
        "http://A.example.com:80/page?utm_source=x",
        "http://a.example.com/page",
        "https://b.example.org/other?b=2&a=1",
        "https://b.example.org/other?a=1&b=2",
        "https://c.example.net/third",
        "https://c.example.net/third#frag",
        "https://d.example.io/fresh?q=1",
    ]
    staged = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "rid long, url string"
    ).selectExpr(
        "rid", "url",
        "1700000000000000000 + CAST(rid AS LONG) * 1000000000 AS ts",
    )
    d = tmp_path / "urls_stream"
    staged.write.parquet(str(d))
    stream = (
        spark.readStream.schema(staged.schema).format("parquet").load(str(d))
    )
    out_q = (
        stream_dedup_canonical_url(stream, "url")
        .writeStream.format("memory")
        .queryName("canon_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    out_q.awaitTermination(120)
    out = spark.sql("SELECT * FROM canon_mem")
    batch_keys = (
        canonicalize_urls(staged, "url")
        .select("canonical_url")
        .distinct()
        .count()
    )
    assert batch_keys == 4
    assert out.count() == 4
    assert out.select("canonical_url").distinct().count() == 4
