"""Streaming value-distribution state (SURVEY §2 op 160): per-(key,
value) counts are additive, so report(state) ≡ the one-shot op-159
group_quantiles over the union ROW-FOR-ROW via the shared selection
stage; replayed batches are no-ops; the real stream wiring converges."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.relational import group_quantiles
from dwca_parquet_spark.streaming.activity import (
    apply_vdist_batch,
    read_vdist_state,
    stream_vdist_maintain,
    vdist_quantile_report,
)
from tests.conftest import SF_T2


def _events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF_T2}/events.parquet").select(
        "user_id", "event_type", "value"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _one_shot(d):
    # the state casts to stable types (string key, double value) — cast
    # the one-shot side identically to compare
    return group_quantiles(
        d.select(
            F.col("event_type").cast("string").alias("key"),
            F.col("value").cast("double").alias("value"),
        ),
        "key",
        "value",
    )


def test_fold_equals_one_shot_quantiles(spark, tmp_path):
    d = _events(spark)
    state = str(tmp_path / "state")
    parts = [
        d.filter(F.pmod(F.xxhash64("user_id"), F.lit(3)) == i)
        for i in range(3)
    ]
    for i, p in enumerate(parts):
        assert apply_vdist_batch(spark, state, p, i) is True
    _, st = read_vdist_state(spark, state)
    assert _rows(vdist_quantile_report(st)) == _rows(_one_shot(d))
    # a non-default permille set reads off the SAME state
    assert _rows(vdist_quantile_report(st, (250, 750))) == _rows(
        group_quantiles(
            d.select(
                F.col("event_type").cast("string").alias("key"),
                F.col("value").cast("double").alias("value"),
            ),
            "key",
            "value",
            (250, 750),
        )
    )


def test_replay_is_noop(spark, tmp_path):
    d = _events(spark)
    state = str(tmp_path / "state")
    h1 = d.filter(F.pmod(F.xxhash64("user_id"), F.lit(2)) == 0)
    assert apply_vdist_batch(spark, state, h1, 0) is True
    before = _rows(read_vdist_state(spark, state)[1])
    assert apply_vdist_batch(spark, state, h1, 0) is False
    assert _rows(read_vdist_state(spark, state)[1]) == before


def test_stream_wiring_converges(spark, tmp_path):
    d = _events(spark)
    src = str(tmp_path / "src")
    d.repartition(3).write.parquet(src)
    state = str(tmp_path / "state")
    q = stream_vdist_maintain(
        spark.readStream.schema(d.schema).format("parquet").load(src),
        state,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    _, st = read_vdist_state(spark, state)
    assert _rows(vdist_quantile_report(st)) == _rows(_one_shot(d))
