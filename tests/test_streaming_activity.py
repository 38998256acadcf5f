"""Streaming activity state (SURVEY §2 op 143): additive counts + exact
decimal sums fold per micro-batch, so report(state) ≡ the one-shot batch
operator over the union ROW-FOR-ROW for BOTH panels (op-138 resample,
op-140 cohort); replayed batches are no-ops; the real stream wiring
converges."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.events import cohort_retention, resample_ffill
from dwca_parquet_spark.streaming.activity import (
    HOUR_US,
    apply_activity_batch,
    activity_cohort_report,
    activity_resample_report,
    read_activity_state,
    stream_activity_maintain,
)
from tests.conftest import SF_T2

WEEK_US = 168 * HOUR_US


def _events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF_T2}/events.parquet").select(
        "user_id", "ts", "value"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _one_shot_resample(d):
    # the state keys are strings; cast the one-shot side to compare
    return resample_ffill(
        d.select(F.col("user_id").cast("string").alias("user_id"), "ts", "value"),
        key_col="user_id",
        interval_us=HOUR_US,
    )


def test_fold_equals_one_shot_for_both_panels(spark, tmp_path):
    d = _events(spark)
    state = str(tmp_path / "st")
    for i, b in enumerate(d.randomSplit([1.0, 1.0, 1.0], seed=9)):
        assert apply_activity_batch(spark, state, b, i)
    _, st = read_activity_state(spark, state)

    got = activity_resample_report(st, key_col="user_id")
    want = _one_shot_resample(d)
    assert _rows(got) == _rows(want) and got.count() > 0

    got_c = activity_cohort_report(st)
    want_c = cohort_retention(d, bucket_us=WEEK_US)
    assert _rows(got_c) == _rows(want_c) and got_c.count() > 0


def test_replay_is_noop(spark, tmp_path):
    d = _events(spark).limit(500)
    state = str(tmp_path / "st2")
    assert apply_activity_batch(spark, state, d, 0)
    before = _rows(read_activity_state(spark, state)[1])
    assert not apply_activity_batch(spark, state, d, 0)
    assert _rows(read_activity_state(spark, state)[1]) == before


def test_stream_wiring_converges(spark, tmp_path):
    d = _events(spark)
    src = str(tmp_path / "src")
    d.repartition(3).write.parquet(src)
    state = str(tmp_path / "state")
    q = stream_activity_maintain(
        spark.readStream.schema(d.schema).format("parquet").load(src),
        state,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    _, st = read_activity_state(spark, state)
    assert _rows(activity_resample_report(st, key_col="user_id")) == _rows(
        _one_shot_resample(d)
    )


# ---------------------------------------------------------------------------
# streaming trend state (op 146): additive decimal moments ⇒ report(state)
# ≡ one-shot trend_by_group EXACTLY (same closed-form stage)
# ---------------------------------------------------------------------------

from dwca_parquet_spark.operators.events import trend_by_group
from dwca_parquet_spark.streaming.activity import (
    apply_trend_batch,
    read_trend_state,
    stream_trend_maintain,
    trend_report,
)

X_ORIGIN = 1_704_067_200_000_000


def _trend_events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF_T2}/events.parquet").select(
        "event_type", "ts", "value"
    )


def _one_shot_trend(d):
    return trend_by_group(
        d.select(
            F.col("event_type").cast("string").alias("event_type"),
            "ts",
            "value",
        ),
        group_col="event_type",
        x_origin_us=X_ORIGIN,
    )


def test_trend_fold_equals_one_shot_exactly(spark, tmp_path):
    d = _trend_events(spark)
    state = str(tmp_path / "tst")
    for i, b in enumerate(d.randomSplit([1.0, 1.0, 1.0], seed=11)):
        assert apply_trend_batch(
            spark, state, b, i, x_origin_us=X_ORIGIN
        )
    _, st = read_trend_state(spark, state)
    got = _rows(trend_report(st))
    want = _rows(_one_shot_trend(d))
    assert got == want and len(got) == 5


def test_trend_replay_is_noop(spark, tmp_path):
    d = _trend_events(spark).limit(400)
    state = str(tmp_path / "tst2")
    assert apply_trend_batch(spark, state, d, 0, x_origin_us=X_ORIGIN)
    before = _rows(read_trend_state(spark, state)[1])
    assert not apply_trend_batch(spark, state, d, 0, x_origin_us=X_ORIGIN)
    assert _rows(read_trend_state(spark, state)[1]) == before


def test_trend_stream_wiring_converges(spark, tmp_path):
    d = _trend_events(spark)
    src = str(tmp_path / "tsrc")
    d.repartition(3).write.parquet(src)
    state = str(tmp_path / "tstate")
    q = stream_trend_maintain(
        spark.readStream.schema(d.schema).format("parquet").load(src),
        state,
        str(tmp_path / "tckpt"),
        x_origin_us=X_ORIGIN,
    )
    q.awaitTermination(120)
    _, st = read_trend_state(spark, state)
    assert _rows(trend_report(st)) == _rows(_one_shot_trend(d))


def test_rolling_actives_report_equals_one_shot(spark, tmp_path):
    from dwca_parquet_spark.operators.events import rolling_active_users
    from dwca_parquet_spark.streaming.activity import activity_rolling_report

    d = _events(spark)
    state = str(tmp_path / "rst")
    for i, b in enumerate(d.randomSplit([1.0, 1.0], seed=13)):
        assert apply_activity_batch(spark, state, b, i)
    _, st = read_activity_state(spark, state)
    got = _rows(activity_rolling_report(st, window_buckets=7))
    want = _rows(
        rolling_active_users(
            d.select(F.col("user_id").cast("string").alias("user_id"),
                     "ts", "value"),
            window_buckets=7,
        )
    )
    assert got == want and len(got) > 0


def test_anomaly_and_cusum_reports_equal_one_shot(spark, tmp_path):
    from dwca_parquet_spark.operators.events import (
        bucket_anomalies,
        cusum_alarms,
    )
    from dwca_parquet_spark.streaming.activity import (
        activity_anomaly_report,
        activity_cusum_report,
    )

    # monitor keyed by event_type: a deployment maintains a second
    # activity state with key_col="event_type"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF_T2}/events.parquet").select(
        "event_type", "ts", "value"
    )
    state = str(tmp_path / "mon")
    for i, b in enumerate(ev.randomSplit([1.0, 1.0], seed=17)):
        assert apply_activity_batch(
            spark, state, b, i, key_col="event_type"
        )
    _, st = read_activity_state(spark, state)

    one_shot = ev.select(
        F.col("event_type").cast("string").alias("event_type"), "ts", "value"
    )
    got_a = _rows(activity_anomaly_report(st, z_threshold=2.0))
    want_a = _rows(bucket_anomalies(one_shot, z_threshold=2.0))
    assert got_a == want_a and len(got_a) > 0

    got_c = _rows(activity_cusum_report(st, tau=4.0))
    want_c = _rows(cusum_alarms(one_shot, tau=4.0))
    assert got_c == want_c and len(got_c) > 0
