"""Streaming funnel state (SURVEY §2 op 155): the distinct
(user, stage-type, µs) set is the exact sufficient statistic, so
report(state) ≡ the one-shot op-139 funnel over the union ROW-FOR-ROW —
including the adversarial late-data split where any per-stage scalar
summary provably fails; replayed batches are no-ops; the real stream
wiring converges."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.events import funnel
from dwca_parquet_spark.streaming.funnel import (
    apply_funnel_batch,
    funnel_report,
    read_funnel_state,
    stream_funnel_maintain,
)
from tests.conftest import SF_T2

STAGES = ("view", "click", "purchase")


def _events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF_T2}/events.parquet").select(
        "user_id", "event_type", "ts"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _one_shot(d, horizon_us=None):
    # the state keys are strings; cast the one-shot side to compare
    return funnel(
        d.select(
            F.col("user_id").cast("string").alias("user_id"),
            "event_type",
            "ts",
        ),
        STAGES,
        horizon_us=horizon_us,
    )


def test_fold_equals_one_shot_funnel(spark, tmp_path):
    d = _events(spark)
    state = str(tmp_path / "state")
    # three time-disjoint batches by hash of user (NOT time — unordered
    # arrival is the general case the state must survive)
    parts = [
        d.filter(F.pmod(F.xxhash64("user_id"), F.lit(3)) == i)
        for i in range(3)
    ]
    for i, p in enumerate(parts):
        assert apply_funnel_batch(spark, state, p, i, STAGES) is True
    _, st = read_funnel_state(spark, state)
    assert _rows(funnel_report(st, STAGES)) == _rows(_one_shot(d))
    # with a conversion horizon too (same state serves any horizon)
    h = 72 * 3_600_000_000
    assert _rows(funnel_report(st, STAGES, horizon_us=h)) == _rows(
        _one_shot(d, horizon_us=h)
    )


def test_min_state_counterexample_is_handled(spark, tmp_path):
    # batch 1: s2@5, s1@10 — a qualifying-time summary would fix t1=10
    # and DISCARD the s2@5 event (nothing qualifies after 10);
    # batch 2: late s1@1 — the true union funnel converts via t1=1,
    # t2=5. The distinct-set state reports it exactly.
    b1 = spark.createDataFrame(
        [("u1", "click", 5_000), ("u1", "view", 10_000)],
        "user_id string, event_type string, ts long",
    )  # ts long = epoch nanos per ts_micros' bigint branch
    b2 = spark.createDataFrame(
        [("u1", "view", 1_000)],
        "user_id string, event_type string, ts long",
    )
    state = str(tmp_path / "state")
    apply_funnel_batch(spark, state, b1, 0, STAGES)
    apply_funnel_batch(spark, state, b2, 1, STAGES)
    _, st = read_funnel_state(spark, state)
    got = {r["stage"]: r["n_users"] for r in funnel_report(st, STAGES).collect()}
    assert got == {"view": 1, "click": 1, "purchase": 0}
    union = b1.unionByName(b2)
    assert _rows(funnel_report(st, STAGES)) == _rows(
        funnel(union, STAGES)
    )


def test_replay_is_noop_and_duplicates_collapse(spark, tmp_path):
    d = _events(spark)
    state = str(tmp_path / "state")
    h1 = d.filter(F.pmod(F.xxhash64("user_id"), F.lit(2)) == 0)
    h2 = d.filter(F.pmod(F.xxhash64("user_id"), F.lit(2)) == 1)
    assert apply_funnel_batch(spark, state, h1, 0, STAGES) is True
    before = _rows(read_funnel_state(spark, state)[1])
    # replay of batch 0 → no-op
    assert apply_funnel_batch(spark, state, h1, 0, STAGES) is False
    assert _rows(read_funnel_state(spark, state)[1]) == before
    # re-delivering already-seen EVENTS in a new batch id collapses in
    # the distinct — state and report identical to the clean fold
    assert apply_funnel_batch(spark, state, h1.unionByName(h2), 1, STAGES)
    _, st = read_funnel_state(spark, state)
    assert _rows(funnel_report(st, STAGES)) == _rows(_one_shot(d))


def test_stream_wiring_converges(spark, tmp_path):
    d = _events(spark)
    src = str(tmp_path / "src")
    d.repartition(3).write.parquet(src)
    state = str(tmp_path / "state")
    q = stream_funnel_maintain(
        spark.readStream.schema(d.schema).format("parquet").load(src),
        state,
        str(tmp_path / "ckpt"),
        STAGES,
    )
    q.awaitTermination(120)
    _, st = read_funnel_state(spark, state)
    assert _rows(funnel_report(st, STAGES)) == _rows(_one_shot(d))
