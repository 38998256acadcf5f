"""Semantic gates for the round-9 event-analytics ops (SURVEY §2.G
138-140): resample_ffill, funnel, cohort_retention. The sf0.01 twin gate
lives in test_correctness.py; these pin the hand-checkable semantics the
twin can't isolate (gap rows, horizon cutoffs, ordering violations).

ts columns are epoch-NANOS bigints — the same storage the fixture events
table surfaces under nanosAsLong, exercising ts_micros' div-1000 branch.
"""

from __future__ import annotations

from dwca_parquet_spark.operators import events as E

US = 1_000  # ns per µs
HOUR_NS = 3_600_000_000 * US


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts bigint, event_type string, value double"
    )


def test_resample_fills_gaps_and_carries_value(spark):
    df = _ev(
        spark,
        [
            # user 1: buckets 10 and 13 active, 11/12 are gaps
            (1, 10 * HOUR_NS, "view", 2.50),
            (1, 10 * HOUR_NS + 5, "view", 1.25),
            (1, 13 * HOUR_NS, "view", 4.00),
            # user 2: single bucket — grid is one row, no gaps
            (2, 20 * HOUR_NS, "view", 7.00),
        ],
    )
    out = {
        (r["user_id"], r["bucket"]): (r["n_events"], r["filled_value"])
        for r in E.resample_ffill(df, interval_us=3_600_000_000).collect()
    }
    assert set(out) == {(1, 10), (1, 11), (1, 12), (1, 13), (2, 20)}
    assert out[(1, 10)] == (2, 3.75)
    assert out[(1, 11)] == (0, 3.75)  # gap: count 0, value carried
    assert out[(1, 12)] == (0, 3.75)
    assert out[(1, 13)] == (1, 4.00)
    assert out[(2, 20)] == (1, 7.00)


def test_funnel_ordering_and_horizon(spark):
    h = 72 * HOUR_NS // US  # horizon in µs
    df = _ev(
        spark,
        [
            # u1 converts fully in order within horizon
            (1, 1 * HOUR_NS, "view", 0.0),
            (1, 2 * HOUR_NS, "click", 0.0),
            (1, 3 * HOUR_NS, "purchase", 0.0),
            # u2: click BEFORE view — ordering violation, stops at stage 1
            (2, 5 * HOUR_NS, "click", 0.0),
            (2, 6 * HOUR_NS, "view", 0.0),
            # u3: click after the 72h horizon from first view
            (3, 1 * HOUR_NS, "view", 0.0),
            (3, 80 * HOUR_NS, "click", 0.0),
            # u4: never viewed — not in the funnel at all
            (4, 1 * HOUR_NS, "purchase", 0.0),
        ],
    )
    rows = {
        r["stage"]: (r["n_users"], r["pct_of_first"])
        for r in E.funnel(
            df, stages=("view", "click", "purchase"), horizon_us=h
        ).collect()
    }
    assert rows["view"] == (3, 1.0)
    assert rows["click"] == (1, round(1 / 3, 6))
    assert rows["purchase"] == (1, round(1 / 3, 6))


def test_funnel_same_timestamp_is_not_after(spark):
    # stage-2 event at EXACTLY the stage-1 time: strict > excludes it
    df = _ev(
        spark,
        [
            (1, HOUR_NS, "view", 0.0),
            (1, HOUR_NS, "click", 0.0),
            (1, 2 * HOUR_NS, "click", 0.0),
        ],
    )
    rows = {
        r["stage"]: r["n_users"]
        for r in E.funnel(df, stages=("view", "click")).collect()
    }
    assert rows == {"view": 1, "click": 1}  # the 2h click qualifies
    df2 = _ev(spark, [(1, HOUR_NS, "view", 0.0), (1, HOUR_NS, "click", 0.0)])
    rows2 = {
        r["stage"]: r["n_users"]
        for r in E.funnel(df2, stages=("view", "click")).collect()
    }
    assert rows2 == {"view": 1, "click": 0}


def test_cohort_retention_offsets(spark):
    wk = 7 * 86_400_000_000 * US
    df = _ev(
        spark,
        [
            # u1 first active week 100, returns weeks 101 and 103
            (1, 100 * wk, "view", 0.0),
            (1, 101 * wk, "view", 0.0),
            (1, 103 * wk + 5000, "view", 0.0),
            # u2 same cohort, week 100 only (two events, one activity row)
            (2, 100 * wk, "view", 0.0),
            (2, 100 * wk + 7, "click", 0.0),
            # u3 cohort week 101
            (3, 101 * wk, "view", 0.0),
        ],
    )
    out = {
        (r["cohort_bucket"], r["offset"]): r["n_users"]
        for r in E.cohort_retention(df).collect()
    }
    assert out == {
        (100, 0): 2,
        (100, 1): 1,
        (100, 3): 1,
        (101, 0): 1,
    }


def test_trend_perfect_line_and_degenerate_series(spark):
    # y = 2x + 1 (exact at 2-decimal grid) → slope 2, intercept 1, r2 1
    rows = [(1, x * HOUR_NS, "lin", float(2 * x + 1)) for x in range(6)]
    # constant y → slope 0, r2 NULL (zero variance in y)
    rows += [(1, x * HOUR_NS, "flat", 5.0) for x in range(6)]
    # constant x → slope/intercept/r2 all NULL (zero variance in x)
    rows += [(1, 3 * HOUR_NS, "pole", float(v)) for v in (1, 2, 3)]
    df = _ev(spark, rows)
    out = {r["grp"]: r for r in E.trend_by_group(df).collect()}

    lin = out["lin"]
    assert (lin["slope"], lin["intercept"], lin["r2"]) == (2.0, 1.0, 1.0)
    flat = out["flat"]
    assert (flat["slope"], flat["intercept"], flat["r2"]) == (0.0, 5.0, None)
    pole = out["pole"]
    assert (pole["slope"], pole["intercept"], pole["r2"]) == (
        None,
        None,
        None,
    )
    assert (lin["n"], flat["n"], pole["n"]) == (6, 6, 3)


def test_rolling_actives_window_semantics(spark):
    day = 86_400_000_000 * US
    df = _ev(
        spark,
        [
            # u1 active day 10; u2 active days 10 and 12; u3 day 13
            (1, 10 * day, "view", 0.0),
            (1, 10 * day + 5, "click", 0.0),  # same day, one activity row
            (2, 10 * day, "view", 0.0),
            (2, 12 * day, "view", 0.0),
            (3, 13 * day, "view", 0.0),
        ],
    )
    out = {
        r["bucket"]: r["n_active"]
        for r in E.rolling_active_users(df, window_buckets=3).collect()
    }
    # trailing-3-day actives; no buckets beyond the last active day (13):
    # B=10..12 see {u1,u2} (day-10 activity stays in window through 12);
    # B=13 sees u2 (day 12) + u3 (day 13) — day 10 fell out
    assert out == {10: 2, 11: 2, 12: 2, 13: 2}


def test_rolling_actives_w1_is_plain_dau(spark):
    day = 86_400_000_000 * US
    df = _ev(
        spark,
        [
            (1, 10 * day, "view", 0.0),
            (2, 10 * day, "view", 0.0),
            (1, 12 * day, "view", 0.0),
        ],
    )
    out = {
        r["bucket"]: r["n_active"]
        for r in E.rolling_active_users(df, window_buckets=1).collect()
    }
    assert out == {10: 2, 12: 1}


def test_bucket_anomalies_flags_the_planted_spike(spark):
    # series 'a': 9 quiet hours of 1.00 + one 100.00 spike; series 'b'
    # constant (zero variance → no rows); all timestamps bucket-aligned
    rows = [(1, h * HOUR_NS, "a", 1.00) for h in range(9)]
    rows += [(1, 9 * HOUR_NS, "a", 100.00)]
    rows += [(1, h * HOUR_NS, "b", 5.00) for h in range(10)]
    df = _ev(spark, rows)
    out = E.bucket_anomalies(df, z_threshold=2.0).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["key"], r["bucket"], r["bucket_sum"]) == ("a", 9, 100.00)
    # population z of the spike: mean 10.9, std = sqrt(n*s2 - s1^2)/n
    import math

    s1 = 9 * 1.0 + 100.0
    s2 = 9 * 1.0 + 10000.0
    z = (100.0 - s1 / 10.0) / (math.sqrt(10.0 * s2 - s1 * s1) / 10.0)
    assert r["z"] == round(z, 6)


def test_bucket_anomalies_threshold_is_on_rounded_z(spark):
    # all-equal series has zero variance: emits nothing, never NaN/inf
    rows = [(1, h * HOUR_NS, "flat", 2.00) for h in range(5)]
    assert E.bucket_anomalies(_ev(spark, rows)).collect() == []


def test_cusum_flags_the_planted_level_shift(spark):
    # 10 quiet hours at 1.00 then 10 shifted hours at 3.00; slack 0.50
    # keeps the quiet half silent while the shift accumulates
    from fractions import Fraction as Fr
    import math

    xs = [Fr(1)] * 10 + [Fr(3)] * 10
    rows = [(1, h * HOUR_NS, "s", float(x)) for h, x in enumerate(xs)]
    df = _ev(spark, rows)
    out = {
        r["bucket"]: r["cusum"]
        for r in E.cusum_alarms(df, slack="0.50", tau=2.0).collect()
    }

    # exact mirror of the scaled-decimal closed form
    n, s1 = len(xs), sum(xs)
    s2 = sum(x * x for x in xs)
    kappa = Fr(1, 2)
    denom = math.sqrt(float(n * s2 - s1 * s1))
    p, mn, expect = Fr(0), Fr(0), {}
    for t, x in enumerate(xs):
        p += n * x - s1 - n * kappa
        mn = min(mn, p)
        s_norm = round(float(p - mn) / denom, 6)
        if s_norm > 2.0:
            expect[t] = s_norm
    assert out == expect
    # the shift half alarms, the quiet half does not
    assert expect and all(b >= 10 for b in expect)


def test_cusum_constant_series_emits_nothing(spark):
    rows = [(1, h * HOUR_NS, "flat", 2.00) for h in range(8)]
    assert E.cusum_alarms(_ev(spark, rows)).collect() == []


def test_session_transitions_respect_session_boundaries(spark):
    gap_ns = 30 * 60 * 1_000_000_000
    rows = [
        # session 1: A -> B
        (1, 0, "A"),
        (1, 1_000_000_000, "B"),
        # gap > 30 min: session 2: C -> A -> A
        (1, 2 * gap_ns, "C"),
        (1, 2 * gap_ns + 1_000_000_000, "A"),
        (1, 2 * gap_ns + 2_000_000_000, "A"),
        # another user, single-event session: no transitions
        (2, 0, "B"),
    ]
    df = spark.createDataFrame(
        [(i, u, ts, tp) for i, (u, ts, tp) in enumerate(rows)],
        "event_id bigint, user_id bigint, ts bigint, event_type string",
    )
    out = {
        (r["prev_type"], r["next_type"]): (r["n"], r["prob"])
        for r in E.session_transitions(df).collect()
    }
    # B->C (the cross-session pair) must NOT appear; prev A splits 50/50
    assert out == {
        ("A", "B"): (1, 0.5),
        ("A", "A"): (1, 0.5),
        ("C", "A"): (1, 1.0),
    }


def test_psi_zero_for_identical_halves_and_flags_the_shift(spark):
    import math

    day_ns = 86_400_000_000 * US
    boundary_us = 10 * 86_400_000_000  # day 10
    rows = []
    # 'stable': same values before and after → every pa == pb → psi 0.0
    for d in (1, 2, 11, 12):
        rows += [(1, d * day_ns, "stable", v) for v in (1.00, 5.00, 9.00)]
    # 'shifted': low bins before, high bins after
    rows += [(1, 1 * day_ns, "shifted", 1.00)] * 1
    rows += [(1, 2 * day_ns, "shifted", 3.00)]
    rows += [(1, 11 * day_ns, "shifted", 15.00)]
    rows += [(1, 12 * day_ns, "shifted", 17.00)]
    # 'only_before': empty after-period → NULL psi
    rows += [(1, 1 * day_ns, "only_before", 2.00)]
    df = _ev(spark, rows)
    out = {
        r["key"]: r for r in E.psi_by_group(df, boundary_us=boundary_us).collect()
    }

    assert out["stable"]["psi"] == 0.0
    assert out["only_before"]["psi"] is None
    assert (out["only_before"]["n_before"], out["only_before"]["n_after"]) == (1, 0)

    # exact mirror of the smoothed, bin-ordered fold for 'shifted'
    ca = [0] * 10
    cb = [0] * 10
    ca[0] += 1  # 1.00 // 2
    ca[1] += 1  # 3.00 // 2
    cb[7] += 1  # 15.00 // 2
    cb[8] += 1  # 17.00 // 2
    na, nb = 2 + 10.0, 2 + 10.0
    psi = 0.0
    for b in range(10):
        pa = (ca[b] + 1.0) / na
        pb = (cb[b] + 1.0) / nb
        psi = psi + (pa - pb) * math.log(pa / pb)
    assert out["shifted"]["psi"] == round(psi, 6)
    # well above the stable series (add-one smoothing damps the tiny-n
    # magnitude; at corpus scale a full shift reads far past 0.25)
    assert out["shifted"]["psi"] > 0.2
