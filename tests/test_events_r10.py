"""Round-10 event ops: funnel conversion-latency percentiles (op 156).

Driver-gated as q79 (full DuckDB parity at sf0.01); here the edge cases
and the rank-selection law on constructed funnels.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from dwca_parquet_spark.operators.events import (
    funnel_latency,
    sql_funnel_latency,
)

STAGES = ("a", "b", "c")


def _ev(spark, rows):
    # ts as epoch-nanos bigint (the ts_micros bigint branch)
    return spark.createDataFrame(
        [(u, t, us * 1000) for u, t, us in rows],
        "user_id string, event_type string, ts long",
    )


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_nearest_rank_selection_exact(spark):
    # 10 users convert a→b with latencies 1..10 µs; nearest-rank:
    # p50 = ceil(0.5·10) = rank 5 → 5; p90 = rank 9 → 9; p99 = rank 10
    rows = []
    for i in range(1, 11):
        rows.append((f"u{i}", "a", 100))
        rows.append((f"u{i}", "b", 100 + i))
    out = _rows(
        funnel_latency(_ev(spark, rows), ("a", "b"))
    )
    assert out == [(2, "b", 10, 5, 9, 10)]


def test_tied_latencies_and_empty_stage(spark):
    rows = []
    for i in range(6):
        rows.append((f"u{i}", "a", 10))
        rows.append((f"u{i}", "b", 17))  # all latencies tie at 7
    out = _rows(funnel_latency(_ev(spark, rows), STAGES))
    assert out[0] == (2, "b", 6, 7, 7, 7)
    # stage c has no converts: n_conv 0 absent from counts → row missing
    assert [r[0] for r in out] == [2]


def test_duckdb_twin_on_constructed_funnel(spark):
    import random

    rng = random.Random(5)
    rows = []
    for i in range(200):
        t0 = rng.randrange(1000)
        rows.append((f"u{i}", "a", t0))
        if rng.random() < 0.7:
            t1 = t0 + rng.randrange(1, 50)
            rows.append((f"u{i}", "b", t1))
            if rng.random() < 0.5:
                rows.append((f"u{i}", "c", t1 + rng.randrange(1, 50)))
    df = _ev(spark, rows)
    con = duckdb.connect()
    con.register(
        "ev_fixture",
        pd.DataFrame(rows, columns=["user_id", "event_type", "us"]),
    )
    sql = sql_funnel_latency(
        "ev_fixture", STAGES, ts_expr="us"
    )
    assert _rows(funnel_latency(df, STAGES)) == [
        tuple(r) for r in con.execute(sql).fetchall()
    ]
    # horizon variant too
    sql_h = sql_funnel_latency("ev_fixture", STAGES, horizon_us=30, ts_expr="us")
    assert _rows(funnel_latency(df, STAGES, horizon_us=30)) == [
        tuple(r) for r in con.execute(sql_h).fetchall()
    ]


# --- op 159: exact per-group nearest-rank quantiles -------------------------


def test_group_quantiles_matches_python_reference_and_twin(spark):
    import math
    import random

    from dwca_parquet_spark.operators.relational import (
        group_quantiles,
        sql_group_quantiles,
    )

    rng = random.Random(3)
    rows = []
    for g in ("a", "b", "c"):
        for _ in range(rng.randrange(5, 60)):
            rows.append((g, round(rng.uniform(0, 100), 2)))
    rows += [("a", None), ("nullonly", None)]  # NULLs leave the universe
    rows += [("ties", 7.0)] * 9  # a tie plateau
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = {
        r["event_type"]: r
        for r in group_quantiles(df, "event_type", "value").collect()
    }
    # python nearest-rank mirror
    byg = {}
    for g, v in rows:
        if v is not None:
            byg.setdefault(g, []).append(v)
    for g, vs in byg.items():
        vs.sort()
        n = len(vs)
        assert out[g]["n"] == n
        for pm in (500, 900, 990):
            rank = (n * pm + 999) // 1000
            assert out[g][f"p{pm}"] == vs[rank - 1], (g, pm)
    assert "nullonly" not in out  # no non-null values → no row
    assert out["ties"]["p500"] == out["ties"]["p990"] == 7.0
    # duckdb twin
    import pandas as pd
    import duckdb

    con = duckdb.connect()
    con.register(
        "qfix", pd.DataFrame(rows, columns=["event_type", "value"])
    )
    got = sorted(
        tuple(r)
        for r in con.execute(
            sql_group_quantiles("qfix", "event_type", "value")
        ).fetchall()
    )
    sp = sorted(
        tuple(r)
        for r in group_quantiles(df, "event_type", "value").collect()
    )
    assert sp == got
