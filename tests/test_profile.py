"""Table profiling (SURVEY §2 round-4): exact-mode DuckDB parity on
engine-portable column types, approx-mode HLL sanity, null accounting,
and the one-scan plan shape of the approx path."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.profile import (
    profile_table,
    sql_profile_table,
)
from tests.conftest import SF_T2

COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
        "o_orderpriority"]


def test_profile_parity_orders(spark, duck):
    orders = spark.read.parquet(f"{SF_T2}/orders.parquet")
    got = {
        r["column"]: (r["n_rows"], r["n_nulls"], r["n_distinct"],
                      r["min_value"], r["max_value"])
        for r in profile_table(orders, COLS).collect()
    }
    want = {
        r[0]: tuple(r[1:])
        for r in duck.execute(sql_profile_table("orders", COLS)).fetchall()
    }
    assert got == want
    assert len(got) == len(COLS)


def test_profile_null_accounting(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, None)], "x int, s string"
    )
    got = {r["column"]: r.asDict() for r in profile_table(df).collect()}
    assert got["x"]["n_rows"] == 4
    assert got["x"]["n_nulls"] == 1
    assert got["x"]["n_distinct"] == 3
    assert got["x"]["min_value"] == "1" and got["x"]["max_value"] == "3"
    assert got["s"]["n_nulls"] == 2
    assert got["s"]["n_distinct"] == 1
    assert got["s"]["min_value"] == "a"


def test_profile_approx_mode(spark):
    """HLL cardinalities land within 10% on the orders fixture, and the
    approx plan has no Expand (the exact multi-distinct rewrite)."""
    orders = spark.read.parquet(f"{SF_T2}/orders.parquet")
    exact = {
        r["column"]: r["n_distinct"]
        for r in profile_table(orders, COLS).collect()
    }
    approx_df = profile_table(orders, COLS, approx=True)
    approx = {r["column"]: r["n_distinct"] for r in approx_df.collect()}
    for c in COLS:
        assert abs(approx[c] - exact[c]) <= max(2, 0.10 * exact[c])
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    exact_plan = (
        profile_table(orders, COLS)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in exact_plan  # documents WHY approx is the scale mode


EXPECT_RULES = [
    {"kind": "not_null", "column": "o_orderkey"},
    {"kind": "unique", "column": "o_orderkey"},
    {"kind": "min", "column": "o_totalprice", "value": 0},
    {"kind": "max", "column": "o_totalprice", "value": 100_000},
    {"kind": "in_set", "column": "o_orderstatus", "values": ["O", "F", "P"]},
    {"kind": "matches", "column": "o_orderpriority", "pattern": r"\d-[A-Z ]+"},
    {"kind": "row_count_min", "value": 1_000},
]


def test_expectations_parity_and_gate(spark, duck):
    from dwca_parquet_spark.operators.profile import (
        check_expectations,
        sql_check_expectations,
    )

    orders = spark.read.parquet(f"{SF_T2}/orders.parquet")
    got = sorted(
        map(tuple, check_expectations(orders, EXPECT_RULES).collect())
    )
    want = sorted(
        duck.execute(sql_check_expectations("orders", EXPECT_RULES)).fetchall()
    )
    assert got == want
    by_idx = {r[0]: r for r in got}
    assert by_idx[0][4] and by_idx[1][4]  # key integrity holds

    # planted violations
    bad = spark.createDataFrame(
        [(None, "X", -5.0), (1, "O", 10.0), (1, "O", 20.0)],
        "k long, status string, price double",
    )
    rules = [
        {"kind": "not_null", "column": "k"},
        {"kind": "unique", "column": "k"},
        {"kind": "min", "column": "price", "value": 0},
        {"kind": "in_set", "column": "status", "values": ["O", "F"]},
        {"kind": "row_count_min", "value": 10},
    ]
    res = {r["rule_idx"]: r for r in check_expectations(bad, rules).collect()}
    assert res[0]["violations"] == 1          # one null key
    assert res[1]["violations"] == 1          # k=1 twice
    assert res[2]["violations"] == 1          # -5 price
    assert res[3]["violations"] == 1          # status X
    assert res[4]["violations"] == 7          # 3 rows, need 10
    assert not any(r["passed"] for r in res.values())
