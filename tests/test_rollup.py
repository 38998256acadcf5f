"""Incremental rollup state (SURVEY §2 round-4): any batch folding order
reproduces the from-scratch DuckDB aggregate exactly, and the
state-side merge is Exchange-free when state and partials are bucketed
on the group key (the CDC plan-pin, applied to summaries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.rollup import (
    rollup_merge,
    rollup_partial,
    rollup_read,
    sql_rollup_from_scratch,
)
from tests.conftest import SF_T2

KEYS = ["l_returnflag", "l_linestatus"]
VALS = ["l_quantity", "l_extendedprice"]


def _final(state):
    rows = rollup_read(state, VALS).collect()
    return {
        (r["l_returnflag"], r["l_linestatus"]): tuple(
            r[c]
            for c in ["cnt"]
            + [f"{s}_{v}" for v in VALS for s in ("sum", "min", "max", "mean")]
        )
        for r in rows
    }


def test_batched_folds_equal_from_scratch(spark, duck):
    li = spark.read.parquet(f"{SF_T2}/lineitem.parquet")
    # three uneven batches, folded left-to-right
    b0 = li.filter(F.col("l_orderkey") % 4 == 0)
    b1 = li.filter(F.col("l_orderkey") % 4 == 1)
    b23 = li.filter(F.col("l_orderkey") % 4 >= 2)
    state = rollup_partial(b0, KEYS, VALS)
    state = rollup_merge(state, rollup_partial(b1, KEYS, VALS), KEYS, VALS)
    state = rollup_merge(state, rollup_partial(b23, KEYS, VALS), KEYS, VALS)
    got = _final(state)

    cur = duck.execute(sql_rollup_from_scratch("lineitem", KEYS, VALS))
    cols = [d[0] for d in cur.description]
    want = {}
    for row in cur.fetchall():
        d = dict(zip(cols, row))
        want[(d["l_returnflag"], d["l_linestatus"])] = tuple(
            d[c]
            for c in ["cnt"]
            + [f"{s}_{v}" for v in VALS for s in ("sum", "min", "max", "mean")]
        )
    assert got == want

    # and a different fold order gives the identical state (associativity)
    alt = rollup_merge(
        rollup_partial(b23, KEYS, VALS),
        rollup_merge(
            rollup_partial(b1, KEYS, VALS),
            rollup_partial(b0, KEYS, VALS),
            KEYS,
            VALS,
        ),
        KEYS,
        VALS,
    )
    assert _final(alt) == got


def test_bucketed_state_merge_is_exchange_free(spark, tmp_path):
    from dwca_parquet_spark.sinks.parquet import write_bucketed

    li = spark.read.parquet(f"{SF_T2}/lineitem.parquet")
    state = rollup_partial(li.filter(F.col("l_orderkey") % 2 == 0), KEYS, VALS)
    partial = rollup_partial(li.filter(F.col("l_orderkey") % 2 == 1), KEYS, VALS)
    write_bucketed(state, "roll_state_b", KEYS, 4,
                   path=str(tmp_path / "state"))
    write_bucketed(partial, "roll_part_b", KEYS, 4,
                   path=str(tmp_path / "part"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        merged = rollup_merge(
            spark.table("roll_state_b"), spark.table("roll_part_b"), KEYS, VALS
        )
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # still exact
        got = _final(merged)
        want = _final(rollup_partial(li, KEYS, VALS))
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS roll_state_b")
        spark.sql("DROP TABLE IF EXISTS roll_part_b")


def test_log_histogram_parity_merge_and_percentile(spark, duck):
    from dwca_parquet_spark.operators.rollup import (
        log_hist_merge,
        log_hist_partial,
        log_hist_percentile,
        sql_log_hist,
    )

    li = spark.read.parquet(f"{SF_T2}/lineitem.parquet")
    hist = log_hist_partial(li, "l_extendedprice")
    got = {r["bucket"]: r["cnt"] for r in hist.collect()}
    want = dict(
        duck.execute(sql_log_hist("lineitem", "l_extendedprice")).fetchall()
    )
    assert got == want

    # shard merge == whole
    a = log_hist_partial(li.filter(F.col("l_orderkey") % 2 == 0),
                         "l_extendedprice")
    b = log_hist_partial(li.filter(F.col("l_orderkey") % 2 == 1),
                         "l_extendedprice")
    merged = {r["bucket"]: r["cnt"] for r in log_hist_merge(a, b).collect()}
    assert merged == got

    # percentile within the 2x bucket bound of the exact answer
    exact = li.approxQuantile("l_extendedprice", [0.5], 0.001)[0]
    est = log_hist_percentile(hist, 0.5)
    assert exact / 2 <= est <= exact * 2, (est, exact)


def test_value_scale_preserves_fine_precision(spark, duck):
    """ADVICE r4: the default scale-2 cast quantized fine-grained values
    (quality scores in [0,1]) before summing. value_scale parameterizes
    the quantization point; at scale 9 the folded state equals the
    DuckDB from-scratch aggregate at the SAME scale on a score column
    whose digits a 2-dp cast would destroy. The score is n_chars/256
    — exact in double AND within scale 9 (8 binary places), so neither
    engine rounds anywhere and parity is exact (the repo's portable-
    arithmetic rule: no cross-engine float rounding points)."""
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    scored = docs.select(
        "lang", (F.col("n_chars") / F.lit(256.0)).alias("score")
    )
    a = scored.filter(F.col("n_chars") % 2 == 0)
    b = scored.filter(F.col("n_chars") % 2 == 1)
    state = rollup_merge(
        rollup_partial(a, ["lang"], ["score"], value_scale=9),
        rollup_partial(b, ["lang"], ["score"], value_scale=9),
        ["lang"],
        ["score"],
        value_scale=9,
    )
    got = {
        r["lang"]: (r["cnt"], r["sum_score"], r["min_score"], r["max_score"])
        for r in state.collect()
    }
    cur = duck.execute(
        sql_rollup_from_scratch(
            "(SELECT lang, CAST(n_chars AS DOUBLE)/256.0 AS score FROM documents)",
            ["lang"],
            ["score"],
            value_scale=9,
        )
    )
    cols = [d[0] for d in cur.description]
    want = {}
    for row in cur.fetchall():
        d = dict(zip(cols, row))
        want[d["lang"]] = (d["cnt"], d["sum_score"], d["min_score"], d["max_score"])
    assert got == want
    # and the scale-9 sum really carries sub-cent digits (guards against a
    # silent re-quantization to 2 dp anywhere in the fold)
    assert any(v[1] != v[1].quantize(__import__("decimal").Decimal("0.01"))
               for v in got.values())
