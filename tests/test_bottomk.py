"""Gates for the bottom-k (KMV) sketch (SURVEY §2 op 114): DuckDB twin
parity, the exact merge law, partition invariance, estimator accuracy,
salt independence, and the TakeOrderedAndProject plan pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.sketch import (
    bottomk_build,
    bottomk_distinct_estimate,
    bottomk_merge,
    sql_bottomk_build,
)
from tests.conftest import SF_T2

K = 128


def _tuples(df):
    return sorted((r["key"], r["_bh"]) for r in df.collect())


def test_bottomk_duckdb_parity(spark, duck):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    got = _tuples(bottomk_build(docs, "doc_id", K, salt="s1"))
    want = sorted(
        tuple(r)
        for r in duck.execute(
            sql_bottomk_build("documents", "doc_id", K, salt="s1")
        ).fetchall()
    )
    assert got == want and len(got) == K


def test_bottomk_merge_law_and_idempotence(spark):
    df = spark.range(0, 20_000).select(F.col("id").alias("k"))
    a = df.filter("k % 3 != 0")
    b = df.filter("k % 3 != 1")  # overlapping halves
    whole = _tuples(bottomk_build(df, "k", K))
    merged = _tuples(
        bottomk_merge(bottomk_build(a, "k", K), bottomk_build(b, "k", K), K)
    )
    assert merged == whole  # EXACT: union→bottom-k is a lattice join
    s = bottomk_build(df, "k", K)
    assert _tuples(bottomk_merge(s, s, K)) == whole  # idempotent


def test_bottomk_partition_invariance_and_determinism(spark):
    df = spark.range(0, 10_000).select(F.col("id").alias("k"))
    one = _tuples(bottomk_build(df.repartition(1), "k", K))
    many = _tuples(bottomk_build(df.repartition(17), "k", K))
    again = _tuples(bottomk_build(df.repartition(17), "k", K))
    assert one == many == again


def test_bottomk_distinct_estimate(spark):
    for n in (5_000, 50_000):
        df = spark.range(0, n).select(F.col("id").alias("k"))
        k = 256
        est = bottomk_distinct_estimate(bottomk_build(df, "k", k), k)
        assert abs(est - n) / n < 0.25, (n, est)  # ~4σ at 1/√(k-2)
    # under-full state is exact
    small = spark.range(0, 50).select(F.col("id").alias("k"))
    assert bottomk_distinct_estimate(bottomk_build(small, "k", 256), 256) == 50.0


def test_bottomk_salt_draws_independent_samples(spark):
    df = spark.range(0, 50_000).select(F.col("id").alias("k"))
    s1 = {r["key"] for r in bottomk_build(df, "k", 256, salt="").collect()}
    s2 = {r["key"] for r in bottomk_build(df, "k", 256, salt="x").collect()}
    # hypergeometric expectation ≈ k²/n ≈ 1.3 shared keys; 30 is >> any
    # plausible tail while catching correlated (non-independent) draws
    assert len(s1 & s2) < 30
    assert len(s1) == len(s2) == 256


def test_bottomk_plan_is_take_ordered(spark):
    df = spark.range(0, 10_000).select(F.col("id").alias("k"))
    plan = (
        bottomk_build(df, "k", K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # top-k by hash must plan as TakeOrderedAndProject (per-partition
    # local k + driver merge), never a global sort of the distinct set
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# op 117: per-group bottom-k
# ---------------------------------------------------------------------------


def test_bottomk_group_duckdb_parity(spark, duck):
    from dwca_parquet_spark.operators.sketch import (
        bottomk_by_group,
        sql_bottomk_by_group,
    )

    orders = spark.read.parquet(f"{SF_T2}/orders.parquet")
    got = sorted(
        (r["grp"], r["key"], r["_bh"])
        for r in bottomk_by_group(
            orders, "o_orderpriority", "o_custkey", 32, salt="g"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            sql_bottomk_by_group(
                "orders", "o_orderpriority", "o_custkey", 32, salt="g"
            )
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_bottomk_group_merge_law_and_estimates(spark):
    from dwca_parquet_spark.operators.sketch import (
        bottomk_by_group,
        bottomk_group_estimates,
        bottomk_group_merge,
    )

    k = 128
    # three groups with known distinct counts: 40 (under-full), 2000, 8000
    df = spark.range(0, 10_040).select(
        F.when(F.col("id") < 40, F.lit("tiny"))
        .when(F.col("id") < 2_040, F.lit("mid"))
        .otherwise(F.lit("big"))
        .alias("g"),
        F.col("id").alias("u"),
    )
    whole = sorted(
        tuple(r) for r in bottomk_by_group(df, "g", "u", k).collect()
    )
    # merge law: two overlapping halves that COVER df reproduce the whole
    a, b = df.filter("u % 3 != 0"), df.filter("u % 3 != 1 or u % 2 = 0")
    # ensure coverage: every u is in a or b
    assert a.unionByName(b).distinct().count() == df.count()
    merged = sorted(
        tuple(r)
        for r in bottomk_group_merge(
            bottomk_by_group(a, "g", "u", k),
            bottomk_by_group(b, "g", "u", k),
            k,
        ).collect()
    )
    assert merged == whole

    est = {
        r["grp"]: (r["n_sampled"], r["distinct_est"])
        for r in bottomk_group_estimates(
            bottomk_by_group(df, "g", "u", k), k
        ).collect()
    }
    assert est["tiny"] == (40, 40.0)  # under-full → exact
    for g, true_n in (("mid", 2_000), ("big", 8_000)):
        n, e = est[g]
        assert n == k
        assert abs(e - true_n) / true_n < 0.35, (g, e)  # ~4σ at 1/√(k-2)


def test_bottomk_group_plan_single_partitioned_window(spark):
    from dwca_parquet_spark.operators.sketch import bottomk_by_group

    df = spark.range(0, 5_000).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("u")
    )
    plan = (
        bottomk_by_group(df, "g", "u", 16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # group-PARTITIONED window (hashpartitioning on g feeds it) — an
    # unpartitioned window would plan a single-partition sort (the
    # op-101 lesson)
    assert "Window" in plan
    assert "hashpartitioning(g" in plan
    assert plan.count("Exchange") <= 3  # distinct + window partition (+AQE)


def test_bottomk_null_keys_dropped_both_engines(spark, duck):
    """ADVICE r6: NULL keys used to break the sketch three ways — NULL
    _bh ordered first by Spark and last by DuckDB (parity break), and
    the Arrow prune's 'long' schema cannot carry the null. Contract
    now: NULL keys are dropped at the head of build AND the by-group
    variant, mirrored by WHERE key IS NOT NULL in the twins."""
    from dwca_parquet_spark.operators.sketch import (
        bottomk_by_group,
        sql_bottomk_by_group,
    )

    rows = [(i % 5, f"k{i}" if i % 7 else None) for i in range(300)]
    df = spark.createDataFrame(rows, "g long, key string")
    duck.execute("CREATE OR REPLACE TABLE bknull (g BIGINT, key VARCHAR)")
    duck.executemany("INSERT INTO bknull VALUES (?, ?)", rows)

    got = _tuples(bottomk_build(df, "key", 32, salt="n"))
    want = sorted(
        tuple(r)
        for r in duck.execute(
            sql_bottomk_build("bknull", "key", 32, salt="n")
        ).fetchall()
    )
    assert got == want and len(got) == 32
    assert all(k is not None for k, _ in got)

    got_g = sorted(
        (r["grp"], r["key"], r["_bh"])
        for r in bottomk_by_group(df, "g", "key", 8, salt="n").collect()
    )
    want_g = sorted(
        tuple(r)
        for r in duck.execute(
            sql_bottomk_by_group("bknull", "g", "key", 8, salt="n")
        ).fetchall()
    )
    assert got_g == want_g and len(got_g) == 5 * 8
    assert all(k is not None for _, k, _ in got_g)


def test_bottomk_prune_plans_row_identical_and_autoswitch(spark):
    """Round 7: the Arrow prune is size-gated (its fixed crossing cost
    loses below ~256 MB — measured both ways, sketch.py). The prune is
    lossless, so forced-on, forced-off, and auto must return the
    IDENTICAL state; on a small input auto must pick the JVM plan (no
    Python stage in the executed plan)."""
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    auto = _tuples(bottomk_build(docs, "doc_id", 64, salt="p"))
    on = _tuples(bottomk_build(docs, "doc_id", 64, salt="p", prune=True))
    off = _tuples(bottomk_build(docs, "doc_id", 64, salt="p", prune=False))
    assert auto == on == off and len(auto) == 64
    plan = (
        bottomk_build(docs, "doc_id", 64, salt="p")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "mapInPandas" not in plan and "ArrowEval" not in plan
    forced = (
        bottomk_build(docs, "doc_id", 64, salt="p", prune=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" in forced or "MapInPandas" in forced
