"""CDC merge (SURVEY §2 round-4): DuckDB-differential parity, semantic
asserts per op kind, and the scale-plan pin — with a bucketed target the
merge anti-join shuffles ONLY the change feed."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.cdc import apply_cdc, sql_apply_cdc

TARGET = [
    (1, "alpha", 10.0),
    (2, "beta", 20.0),
    (3, "gamma", 30.0),
    (4, "delta", 40.0),
]
# key 1: update; key 2: delete; key 3: update-then-delete (delete wins by
# seq); key 4: untouched; key 5: insert; key 6: insert-then-update;
# key 7: delete-then-reinsert (insert wins by seq)
CHANGES = [
    (1, "alpha2", 11.0, 100, "U"),
    (2, "beta", 20.0, 101, "D"),
    (3, "gamma2", 31.0, 102, "U"),
    (3, "gamma2", 31.0, 103, "D"),
    (5, "epsilon", 50.0, 104, "I"),
    (6, "zeta", 60.0, 105, "I"),
    (6, "zeta2", 61.0, 106, "U"),
    (7, "eta", 70.0, 107, "D"),
    (7, "eta2", 71.0, 108, "I"),
]

T_SCHEMA = "k long, name string, val double"
C_SCHEMA = "k long, name string, val double, seq long, op string"


def test_apply_cdc_parity_and_semantics(spark):
    target = spark.createDataFrame(TARGET, T_SCHEMA)
    changes = spark.createDataFrame(CHANGES, C_SCHEMA)
    got = {
        r["k"]: (r["name"], r["val"])
        for r in apply_cdc(target, changes, ["k"]).collect()
    }

    con = duckdb.connect()
    con.execute(f"CREATE TABLE t ({T_SCHEMA.replace(' long', ' BIGINT')})")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", TARGET)
    con.execute(f"CREATE TABLE c ({C_SCHEMA.replace(' long', ' BIGINT')})")
    con.executemany("INSERT INTO c VALUES (?, ?, ?, ?, ?)", CHANGES)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            sql_apply_cdc("t", "c", ["k"], ["name", "val"])
        ).fetchall()
    }
    assert got == want

    assert got[1] == ("alpha2", 11.0)      # update applied
    assert 2 not in got and 3 not in got   # deletes (incl. update-then-delete)
    assert got[4] == ("delta", 40.0)       # untouched passthrough
    assert got[5] == ("epsilon", 50.0)     # insert
    assert got[6] == ("zeta2", 61.0)       # insert-then-update
    assert got[7] == ("eta2", 71.0)        # delete-then-reinsert
    assert len(got) == 5   # {1,4} survive from target, {5,6,7} inserted


def test_apply_cdc_idempotent(spark):
    """Replaying the same feed over the merged result is a no-op."""
    target = spark.createDataFrame(TARGET, T_SCHEMA)
    changes = spark.createDataFrame(CHANGES, C_SCHEMA)
    once = apply_cdc(target, changes, ["k"])
    twice = apply_cdc(once, changes, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_bucketed_merge_is_exchange_free(spark, tmp_path):
    """The 100 TB pattern: target stored bucketed on the merge key, the
    (batch-sized) feed staged bucketed on the same key → the ENTIRE merge
    plan — winners window, key distinct, anti-join, union — runs with
    ZERO Exchange."""
    from dwca_parquet_spark.sinks.parquet import write_bucketed

    target = spark.range(10_000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("val"),
    )
    changes = spark.createDataFrame(CHANGES, C_SCHEMA)
    write_bucketed(target, "cdc_target_b", ["k"], 8,
                   path=str(tmp_path / "cdc_target"))
    write_bucketed(changes, "cdc_feed_b", ["k"], 8,
                   path=str(tmp_path / "cdc_feed"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        merged = apply_cdc(
            spark.table("cdc_target_b"), spark.table("cdc_feed_b"), ["k"]
        )
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the merge result is still correct
        got = {r["k"]: r["name"] for r in merged.collect()}
        assert got[1] == "alpha2" and 2 not in got and got[5] == "epsilon"
        assert len(got) == 9_998  # 10k target keys minus deletes {2, 3}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS cdc_target_b")
        spark.sql("DROP TABLE IF EXISTS cdc_feed_b")


def test_diff_snapshots_round_trip(spark, duck=None):
    """diff then apply reproduces the new snapshot exactly; the feed only
    carries changed keys; ops classify correctly (incl. null transitions)."""
    from dwca_parquet_spark.operators.cdc import diff_snapshots

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        T_SCHEMA,
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),        # unchanged → no feed row
         (2, "b2", 2.0),       # changed value → U
         (3, "c", 3.0),        # null → value transition → U
         (5, "e", 5.0)],       # new key → I; key 4 gone → D
        T_SCHEMA,
    )
    feed = diff_snapshots(old, new, ["k"])
    ops = {r["k"]: r["op"] for r in feed.collect()}
    assert ops == {2: "U", 3: "U", 4: "D", 5: "I"}

    applied = apply_cdc(old, feed, ["k"])
    got = sorted(map(tuple, applied.collect()))
    want = sorted(map(tuple, new.collect()))
    assert got == want

    # self-diff is empty
    assert diff_snapshots(new, new, ["k"]).count() == 0
