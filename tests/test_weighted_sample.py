"""Fixed-size weighted sampling without replacement (SURVEY §2.G
op 162, Efraimidis-Spirakis). The q81/q82 DuckDB twins gate engine
parity at sf0.01 (test_correctness / driver_check); these pin the
operator LAWS:
  * exact inclusion probability at n=1 (P(i) = w_i/Σw — checked as a
    frequency over many salts; deterministic, not flaky: the salt list
    is fixed so the outcome is a constant);
  * nesting: a smaller n picks a prefix of a larger n's sample;
  * salt independence draws different samples, same salt is stable;
  * partition invariance (the op-92 protocol promise);
  * the E-S domain contract: NULL / non-positive weights are excluded;
  * a driver-side Decimal mirror reproduces membership exactly (the
    third-implementation guard the repo uses for every hash protocol).
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from dwca_parquet_spark.functions.hashing import HASH_BASE, HASH_MOD
from dwca_parquet_spark.operators.sampling import (
    SAMPLE_A,
    SAMPLE_B,
    group_weighted_sample_k,
    weighted_sample_k,
)

Q12 = Decimal("0.000000000001")


def _poly_hash_py(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * HASH_BASE + ord(ch)) % HASH_MOD
    return h


def _es_key_py(key: str, w: float, salt: str) -> Decimal:
    mix = (_poly_hash_py(key + salt) * SAMPLE_A + SAMPLE_B) % HASH_MOD
    u = (mix + 1.0) / float(HASH_MOD + 1)
    return Decimal(-math.log(u) / w).quantize(Q12, ROUND_HALF_UP)


def _docs(spark, n=60):
    # weights 1..n — a deterministic spread
    return spark.createDataFrame(
        [(i, float(1 + (i * 7) % 20)) for i in range(n)],
        "id long, w double",
    )


def test_membership_matches_decimal_mirror(spark):
    df = _docs(spark)
    for salt in ("", "a", "b'c"):
        got = sorted(
            r["id"] for r in weighted_sample_k(df, "id", "w", 10, salt).collect()
        )
        keys = sorted(
            (_es_key_py(str(i), float(1 + (i * 7) % 20), salt), i)
            for i in range(60)
        )
        want = sorted(i for _, i in keys[:10])
        assert got == want, salt


def test_inclusion_probability_n1(spark):
    # two rows, weights 9 : 1 — at n=1 the heavy row wins with
    # probability exactly 0.9 over a uniform salt draw; over 300 fixed
    # salts the count is a constant we bound generously
    df = spark.createDataFrame(
        [(1, 9.0), (2, 1.0)], "id long, w double"
    )
    wins = 0
    rows = [(1, 9.0), (2, 1.0)]
    for s in range(300):
        keys = sorted(
            (_es_key_py(str(i), w, f"s{s}"), i) for i, w in rows
        )
        wins += keys[0][1] == 1
    assert 240 <= wins <= 295, wins
    # the Spark side agrees with the mirror on a spot-checked salt
    got = weighted_sample_k(df, "id", "w", 1, "s0").first()["id"]
    keys = sorted((_es_key_py(str(i), w, "s0"), i) for i, w in rows)
    assert got == keys[0][1]


def test_nesting_and_salt_independence(spark):
    df = _docs(spark)
    small = {r["id"] for r in weighted_sample_k(df, "id", "w", 5, "x").collect()}
    big = {r["id"] for r in weighted_sample_k(df, "id", "w", 20, "x").collect()}
    assert small <= big and len(small) == 5 and len(big) == 20
    other = {r["id"] for r in weighted_sample_k(df, "id", "w", 20, "y").collect()}
    assert other != big  # independent draw
    again = {r["id"] for r in weighted_sample_k(df, "id", "w", 20, "x").collect()}
    assert again == big  # same salt → same sample


def test_partition_invariance_and_domain(spark):
    df = _docs(spark)
    base = {r["id"] for r in weighted_sample_k(df, "id", "w", 15, "p").collect()}
    shuffled = {
        r["id"]
        for r in weighted_sample_k(
            df.repartition(7), "id", "w", 15, "p"
        ).collect()
    }
    assert shuffled == base
    # NULL / zero / negative / NaN weights are outside the race; a
    # sub-4.3e-15 weight whose race key overflows DECIMAL(28,12)
    # try_casts to NULL and is excluded rather than crashing the job or
    # (NULLS FIRST) winning the race (ADVICE r11)
    bad = spark.createDataFrame(
        [
            (100, None),
            (101, 0.0),
            (102, -3.0),
            (103, 5.0),
            (104, float("nan")),
            (105, 1e-20),
        ],
        "id long, w double",
    )
    got = {r["id"] for r in weighted_sample_k(bad, "id", "w", 10).collect()}
    assert got == {103}


def test_domain_exclusions_match_duckdb_twin(spark, tmp_path):
    """The hostile-weight rows (NaN, 1e-20 overflow, NULL, ≤0) must be
    excluded by BOTH engines — the Spark operator and its SQL twin run
    on the identical table and must select the same ids."""
    import duckdb

    from dwca_parquet_spark.operators.sampling import sql_weighted_sample_k

    rows = [(i, float(1 + (i * 7) % 20)) for i in range(30)] + [
        (100, None),
        (101, 0.0),
        (102, -3.0),
        (104, float("nan")),
        (105, 1e-20),
    ]
    df = spark.createDataFrame(rows, "id long, w double")
    pq = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(pq)
    got = sorted(
        r["id"] for r in weighted_sample_k(df, "id", "w", 12, "x").collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    want = sorted(
        r[0]
        for r in con.execute(
            "SELECT id FROM (" + sql_weighted_sample_k("t", "id", "w", 12, "x") + ")"
        ).fetchall()
    )
    con.close()
    assert got == want
    assert not set(got) & {100, 101, 102, 104, 105}


def test_group_variant_laws(spark):
    rows = [
        (g, i, float(1 + ((g * 31 + i) * 7) % 20))
        for g in range(3)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "g long, id long, w double")
    out = group_weighted_sample_k(df, "g", "id", "w", 6, "z").collect()
    by_g: dict[int, set[int]] = {}
    for r in out:
        by_g.setdefault(r["g"], set()).add(r["id"])
    assert set(by_g) == {0, 1, 2}
    assert all(len(v) == 6 for v in by_g.values())
    # per-group membership matches the mirror (keys are group-blind:
    # the race key depends only on (id, salt, w))
    for g in range(3):
        keys = sorted(
            (_es_key_py(str(i), w, "z"), i)
            for (gg, i, w) in rows
            if gg == g
        )
        assert by_g[g] == {i for _, i in keys[:6]}, g
