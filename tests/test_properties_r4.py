"""Property-based tests for the round-4 incremental family: CDC
diff/apply laws, rollup fold-invariance, and the Bloom exactness theorem
— hypothesis-generated inputs against the invariants the pipeline relies
on. Tiny inputs, real Spark jobs (the test_properties.py discipline)."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from dwca_parquet_spark.functions import hashing as H
from dwca_parquet_spark.operators.bloom import dedup_incremental
from dwca_parquet_spark.operators.cdc import apply_cdc, diff_snapshots
from dwca_parquet_spark.operators.rollup import (
    rollup_merge,
    rollup_partial,
    rollup_read,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

TXT = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=24,
)
ROW = st.tuples(st.integers(0, 40), TXT, st.floats(0, 1000, allow_nan=False))


def _table(spark, rows):
    # last write per key wins so the snapshot is a function of the key
    uniq = {}
    for k, name, val in rows:
        uniq[k] = (k, name, round(val, 2))
    return spark.createDataFrame(
        list(uniq.values()) or [(0, "", 0.0)], "k long, name string, val double"
    )


@SETTINGS
@given(old_rows=st.lists(ROW, max_size=25), new_rows=st.lists(ROW, max_size=25))
def test_diff_apply_reproduces_any_snapshot(spark, old_rows, new_rows):
    """apply_cdc(old, diff(old, new)) == new — for ARBITRARY snapshots."""
    old = _table(spark, old_rows)
    new = _table(spark, new_rows)
    applied = apply_cdc(old, diff_snapshots(old, new, ["k"]), ["k"])
    assert sorted(map(tuple, applied.collect())) == sorted(
        map(tuple, new.collect())
    )


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.floats(-100, 100, allow_nan=False)),
        min_size=1,
        max_size=40,
    ),
    split=st.integers(1, 6),
)
def test_rollup_fold_invariance(spark, rows, split):
    """ANY batch partition folds to the identical state (exact decimal
    sums make this bit-for-bit, not approximately)."""
    rows = [(k, round(v, 2)) for k, v in rows]
    df = spark.createDataFrame(rows, "k long, v double")
    whole = rollup_partial(df, ["k"], ["v"])
    parts = [rows[i::split] for i in range(split)]  # uneven, may be empty
    state = None
    for chunk in parts:
        if not chunk:
            continue
        p = rollup_partial(
            spark.createDataFrame(chunk, "k long, v double"), ["k"], ["v"]
        )
        state = p if state is None else rollup_merge(state, p, ["k"], ["v"])
    got = sorted(map(tuple, rollup_read(state, ["v"]).collect()))
    want = sorted(map(tuple, rollup_read(whole, ["v"]).collect()))
    assert got == want


@SETTINGS
@given(
    hist=st.lists(TXT, max_size=30),
    batch=st.lists(TXT, max_size=30),
)
def test_bloom_incremental_exactness(spark, hist, batch):
    """dedup_incremental == plain anti-join for arbitrary text corpora
    (empty strings, punctuation, whitespace collisions included)."""
    h = spark.createDataFrame(
        [(i, t) for i, t in enumerate(hist)] or [(0, "seed")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(batch)] or [(1000, "x")],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"]
        for r in dedup_incremental(b, h, "doc_id", "text", fpp=0.05).collect()
    )

    def keyed(df):
        return df.select(
            "doc_id", H.poly_hash(H.normalize_text(F.col("text"))).alias("_c")
        )

    want = sorted(
        r["doc_id"]
        for r in keyed(b)
        .join(keyed(h).select("_c").distinct(), "_c", "left_anti")
        .collect()
    )
    assert got == want


@SETTINGS
@given(
    weights=st.lists(st.integers(1, 60), min_size=1, max_size=12),
    k=st.integers(4, 16),
    n_noise=st.integers(0, 300),
)
def test_heavy_hitters_guarantee_holds(spark, weights, k, n_noise):
    """Misra-Gries + exact verify: on ANY stream (planted hot items over
    unique-noise floors), every item above n/k is surfaced with its exact
    count."""
    from dwca_parquet_spark.operators.sketch import heavy_hitters

    rows = [(f"hot{i}",) for i, w in enumerate(weights) for _ in range(w)]
    rows += [(f"noise{j}",) for j in range(n_noise)]
    df = spark.createDataFrame(rows, "tok string").repartition(5)
    got = {r["item"]: r["cnt"] for r in heavy_hitters(df, "tok", k).collect()}

    n_total = len(rows)
    exact: dict[str, int] = {}
    for (t,) in rows:
        exact[t] = exact.get(t, 0) + 1
    for item, cnt in got.items():
        assert cnt == exact[item]
    must = {t for t, c in exact.items() if c > n_total / k}
    assert must <= set(got)
