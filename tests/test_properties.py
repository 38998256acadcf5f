"""Property-based tests (SURVEY §5.5): hypothesis-generated inputs against
engine invariants — CSV round-trips, join cardinality laws, dedup
idempotence, top-k consistency, as-of join vs a naive reference, and the
planted-duplicate guarantee of MinHash LSH.

Each example runs real Spark jobs, so example counts stay small and inputs
tiny; the value is the input-space coverage, not volume.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.dedup import minhash_dup_pairs
from dwca_parquet_spark.operators.events import asof_join
from dwca_parquet_spark.operators.relational import dedup_latest, topk
from dwca_parquet_spark.sinks.csv import read_csv, write_csv

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# printable ASCII incl. quotes/commas/semicolons; no \r\n (multiLine CSV is
# deliberately out of the sink's contract)
CSV_TEXT = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=40,
)


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(-(2**31), 2**31), st.one_of(st.none(), CSV_TEXT)),
        min_size=1,
        max_size=30,
    )
)
def test_csv_roundtrip(spark, tmp_path_factory, rows):
    """write_csv → read_csv is lossless for ints, NULLs, and quoted text."""
    df = spark.createDataFrame(rows, "id long, txt string")
    out = tmp_path_factory.mktemp("csv") / "t.csv"
    write_csv(df, out, single_file=True)
    back = read_csv(spark, out, "id long, txt string")
    # the sink writes nullValue=\N and emptyValue="" — empty string survives
    assert Counter(map(tuple, back.collect())) == Counter(rows)


@SETTINGS
@given(
    lkeys=st.lists(st.integers(0, 5), min_size=0, max_size=20),
    rkeys=st.lists(st.integers(0, 5), min_size=0, max_size=20),
)
def test_join_cardinality_laws(spark, lkeys, rkeys):
    """Exact cardinalities of inner/semi/anti/left joins from key counts."""
    left = spark.createDataFrame([(k,) for k in lkeys], "k long")
    right = spark.createDataFrame([(k,) for k in rkeys], "k long")
    lc, rc = Counter(lkeys), Counter(rkeys)
    inner = left.join(right, "k").count()
    semi = left.join(right, "k", "left_semi").count()
    anti = left.join(right, "k", "left_anti").count()
    louter = left.join(right, "k", "left").count()
    assert inner == sum(lc[k] * rc[k] for k in lc)
    assert semi == sum(c for k, c in lc.items() if k in rc)
    assert anti == sum(c for k, c in lc.items() if k not in rc)
    assert louter == inner + anti
    assert semi + anti == len(lkeys)


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 100), st.integers(0, 10**6)),
        min_size=1,
        max_size=40,
    )
)
def test_dedup_latest_idempotent(spark, rows):
    """dedup(dedup(x)) == dedup(x), and the survivor is the max-order row."""
    df = spark.createDataFrame(rows, "k long, ord long, uid long")
    order = [F.col("ord").desc(), F.col("uid").desc()]
    once = dedup_latest(df, ["k"], order)
    twice = dedup_latest(once, ["k"], order)
    got = sorted(map(tuple, once.collect()))
    assert got == sorted(map(tuple, twice.collect()))
    best = {}
    for k, o, u in rows:
        if k not in best or (o, u) > (best[k][1], best[k][2]):
            best[k] = (k, o, u)
    assert got == sorted(best.values())


@SETTINGS
@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=50),
    k=st.integers(1, 10),
)
def test_topk_matches_sorted_head(spark, vals, k):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "uid long, v long")
    got = [
        (r["uid"], r["v"])
        for r in topk(df, [F.col("v").desc(), F.col("uid").asc()], k).collect()
    ]
    expect = sorted(rows, key=lambda r: (-r[1], r[0]))[:k]
    assert got == expect


@SETTINGS
@given(
    lrows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=20
    ),
    rrows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 9)),
        min_size=0,
        max_size=20,
    ),
)
def test_asof_join_matches_naive(spark, lrows, rrows):
    """asof_join == per-row 'latest right at or before' reference.

    Right rows are deduped to one per (key, ts) first — duplicate right
    timestamps are the documented ambiguous case (same as DuckDB ASOF).
    """
    rdedup = {}
    for k, ts, v in rrows:
        if (k, ts) not in rdedup or v > rdedup[(k, ts)]:
            rdedup[(k, ts)] = v
    rlist = [(k, ts, v) for (k, ts), v in rdedup.items()]
    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(lrows)], "uid long, k long, ts long"
    )
    right = spark.createDataFrame(rlist, "k long, ts long, v long")
    out = {
        r["uid"]: (r["r_ts"], r["r_v"])
        for r in asof_join(left, right, "k", "ts", ["ts", "v"])
        .selectExpr("uid", "r_ts", "r_v")
        .collect()
    }
    for i, (k, ts) in enumerate(lrows):
        cands = [(rts, v) for (rk, rts, v) in rlist if rk == k and rts <= ts]
        expect = max(cands) if cands else (None, None)
        assert out[i] == expect, (i, k, ts)


@pytest.mark.parametrize("n_dups", [3])
def test_minhash_planted_exact_dups(spark, n_dups):
    """Planted exact duplicates ALWAYS surface: identical texts share every
    band bucket, so LSH candidate generation cannot miss them and the
    verify stage scores jaccard 1.0."""
    base = [
        "the quick brown fox jumps over the lazy dog number %d unique" % i
        for i in range(20)
    ]
    rows = [(i, t) for i, t in enumerate(base)]
    # duplicate the first n_dups docs under new ids
    rows += [(100 + i, base[i]) for i in range(n_dups)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_dup_pairs(df, "doc_id", "text").collect()
    }
    for i in range(n_dups):
        assert pairs.get((i, 100 + i)) == 1.0
