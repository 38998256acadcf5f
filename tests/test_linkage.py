"""Record linkage (SURVEY §2 ops 110-111): the PassJoin segment join
must find EXACTLY the brute-force cross join's pairs — completeness is
the whole claim — and entity clusters must match a reference union-find
over those pairs."""

from __future__ import annotations

import random

import duckdb
import pytest

from dwca_parquet_spark.operators.linkage import (
    edit_distance_pairs,
    link_records,
)

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _mutate(rng, s: str, n_ops: int) -> str:
    for _ in range(n_ops):
        op = rng.choice(["sub", "ins", "del"])
        if op == "del" and len(s) > 1:
            i = rng.randrange(len(s))
            s = s[:i] + s[i + 1:]
        elif op == "ins":
            i = rng.randrange(len(s) + 1)
            s = s[:i] + rng.choice(ALPHA) + s[i:]
        elif len(s) > 0:
            i = rng.randrange(len(s))
            s = s[:i] + rng.choice(ALPHA) + s[i + 1:]
    return s


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(11)
    base = [
        "".join(rng.choice(ALPHA) for _ in range(rng.randrange(5, 18)))
        for _ in range(60)
    ]
    rows = []
    rid = 0
    for s in base:
        rows.append((rid, s)); rid += 1
        for _ in range(rng.randrange(0, 3)):  # typo'd variants
            rows.append((rid, _mutate(rng, s, rng.randrange(1, 4)))); rid += 1
    # short-string edge cases (the pigeonhole-lapse bucket)
    for s in ["", "a", "ab", "ba", "abc", "xy", "x"]:
        rows.append((rid, s)); rid += 1
    return rows


def _brute(rows, d):
    con = duckdb.connect()
    con.execute("CREATE TABLE r (id BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO r VALUES (?, ?)", rows)
    return {
        (a, b, dist)
        for a, b, dist in con.execute(
            "SELECT x.id, y.id, levenshtein(x.s, y.s) FROM r x, r y "
            f"WHERE x.id < y.id AND levenshtein(x.s, y.s) <= {d}"
        ).fetchall()
    }


@pytest.mark.parametrize("d", [1, 2, 3])
def test_edit_distance_pairs_complete(spark, corpus, d):
    df = spark.createDataFrame(corpus, "id long, s string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(df, "id", "s", d).collect()
    }
    assert got == _brute(corpus, d)


def test_link_records_clusters(spark, corpus):
    d = 2
    df = spark.createDataFrame(corpus, "id long, s string")
    got = {r["id"]: r["entity_id"]
           for r in link_records(df, "id", "s", d).collect()}
    assert set(got) == {i for i, _ in corpus}

    # reference union-find over the brute-force pairs
    parent = {i: i for i, _ in corpus}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in _brute(corpus, d):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i, _ in corpus}
    assert got == want
    # sanity: at least one non-trivial cluster exists in the fixture
    assert any(v != k for k, v in want.items())


def test_edit_distance_short_bucket_guard(spark):
    """Round-6 ADVICE regression: for short-key corpora the len <= 2d
    fallback bucket IS the table — an unguarded O(n²) broadcast BNLJ.
    The guard must refuse past short_bucket_limit with the count, and a
    knowing override must still produce the exact result."""
    import pytest
    from dwca_parquet_spark.operators.linkage import edit_distance_pairs

    codes = [(i, f"{i % 7}{(i * 3) % 10}{i % 5}") for i in range(200)]
    df = spark.createDataFrame(codes, "id long, s string")

    with pytest.raises(ValueError, match="short-string bucket"):
        edit_distance_pairs(df, "id", "s", d=3, short_bucket_limit=50)

    # explicit override: exact vs brute force on the tiny corpus
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(
            df, "id", "s", d=1, short_bucket_limit=10_000
        ).collect()
    }

    def lev(a, b):
        import functools

        @functools.lru_cache(maxsize=None)
        def rec(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            return min(
                rec(i - 1, j) + 1,
                rec(i, j - 1) + 1,
                rec(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
            )

        return rec(len(a), len(b))

    want = set()
    for i, (ia, sa) in enumerate(codes):
        for ib, sb in codes[i + 1:]:
            dd = lev(sa, sb)
            if dd <= 1:
                want.add((ia, ib, dd))
    assert got == want
