"""Gates for per-group heavy hitters (SURVEY §2 op 126): the per-group
MG guarantee on planted skew, exact counts ≡ DuckDB per-(group,item)
counts, the NULL universe contract, and partition robustness."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.sketch import heavy_hitters_by_group
from tests.conftest import SF_T2

K = 16


def _rows():
    """3 groups with distinct-rich tails + planted per-group heavies.
    Tail items are unique per row so MG pressure is maximal."""
    rows = []
    uid = 0
    for g, (heavy, reps) in enumerate(
        [("alpha", 400), ("beta", 250), ("gamma", 120)]
    ):
        grp = f"g{g}"
        rows += [(grp, heavy)] * reps
        rows += [(grp, f"mid{g}_{j % 5}") for j in range(100)]  # 20 each
        for _ in range(300):  # unique-tail noise
            rows.append((grp, f"tail{uid}"))
            uid += 1
    return rows


def test_guarantee_and_exact_counts(spark, duck):
    rows = _rows()
    df = spark.createDataFrame(rows, "grp string, item string").repartition(13)
    got = {
        (r["group"], r["item"]): r["cnt"]
        for r in heavy_hitters_by_group(df, "grp", "item", K).collect()
    }
    # truth from plain python
    from collections import Counter

    per_group: dict[str, Counter] = {}
    for g, it in rows:
        per_group.setdefault(g, Counter())[it] += 1
    # guarantee: every item with count > n_g/(K+1) surfaces
    for g, c in per_group.items():
        n_g = sum(c.values())
        for item, cnt in c.items():
            if cnt > n_g / (K + 1):
                assert (g, item) in got, (g, item, cnt, n_g)
    # exactness: every reported count is the true count
    for (g, item), cnt in got.items():
        assert cnt == per_group[g][item]


def test_counts_match_duckdb_on_real_corpus(spark, duck):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    got = {
        (r["group"], r["item"]): r["cnt"]
        for r in heavy_hitters_by_group(docs, "source", "lang", 8).collect()
    }
    want = dict(
        ((g, it), c)
        for g, it, c in duck.execute(
            "SELECT CAST(source AS VARCHAR), CAST(lang AS VARCHAR), count(*) "
            "FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL "
            "GROUP BY 1, 2"
        ).fetchall()
    )
    assert got  # the corpus has (source, lang) structure to find
    for key, cnt in got.items():
        assert want[key] == cnt
    # low cardinality here → MG never trims → output is the full truth
    assert got == want


def test_null_groups_and_items_excluded(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), (None, "x"), ("a", None), ("b", "y")],
        "grp string, item string",
    )
    got = sorted(
        (r["group"], r["item"], r["cnt"])
        for r in heavy_hitters_by_group(df, "grp", "item", 4).collect()
    )
    assert got == [("a", "x", 2), ("b", "y", 1)]


def test_partitioning_never_breaks_guarantee(spark):
    rows = _rows()
    from collections import Counter

    per_group: dict[str, Counter] = {}
    for g, it in rows:
        per_group.setdefault(g, Counter())[it] += 1
    for parts in (1, 7, 32):
        df = spark.createDataFrame(
            rows, "grp string, item string"
        ).repartition(parts)
        got = {
            (r["group"], r["item"])
            for r in heavy_hitters_by_group(df, "grp", "item", K).collect()
        }
        for g, c in per_group.items():
            n_g = sum(c.values())
            for item, cnt in c.items():
                if cnt > n_g / (K + 1):
                    assert (g, item) in got
