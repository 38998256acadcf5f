"""Count-min sketch (SURVEY §2 round-4): cell-for-cell DuckDB parity of
the sketch build, the one-sided error guarantee against exact counts,
merge associativity (shard-parallel == whole-corpus), and the bounded
output size."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
    sql_cms_build,
)
from dwca_parquet_spark.operators.text import tokens
from tests.conftest import SF_T2

W, D = 4096, 4


def _token_stream(spark):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    return docs.select(F.explode(tokens(F.col("text"))).alias("tok"))


def test_sketch_parity_duckdb(spark, duck):
    toks = _token_stream(spark)
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_build(toks, "tok", W, D).collect()
    }
    norm = "trim(regexp_replace(regexp_replace(lower(text), '[^\\x20-\\x7e]', '', 'g'), '\\s+', ' ', 'g'))"
    duck_toks = (
        f"(SELECT unnest(string_split_regex({norm}, '\\s+')) AS tok "
        f"FROM documents WHERE length({norm}) > 0)"
    )
    want = {
        (r[0], r[1]): r[2]
        for r in duck.execute(sql_cms_build("tok", duck_toks, W, D)).fetchall()
    }
    assert got == want
    assert len(got) <= W * D  # bounded whatever the corpus size


def test_estimates_one_sided_and_tight(spark):
    toks = _token_stream(spark)
    sketch = cms_build(toks, "tok", W, D)
    exact = {
        r["tok"]: r["n"]
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(exact.values())
    probe_items = sorted(exact, key=exact.get, reverse=True)[:20] + ["zzzneverseen"]
    est = {
        r["item"]: r["est"]
        for r in cms_estimate(spark, sketch, probe_items, W, D).collect()
    }
    for it in probe_items[:-1]:
        assert est[it] >= exact[it]                      # never undercount
        assert est[it] <= exact[it] + 2 * n_total / W * 4  # loose CM bound
    assert est["zzzneverseen"] <= 2 * n_total / W * 4


def test_merge_equals_whole(spark):
    """sketch(A) ⊕ sketch(B) == sketch(A ∪ B) — the shard-parallel claim."""
    toks = _token_stream(spark).withColumn(
        "half", (F.length("tok") % 2 == 0).cast("int")
    )
    a = cms_build(toks.filter(F.col("half") == 0), "tok", W, D)
    b = cms_build(toks.filter(F.col("half") == 1), "tok", W, D)
    merged = {
        (r["row"], r["col"]): r["cnt"] for r in cms_merge(a, b).collect()
    }
    whole = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_build(toks, "tok", W, D).collect()
    }
    assert merged == whole


def test_hll_register_parity_and_estimate(spark, duck):
    from dwca_parquet_spark.operators.sketch import (
        hll_build,
        hll_estimate,
        hll_merge,
        sql_hll_build,
    )

    toks = _token_stream(spark)
    regs = hll_build(toks, "tok")
    got = {(r["bucket"], r["register"]) for r in regs.collect()}
    norm = "trim(regexp_replace(regexp_replace(lower(text), '[^\\x20-\\x7e]', '', 'g'), '\\s+', ' ', 'g'))"
    duck_toks = (
        f"(SELECT unnest(string_split_regex({norm}, '\\s+')) AS tok "
        f"FROM documents WHERE length({norm}) > 0)"
    )
    want = set(duck.execute(sql_hll_build("tok", duck_toks)).fetchall())
    assert got == want

    exact = toks.select("tok").distinct().count()
    est = hll_estimate(regs)
    assert abs(est - exact) / exact < 0.05, (est, exact)

    # shard merge == whole build (registers identical, not just estimate)
    a = hll_build(toks.filter(F.length("tok") % 2 == 0), "tok")
    b = hll_build(toks.filter(F.length("tok") % 2 == 1), "tok")
    merged = {(r["bucket"], r["register"]) for r in hll_merge(a, b).collect()}
    assert merged == got


def test_heavy_hitters_guarantee_and_exactness(spark):
    from dwca_parquet_spark.operators.sketch import heavy_hitters

    toks = _token_stream(spark)
    n_total = toks.count()
    k = 32
    got = {r["item"]: r["cnt"] for r in heavy_hitters(toks, "tok", k).collect()}

    exact = {
        r["tok"]: r["n"]
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # every surfaced count is EXACT
    for item, cnt in got.items():
        assert cnt == exact[item]
    # the MG guarantee: all items with true count > n/k are present
    threshold = n_total / k
    must_have = {t for t, n in exact.items() if n > threshold}
    assert must_have <= set(got)
    assert len(must_have) > 0  # the fixture's stopword-ish tokens qualify
    # candidate set stays bounded (partitions × k is the hard cap)
    n_parts = toks.rdd.getNumPartitions()
    assert len(got) <= n_parts * k
