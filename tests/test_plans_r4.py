"""Consolidated physical-plan audit for the round-4 operator families —
the pytest companion to tools/plan_audit.py's 50-query sweep: no
row-at-a-time Python (BatchEvalPython) and no CartesianProduct anywhere
in the representative plans; mapInPandas/Arrow paths and broadcast joins
are the only non-codegen constructs allowed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_T2


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_T2}/documents.parquet")


def _assert_clean(plan: str, allow_arrow: bool = False):
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    if not allow_arrow:
        assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_round4_plans_are_clean(spark, docs, tmp_path):
    from dwca_parquet_spark.operators.bloom import (
        bloom_build,
        bloom_params,
        bloom_probe,
    )
    from dwca_parquet_spark.operators.cdc import apply_cdc, diff_snapshots
    from dwca_parquet_spark.operators.dedup import duplicated_spans
    from dwca_parquet_spark.operators.profile import (
        check_expectations,
        profile_table,
    )
    from dwca_parquet_spark.operators.rollup import (
        log_hist_partial,
        rollup_merge,
        rollup_partial,
    )
    from dwca_parquet_spark.operators.sampling import weighted_sample
    from dwca_parquet_spark.operators.sketch import cms_build, hll_build
    from dwca_parquet_spark.operators.text import tokens

    m, k = bloom_params(1000, 0.01)
    keys = spark.range(1000).select((F.col("id") * 3 + 1).alias("h"))
    bitmap = bloom_build(keys, "h", m, k)
    _assert_clean(_plan(bitmap))
    _assert_clean(_plan(bloom_probe(keys, "h", bitmap, m, k)))

    old = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    new = spark.range(50, 150).select(
        F.col("id").alias("k"), (F.col("id") * 3.0).alias("v")
    )
    feed = diff_snapshots(old, new, ["k"])
    _assert_clean(_plan(feed))
    _assert_clean(_plan(apply_cdc(old, feed, ["k"])))

    _assert_clean(_plan(duplicated_spans(docs, "doc_id", "text", w=6)))
    _assert_clean(_plan(profile_table(docs, ["doc_id", "source"], approx=True)))
    _assert_clean(
        _plan(check_expectations(docs, [{"kind": "not_null", "column": "doc_id"}]))
    )
    st = rollup_partial(old, ["k"], ["v"])
    _assert_clean(_plan(rollup_merge(st, rollup_partial(new, ["k"], ["v"]), ["k"], ["v"])))
    _assert_clean(_plan(log_hist_partial(docs, "n_chars")))
    _assert_clean(
        _plan(weighted_sample(docs.withColumn("w", F.lit(0.5)), "doc_id", "w"))
    )
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    _assert_clean(_plan(cms_build(toks, "tok", 1024, 3)))
    _assert_clean(_plan(hll_build(toks, "tok")))


def test_round4_arrow_paths_are_arrow_not_rowpython(spark, docs):
    """PQ encode and sequence packing use Arrow batch paths — assert the
    fast path, not BatchEvalPython."""
    from dwca_parquet_spark.operators.packing import pack_sequences
    from dwca_parquet_spark.operators.pq import pq_encode, pq_fit

    emb = spark.read.parquet(f"{SF_T2}/embeddings.parquet")
    cb = pq_fit(emb, "vec_id", "embedding", 64, 8, 16, iters=1)
    enc_plan = _plan(pq_encode(emb, "vec_id", "embedding", cb))
    assert "BatchEvalPython" not in enc_plan
    assert "CartesianProduct" not in enc_plan

    packed_plan = _plan(pack_sequences(docs, "doc_id", "text", 64))
    assert "BatchEvalPython" not in packed_plan
    assert "FlatMapGroupsInPandas" in packed_plan or "MapInPandas" in packed_plan
