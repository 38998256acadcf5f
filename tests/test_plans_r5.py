"""Physical-plan pins for the round-5 operator families (the
test_plans_r4.py discipline): the zero-shuffle operators must show no
Exchange, nothing may fall back to row-at-a-time Python, and the
stated shuffle counts of the heavier operators are pinned so plan
regressions surface as test failures, not bench drift."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_T2


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_T2}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_T2}/embeddings.parquet")


def test_zero_shuffle_projections(spark, docs):
    """c4_clean, canonical_url, html extraction, SQ8 encode/decode: pure
    scan-stage projections — no Exchange, no Python anywhere."""
    from dwca_parquet_spark.operators.html import html_extract_text
    from dwca_parquet_spark.operators.text import c4_clean, canonicalize_urls

    wrapped = docs.withColumn(
        "html", F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>"))
    ).withColumn("url", F.concat(F.lit("http://x.com/"), F.col("doc_id")))
    for out in [
        c4_clean(docs, "doc_id", "text"),
        canonicalize_urls(wrapped, "url"),
        html_extract_text(wrapped, "doc_id", "html"),
    ]:
        plan = _plan(out)
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_sq8_encode_zero_shuffle(spark, emb):
    from dwca_parquet_spark.operators.sq import sq8_encode, sq8_fit

    model = sq8_fit(emb, "embedding", 64)
    plan = _plan(sq8_encode(emb, "vec_id", "embedding", model))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_group_sample_k_single_exchange(spark, docs):
    """One shuffle: the window's hash partitioning on the group key."""
    from dwca_parquet_spark.operators.sampling import group_sample_k

    grouped = docs.withColumn("grp", F.col("doc_id") % 7)
    plan = _plan(group_sample_k(grouped, "grp", "doc_id", 5))
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan


def test_global_shuffle_single_range_exchange(spark, docs):
    """One range exchange (the total-order sort) and the staged hash is
    evaluated once — the poly-hash fold appears once in the plan."""
    from dwca_parquet_spark.operators.sampling import global_shuffle

    plan = _plan(global_shuffle(docs, "doc_id", seed="s", n_shards=4))
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" in plan.lower()
    assert plan.count("aggregate(") == 1  # the staged _gh fold, once


def test_semantic_dedup_pair_stage_shape(spark, emb):
    """The pair stage is one groupBy(cell) applyInPandas — Arrow allowed
    there (per-group matmul is the design), never BatchEvalPython."""
    from dwca_parquet_spark.operators.semdedup import semantic_dedup

    plan = _plan(
        semantic_dedup(emb, "vec_id", "embedding", k_cells=4, iters=1)
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_bpe_word_count_is_combinable(spark, docs):
    """The corpus-scale stage: partial aggregation before the single
    exchange (map-side combine on the word count)."""
    from dwca_parquet_spark.operators.bpe import word_counts

    plan = _plan(word_counts(docs, "text"))
    assert plan.count("Exchange") == 1
    # partial_count before the exchange = map-side combine
    assert "partial_count" in plan


def test_gopher_quality_zero_shuffle(spark, docs):
    """Every doc-level Gopher signal is a scan-stage array expression —
    no Exchange, no Python."""
    from dwca_parquet_spark.operators.text import gopher_quality

    plan = _plan(gopher_quality(docs, "doc_id", "text"))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_gopher_ngram_stats_two_shuffles(spark, docs):
    """Exactly the two stated map-side-combinable shuffles — (id,n,gram)
    count then (id,n) fold — one scan for all n, no Python."""
    from dwca_parquet_spark.operators.text import gopher_ngram_stats

    out = gopher_ngram_stats(docs, "doc_id", "text", ns=(2, 3, 5))
    plan = _plan(out)
    assert plan.count("Exchange") == 2
    assert "BatchEvalPython" not in plan
    assert plan.count("FileScan") == 1


def test_dedup_paragraphs_plan_shape(spark, docs):
    """min-agg first-occurrence + semi-join + per-doc fold: combinable
    shuffles only, no Cartesian, no Python, no row-number window over
    the full corpus."""
    from dwca_parquet_spark.operators.dedup import dedup_paragraphs

    plan = _plan(dedup_paragraphs(docs, "doc_id", "text"))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "Window" not in plan  # first-occurrence is a min-agg, not a window


def test_select_to_token_budget_plan_shape(spark, docs):
    """Two-level prefix sum: the corpus window is partitioned by the
    score bucket (parallel reducers); the ONLY SinglePartition exchange
    is the n_buckets-row offset table, which comes back as a broadcast
    join. No Python, no Cartesian, no global sort of the data."""
    from dwca_parquet_spark.operators.sampling import select_to_token_budget

    scored = docs.select(
        "doc_id",
        (F.length("text") % 97 / 97.0).alias("score"),
        F.length("text").cast("long").alias("n_tokens"),
    )
    plan = _plan(
        select_to_token_budget(scored, "doc_id", "score", "n_tokens", 10_000)
    )
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange SinglePartition") == 1  # offsets only
    assert "windowspecdefinition(_bucket" in plan  # data window bucketed
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_realize_mixture_reads_cached_projection(spark, docs):
    """Every source branch must read the persisted narrow projection —
    the upstream plan executes once, not once per source."""
    from dwca_parquet_spark.cache import release_caches
    from dwca_parquet_spark.operators.sampling import realize_mixture

    scored = docs.select(
        "doc_id", "source",
        (F.length("text") % 97 / 97.0).alias("score"),
        F.length("text").cast("long").alias("n_tokens"),
    )
    out = realize_mixture(
        scored, "doc_id", "source", "score", "n_tokens", 20_000,
        {"src1": 1.0, "src2": 2.0}, n_buckets=4,
    )
    plan = _plan(out)
    try:
        assert "InMemoryTableScan" in plan
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan
    finally:
        release_caches()


def test_bq_encode_zero_shuffle_and_mih_shape(spark, emb):
    """1-bit encode is a scan-stage projection; the multi-index search
    is an equi-join on chunk keys — no Cartesian, no Python."""
    from dwca_parquet_spark.operators.sq import (
        bq_encode,
        bq_fit,
        bq_hamming_neighbors_mih,
    )

    model = bq_fit(emb, "embedding", 64)
    plan = _plan(bq_encode(emb, "vec_id", "embedding", model))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    plan2 = _plan(
        bq_hamming_neighbors_mih(emb, "vec_id", "embedding", 3, model=model)
    )
    assert "CartesianProduct" not in plan2
    assert "BatchEvalPython" not in plan2


def test_edit_distance_pairs_plan_shape(spark):
    """PassJoin candidates come from an equi-join on (segment, value);
    the only non-equi join is the broadcast short-string bucket — no
    CartesianProduct anywhere, no Python."""
    from dwca_parquet_spark.operators.linkage import edit_distance_pairs

    df = spark.createDataFrame(
        [(i, f"name{i}") for i in range(50)], "id long, s string"
    )
    plan = _plan(edit_distance_pairs(df, "id", "s", 2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the documented short bucket
    assert "BatchEvalPython" not in plan


def test_dsir_score_zero_shuffle(spark, docs):
    """DSIR scoring is a scan-stage literal-array fold — no Exchange,
    no Python (the lm/nb plan contract)."""
    from dwca_parquet_spark.operators.text import dsir_logratio

    tl = [round(-6.0 + i * 0.001, 9) for i in range(256)]
    rl = [round(-6.5 + i * 0.001, 9) for i in range(256)]
    plan = _plan(dsir_logratio(docs, "doc_id", "text", tl, rl))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
