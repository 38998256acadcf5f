"""Gates for the inverted index + indexed BM25 (SURVEY §2 op 127): the
EXACT parity law vs op 123 across query shapes, the pushed-filter plan
pin on the postings scan, meta fidelity, and overwrite semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.invindex import (
    bm25_index_build,
    bm25_topk_indexed,
)
from dwca_parquet_spark.operators.text import bm25_topk
from tests.conftest import SF_T2


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bm25idx") / "idx")
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    meta = bm25_index_build(docs, "doc_id", "text", path)
    return path, meta


def _rows(df):
    return [(r["doc_id"], r["n_tokens"], r["score"]) for r in df.collect()]


@pytest.mark.parametrize(
    "query",
    [
        "data quality",
        "the",
        "data quality zzzunseenterm",
        "model training data corpus",
    ],
)
def test_indexed_equals_direct_bm25(spark, index, query):
    path, _ = index
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    direct = _rows(bm25_topk(docs, "doc_id", "text", query, 25))
    indexed = _rows(bm25_topk_indexed(spark, path, query, 25))
    assert indexed == direct and len(direct) > 0


def test_probe_filter_is_pushed_to_postings_scan(spark, index):
    path, _ = index
    out = bm25_topk_indexed(spark, path, "data quality", 10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(term" in plan
    # and the probe never touches the source documents table
    assert "documents.parquet" not in plan


def test_meta_counts_all_docs_including_nulls(spark, tmp_path):
    rows = [(1, "alpha beta"), (2, None), (3, ""), (4, "alpha")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    meta = bm25_index_build(df, "doc_id", "text", str(tmp_path / "i"))
    # N counts every row (op 123's N protocol); dl sums the non-null
    assert meta["n_docs"] == 4 and meta["total_dl"] == 3
    got = _rows(bm25_topk_indexed(spark, str(tmp_path / "i"), "alpha", 10))
    want = _rows(bm25_topk(df, "doc_id", "text", "alpha", 10))
    assert got == want and len(got) == 2


def test_rebuild_overwrites(spark, tmp_path):
    p = str(tmp_path / "i2")
    a = spark.createDataFrame(
        [(1, "old corpus text")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(7, "new corpus text"), (8, "other words")],
        "doc_id long, text string",
    )
    bm25_index_build(a, "doc_id", "text", p)
    meta = bm25_index_build(b, "doc_id", "text", p)
    assert meta["n_docs"] == 2
    got = _rows(bm25_topk_indexed(spark, p, "corpus", 10))
    assert [g[0] for g in got] == [7]


def test_all_null_corpus_raises(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, text string"
    )
    p = str(tmp_path / "i3")
    bm25_index_build(df, "doc_id", "text", p)
    with pytest.raises(ValueError, match="tokenizable"):
        bm25_topk_indexed(spark, p, "alpha", 5)
