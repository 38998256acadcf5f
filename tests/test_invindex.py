"""Gates for the inverted index + indexed BM25 (SURVEY §2 op 127): the
EXACT parity law vs op 123 across query shapes, the pushed-filter plan
pin on the postings scan, meta fidelity, and overwrite semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.invindex import (
    Bm25Index,
    bm25_index_append,
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
    # grow the index so the rebuild must also clear HIGHER segments,
    # and plant unrelated data the rebuild must NOT touch (the delete
    # is scoped to the three index subdirs, never the caller's path)
    bm25_index_append(b, "doc_id", "text", p)
    import pathlib

    sentinel = pathlib.Path(p) / "user_data.txt"
    sentinel.write_text("precious")
    meta = bm25_index_build(b, "doc_id", "text", p)
    assert meta["n_docs"] == 2
    assert sentinel.read_text() == "precious"
    got = _rows(bm25_topk_indexed(spark, p, "corpus", 10))
    assert [g[0] for g in got] == [7]


def _seg_files(root):
    """{relative_path: (size, sha256)} for every data file under root."""
    import hashlib
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if fn.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, fn)
            with open(p, "rb") as fh:
                digest = hashlib.sha256(fh.read()).hexdigest()
            out[os.path.relpath(p, root)] = (os.path.getsize(p), digest)
    return out


def _corpus_halves(spark):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    a = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) != 0)
    b = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == 0)
    return docs, a, b


@pytest.mark.parametrize(
    "query", ["data quality", "the", "model training data corpus"]
)
def test_append_equals_rebuild_and_direct(spark, tmp_path, query):
    """op 134 law: probe over build(A)+append(B) is byte-identical to
    probe over rebuild(A ∪ B), and both equal the direct op-123 scan on
    the union — across query shapes."""
    docs, a, b = _corpus_halves(spark)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    bm25_index_build(a, "doc_id", "text", inc)
    got_meta = bm25_index_append(b, "doc_id", "text", inc)
    want_meta = bm25_index_build(docs, "doc_id", "text", full)
    assert got_meta["segment"] == 1
    for key in ("n_docs", "total_dl", "n_terms"):
        assert got_meta[key] == want_meta[key]
    inc_rows = _rows(bm25_topk_indexed(spark, inc, query, 25))
    full_rows = _rows(bm25_topk_indexed(spark, full, query, 25))
    direct = _rows(bm25_topk(docs, "doc_id", "text", query, 25))
    assert inc_rows == full_rows == direct and len(direct) > 0


def test_append_never_rewrites_existing_segments(spark, tmp_path):
    """Frozen-state discipline (the op-129 gate pattern): after an
    append, every pre-existing segment data file is byte-identical,
    and two appends stack as segments 1 and 2."""
    docs, a, b = _corpus_halves(spark)
    p = str(tmp_path / "idx")
    bm25_index_build(a, "doc_id", "text", p)
    before = _seg_files(p)
    b1 = b.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    b2 = b.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) != 0)
    m1 = bm25_index_append(b1, "doc_id", "text", p)
    mid = _seg_files(p)
    assert all(mid[f] == before[f] for f in before)  # seg 0 untouched
    m2 = bm25_index_append(b2, "doc_id", "text", p)
    after = _seg_files(p)
    assert all(after[f] == mid[f] for f in mid)  # segs 0-1 untouched
    assert (m1["segment"], m2["segment"]) == (1, 2)
    # and the three-segment probe still equals the one-shot rebuild
    full = str(tmp_path / "full")
    bm25_index_build(docs, "doc_id", "text", full)
    assert _rows(bm25_topk_indexed(spark, p, "data quality", 25)) == _rows(
        bm25_topk_indexed(spark, full, "data quality", 25)
    )


def test_loaded_index_probe_equals_per_call(spark, index, tmp_path):
    """Bm25Index (loaded API, the op-128 FileIndex.load precedent):
    topk byte-identical to bm25_topk_indexed across query shapes, and
    a reload after an append sees the grown corpus."""
    path, _ = index
    idx = Bm25Index.load(spark, path)
    try:
        for q in ("data quality", "the", "data quality zzzunseenterm"):
            assert _rows(idx.topk(q, 25)) == _rows(
                bm25_topk_indexed(spark, path, q, 25)
            )
    finally:
        idx.unload()
    # append + reload: the loaded probe equals the per-call probe on
    # the grown index (fresh index dir — `index` is module-scoped)
    docs, a, b = _corpus_halves(spark)
    p = str(tmp_path / "grown")
    bm25_index_build(a, "doc_id", "text", p)
    bm25_index_append(b, "doc_id", "text", p)
    idx2 = Bm25Index.load(spark, p)
    try:
        assert _rows(idx2.topk("data quality", 25)) == _rows(
            bm25_topk_indexed(spark, p, "data quality", 25)
        )
    finally:
        idx2.unload()


def test_append_to_missing_index_raises(spark, tmp_path):
    df = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    with pytest.raises(Exception):
        bm25_index_append(df, "doc_id", "text", str(tmp_path / "nope"))


def test_all_null_corpus_raises(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, text string"
    )
    p = str(tmp_path / "i3")
    bm25_index_build(df, "doc_id", "text", p)
    with pytest.raises(ValueError, match="tokenizable"):
        bm25_topk_indexed(spark, p, "alpha", 5)
