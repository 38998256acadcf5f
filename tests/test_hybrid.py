"""hybrid_search_rrf semantic gates (SURVEY §2.G op 141). The sf0.01
full-SQL twin lives in test_correctness.py (q68); these pin the fusion
arithmetic on a hand corpus where every rank is checkable by eye."""

from __future__ import annotations

from dwca_parquet_spark.operators.similarity import hybrid_search_rrf


def _fixtures(spark):
    docs = spark.createDataFrame(
        [
            (0, "the query vector's own doc"),
            (1, "apple"),
            (2, "banana cherry"),
            (3, "apple pear"),
            (4, "cherry"),
            (5, "plum plum plum"),
        ],
        "doc_id bigint, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.0]),
            (3, [1.0, 0.0, 0.0, 0.0]),
            (4, [0.9, 0.1, 0.0, 0.0]),
            (5, [0.0, 0.0, 0.0, 1.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    return docs, emb


def test_rrf_fuses_ranks_with_published_arithmetic(spark):
    docs, emb = _fixtures(spark)
    out = hybrid_search_rrf(
        docs, emb, text_query="apple", query_vec_id=0, k_each=2, k=3
    ).collect()
    rows = {r["doc_id"]: r for r in out}

    # text leg: only docs 1 and 3 contain 'apple'; doc 1 is shorter, so
    # BM25's length normalization ranks it first. vec leg (k_each=2):
    # doc 3 is the exact query vector (rank 1), doc 4 nearest (rank 2).
    assert rows[3]["text_rank"] == 2 and rows[3]["vec_rank"] == 1
    assert rows[1]["text_rank"] == 1 and rows[1]["vec_rank"] is None
    assert rows[4]["text_rank"] is None and rows[4]["vec_rank"] == 2

    assert rows[3]["rrf_score"] == round(1 / 62 + 1 / 61, 6)
    assert rows[1]["rrf_score"] == round(1 / 61, 6)
    assert rows[4]["rrf_score"] == round(1 / 62, 6)
    # both-legs doc outranks either single-leg doc
    assert [r["doc_id"] for r in out] == [3, 1, 4]


def test_rrf_k_truncates_after_fusion(spark):
    docs, emb = _fixtures(spark)
    out = hybrid_search_rrf(
        docs, emb, text_query="apple", query_vec_id=0, k_each=2, k=1
    ).collect()
    assert [r["doc_id"] for r in out] == [3]


def test_indexed_leg_fusion_byte_identical(spark, tmp_path):
    # op-127's indexed ≡ direct law lifts through the fusion arithmetic
    from dwca_parquet_spark.operators.invindex import (
        Bm25Index,
        bm25_index_build,
    )

    docs, emb = _fixtures(spark)
    bm25_index_build(docs, "doc_id", "text", str(tmp_path / "idx"))
    idx = Bm25Index(spark, str(tmp_path / "idx"))
    try:
        direct = hybrid_search_rrf(
            docs, emb, text_query="apple", query_vec_id=0, k_each=2, k=3
        ).collect()
        indexed = hybrid_search_rrf(
            docs,
            emb,
            text_query="apple",
            query_vec_id=0,
            k_each=2,
            k=3,
            bm25_index=idx,
        ).collect()
        assert [tuple(r) for r in direct] == [tuple(r) for r in indexed]
    finally:
        idx.unload()
