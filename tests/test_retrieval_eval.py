"""retrieval_metrics semantic gates (SURVEY §2.G op 145). The sf0.01
twin (q71, exact-kNN leg vs label ground truth) lives in
test_correctness.py; these pin the metric arithmetic on hand rankings
where every number is computable by eye."""

from __future__ import annotations

import math

from dwca_parquet_spark.operators.evaluation import retrieval_metrics


def _frames(spark, preds, truth):
    p = spark.createDataFrame(preds, "query_id bigint, doc_id bigint, rank int")
    t = spark.createDataFrame(truth, "query_id bigint, doc_id bigint")
    return p, t


def _row(spark, preds, truth, k=5):
    p, t = _frames(spark, preds, truth)
    rows = retrieval_metrics(p, t, k=k).collect()
    return {r["query_id"]: r for r in rows}


def test_perfect_ranking_scores_ones(spark):
    preds = [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
    truth = [(1, 10), (1, 11), (1, 12)]
    r = _row(spark, preds, truth)[1]
    assert (r["n_rel"], r["n_hits"]) == (3, 3)
    assert (r["recall_k"], r["mrr"], r["ndcg"]) == (1.0, 1.0, 1.0)


def test_partial_hits_known_dcg(spark):
    # hits at ranks 2 and 4 of 5; two relevant docs total
    preds = [(1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4), (1, 14, 5)]
    truth = [(1, 11), (1, 13)]
    r = _row(spark, preds, truth)[1]
    dcg = 0.0
    for rank in (2, 4):
        dcg = dcg + 1.0 / math.log2(rank + 1.0)
    idcg = 0.0
    for rank in (1, 2):
        idcg = idcg + 1.0 / math.log2(rank + 1.0)
    assert r["ndcg"] == round(dcg / idcg, 6)
    assert r["recall_k"] == 1.0  # both relevant docs retrieved
    assert r["mrr"] == 0.5  # first hit at rank 2


def test_relevant_but_unhit_is_zero_not_null(spark):
    preds = [(1, 10, 1), (1, 11, 2)]
    truth = [(1, 99)]
    r = _row(spark, preds, truth)[1]
    assert (r["recall_k"], r["mrr"], r["ndcg"]) == (0.0, 0.0, 0.0)


def test_no_relevant_docs_is_null_not_zero(spark):
    preds = [(1, 10, 1)]
    truth = [(2, 10)]  # truth for a different query only
    r = _row(spark, preds, truth)
    assert (r[1]["recall_k"], r[1]["ndcg"]) == (None, None)
    assert r[1]["mrr"] == 0.0
    assert 2 not in r  # output rows come from preds' queries only


def test_rank_cutoff_and_truth_dedup(spark):
    # a hit beyond k is not a hit; duplicate truth rows count once
    preds = [(1, 10, 1), (1, 11, 7)]
    truth = [(1, 11), (1, 11), (1, 10)]
    r = _row(spark, preds, truth, k=5)[1]
    assert (r["n_rel"], r["n_hits"]) == (2, 1)
    assert r["mrr"] == 1.0  # doc 10 at rank 1
