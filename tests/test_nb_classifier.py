"""Naive-Bayes quality classifier (SURVEY §2 round-4): fit determinism,
DuckDB scoring parity on the documents fixture, separation sanity on a
planted two-class corpus, and the zero-shuffle scoring plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.text import nb_fit, nb_score, sql_nb_score
from tests.conftest import SF_T2

# planted corpus: class 1 speaks "clean" words, class 0 speaks "spam" words,
# with shared filler so the classes overlap realistically
CLEAN = "research method analysis careful evidence study result clear"
SPAM = "click free winner prize buy cheap offer now"
FILLER = "the and of to a in"
ROWS = [
    (1, f"{CLEAN} {FILLER}", 1),
    (2, f"{CLEAN} {CLEAN} {FILLER}", 1),
    (3, f"evidence and analysis of the study result", 1),
    (4, f"{SPAM} {FILLER}", 0),
    (5, f"{SPAM} {SPAM}", 0),
    (6, f"click now to buy the cheap offer and win a prize", 0),
    (7, "", 0),
]


def test_fit_deterministic_and_scores_separate(spark):
    df = spark.createDataFrame(ROWS, "id long, text string, y int")
    m1 = nb_fit(df, "text", "y", vocab_size=64)
    m2 = nb_fit(df, "text", "y", vocab_size=64)
    assert m1 == m2
    scored = {
        r["id"]: r["nb_logodds_per_token"]
        for r in nb_score(df, "id", "text", m1).collect()
    }
    held_clean = spark.createDataFrame(
        [(100, "careful analysis of the evidence")], "id long, text string"
    )
    held_spam = spark.createDataFrame(
        [(200, "free prize click now")], "id long, text string"
    )
    s_clean = nb_score(held_clean, "id", "text", m1).first()
    s_spam = nb_score(held_spam, "id", "text", m1).first()
    assert s_clean["nb_logodds_per_token"] > 0 > s_spam["nb_logodds_per_token"]
    assert scored[7] is None  # empty doc → NULL mean


def test_score_parity_documents(spark, duck):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    labeled = docs.withColumn("y", (F.col("doc_id") % 2).cast("int"))
    model = nb_fit(labeled, "text", "y", vocab_size=256)
    got = sorted(
        tuple(r)
        for r in nb_score(docs, "doc_id", "text", model).collect()
    )
    want = sorted(
        duck.execute(
            sql_nb_score("doc_id", "text", model, "documents")
        ).fetchall()
    )
    assert got == want


def test_scoring_plan_is_shuffle_free(spark):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    labeled = docs.withColumn("y", (F.col("doc_id") % 2).cast("int"))
    model = nb_fit(labeled, "text", "y", vocab_size=64)
    plan = (
        nb_score(docs, "doc_id", "text", model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_bigram_lm_parity_and_fluency(spark, duck):
    from dwca_parquet_spark.operators.text import (
        lm2_fit,
        lm2_logprob_score,
        sql_lm2_logprob_score,
    )

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    model = lm2_fit(docs, "text", vocab_size=128, top_bigrams=512)
    assert model == lm2_fit(docs, "text", vocab_size=128, top_bigrams=512)

    got = sorted(
        tuple(r) for r in lm2_logprob_score(docs, "doc_id", "text", model).collect()
    )
    want = sorted(
        duck.execute(
            sql_lm2_logprob_score("doc_id", "text", model, "documents")
        ).fetchall()
    )
    assert got == want

    # fluency: corpus-frequent transitions outscore shuffled ones
    top_pair = max(model["bigrams"], key=model["bigrams"].get)
    a, b = top_pair.split("\x1f")
    fluent = spark.createDataFrame(
        [(1, f"{a} {b} {a} {b} {a} {b}")], "id long, text string"
    )
    garbled = spark.createDataFrame(
        [(2, f"{b} {b} {b} {a} {a} {a}")], "id long, text string"
    )
    sf = lm2_logprob_score(fluent, "id", "text", model).first()["lm2_logprob"]
    sg = lm2_logprob_score(garbled, "id", "text", model).first()["lm2_logprob"]
    assert sf > sg

    # short docs: single-token → NULL, n_transitions 0
    one = spark.createDataFrame([(3, "word")], "id long, text string")
    r = lm2_logprob_score(one, "id", "text", model).first()
    assert r["n_transitions"] == 0 and r["lm2_logprob"] is None
