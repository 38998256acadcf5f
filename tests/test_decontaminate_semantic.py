"""Gates for semantic decontamination (SURVEY §2 op 121, round 7):
DuckDB twin row-for-row on the real embeddings fixture (the strongest
gate the family has — cross-engine value parity through the integer
protocol), a planted-paraphrase scenario the n-gram fence misses, and
the Exchange-free plan pin (the operator must stay a scan-stage
projection at corpus scale)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.similarity import (
    decontaminate_semantic,
    sql_decontaminate_semantic,
)
from tests.conftest import SF_T2

DIM = 64  # the embeddings fixture's dimensionality


def test_decontaminate_duckdb_twin_on_fixture(spark, duck):
    emb = spark.read.parquet(f"{SF_T2}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") >= 20)
    ev = emb.filter(F.col("vec_id") < 20)
    got = sorted(
        tuple(r)
        for r in decontaminate_semantic(
            corpus, ev, "vec_id", "embedding", "vec_id", "embedding", 0.9
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            sql_decontaminate_semantic(
                "(SELECT * FROM embeddings WHERE vec_id >= 20)",
                "(SELECT * FROM embeddings WHERE vec_id < 20)",
                "vec_id", "embedding", "vec_id", "embedding", DIM, 0.9,
            )
        ).fetchall()
    )
    assert got == want
    assert len(got) == corpus.count()  # one verdict per corpus doc


def test_decontaminate_planted_paraphrase(spark):
    """A corpus vector that is a scaled+noised copy of an eval vector
    (the embedding signature of a paraphrase) is flagged against the
    right eval id; unrelated vectors are not."""
    rng = random.Random(20260815)

    def vec():
        return [rng.uniform(-1, 1) for _ in range(16)]

    evs = [(i, vec()) for i in range(5)]
    ev = spark.createDataFrame(evs, "eid long, evec array<float>")
    near = [0.98 * x + 0.001 for x in evs[3][1]]  # ~eval 3, cosine ≈ 1
    corpus = spark.createDataFrame(
        [(100, near)] + [(200 + i, vec()) for i in range(20)],
        "cid long, cvec array<float>",
    )
    out = {
        r["cid"]: (r["eval_id"], r["eval_cosine"], r["contaminated"])
        for r in decontaminate_semantic(
            corpus, ev, "cid", "cvec", "eid", "evec", 0.95
        ).collect()
    }
    assert out[100][0] == 3 and out[100][2] is True
    assert out[100][1] >= 0.99
    flagged = [c for c, (_, _, f) in out.items() if f]
    assert flagged == [100]


def test_decontaminate_plan_is_exchange_free(spark):
    emb = spark.read.parquet(f"{SF_T2}/embeddings.parquet")
    ev = emb.filter(F.col("vec_id") < 10)
    plan = (
        decontaminate_semantic(
            emb, ev, "vec_id", "embedding", "vec_id", "embedding"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan  # broadcast matrix, not a join


def test_decontaminate_empty_eval_raises(spark):
    emb = spark.read.parquet(f"{SF_T2}/embeddings.parquet")
    with pytest.raises(ValueError, match="eval set is empty"):
        decontaminate_semantic(
            emb, emb.filter(F.lit(False)),
            "vec_id", "embedding", "vec_id", "embedding",
        )
