"""Product quantization (SURVEY §2 round-4): bit-deterministic fit under
repartitioning (the exact-integer k-means claim), quantization error
improving over Lloyd iterations, 32× compression of the stored table,
ADC recall beating random by a wide margin, and the JVM-only plans."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.pq import pq_encode, pq_fit, pq_topk_adc
from dwca_parquet_spark.operators.similarity import VEC_SCALE
from tests.conftest import SF_T2

DIM, M, K = 64, 8, 16


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_T2}/embeddings.parquet")


def _np_vectors(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.round(
        np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
        * VEC_SCALE
    ).astype(np.int64)
    return ids, mat


def test_fit_deterministic_under_repartitioning(spark, emb):
    cb1 = pq_fit(emb, "vec_id", "embedding", DIM, M, K, iters=2)
    cb2 = pq_fit(
        emb.repartition(13), "vec_id", "embedding", DIM, M, K, iters=2
    )
    assert cb1 == cb2  # exact-integer Lloyd: partitioning cannot change it


def test_quantization_error_decreases(spark, emb):
    ids, mat = _np_vectors(emb)

    def err(codebook):
        total = 0
        d_sub = DIM // M
        for s in range(M):
            sub = mat[:, s * d_sub : (s + 1) * d_sub]
            cents = np.array(codebook[s])
            d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            total += d.min(axis=1).sum()
        return total

    e1 = err(pq_fit(emb, "vec_id", "embedding", DIM, M, K, iters=1))
    e4 = err(pq_fit(emb, "vec_id", "embedding", DIM, M, K, iters=4))
    assert e4 <= e1
    assert e4 < err([[list(np.zeros(DIM // M, dtype=int))] * K] * M)


def test_encode_matches_numpy_and_compresses(spark, emb):
    cb = pq_fit(emb, "vec_id", "embedding", DIM, M, K, iters=3)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb, "vec_id", "embedding", cb).collect()
    }
    ids, mat = _np_vectors(emb)
    d_sub = DIM // M
    for s in range(M):
        cents = np.array(cb[s])
        sub = mat[:, s * d_sub : (s + 1) * d_sub]
        d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        # np.argmin takes the first (smallest-index) min — same tie rule
        codes = d.argmin(axis=1)
        for i, vid in enumerate(ids):
            assert got[vid][s] == codes[i]
    assert all(len(c) == M for c in got.values())  # m bytes vs dim·4


def test_adc_recall_beats_random(spark, emb):
    cb = pq_fit(emb, "vec_id", "embedding", DIM, M, K, iters=3)
    codes = pq_encode(emb, "vec_id", "embedding", cb)
    queries = emb.filter(F.col("vec_id") < 20)
    got = pq_topk_adc(queries, codes, "vec_id", "embedding", "vec_id", cb, topk=10)
    by_q: dict[int, set] = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], set()).add(r["cand_id"])

    ids, mat = _np_vectors(emb)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    recalls = []
    for q in range(20):
        d = ((mat - mat[q][None, :]) ** 2).sum(axis=1)
        exact10 = set(ids[np.lexsort((ids, d))[:10]].tolist())
        recalls.append(len(by_q[q] & exact10) / 10)
    mean_recall = float(np.mean(recalls))
    # random would be 10/500 = 0.02; PQ with 8×16 codes should be far above
    assert mean_recall >= 0.3, mean_recall


def test_pq_plans_are_jvm_only(spark, emb):
    """No row-at-a-time Python anywhere; encode's only shuffles are the
    two map-side-combinable groupBys the docstring promises."""
    cb = pq_fit(emb, "vec_id", "embedding", DIM, M, K, iters=1)
    enc = pq_encode(emb, "vec_id", "embedding", cb)
    enc_plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in enc_plan
    assert enc_plan.count("Exchange hashpartitioning") <= 2
    codes = pq_encode(emb, "vec_id", "embedding", cb)
    adc_plan = (
        pq_topk_adc(emb.filter(F.col("vec_id") < 3), codes, "vec_id",
                    "embedding", "vec_id", cb, topk=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in adc_plan


def test_ivf_pq_bounds_candidates_and_recalls(spark, emb):
    from dwca_parquet_spark.operators.pq import ivf_pq_topk

    cb = pq_fit(emb, "vec_id", "embedding", DIM, M, K, iters=3)
    got = ivf_pq_topk(
        emb, "vec_id", "embedding", 20, cb, k=10, k_cells=16, nprobe=6
    )
    rows = got.collect()
    by_q: dict[int, set] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["cand_id"])
    assert set(by_q) == set(range(20))
    assert all(len(v) == 10 for v in by_q.values())

    # recall vs exact L2 (self excluded): must beat random (0.02) clearly;
    # IVF probing 6/16 cells costs recall vs full ADC, so the gate is low
    ids, mat = _np_vectors(emb)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    recalls = []
    for q in range(20):
        d = ((mat - mat[q][None, :]) ** 2).sum(axis=1)
        d[q] = np.iinfo(np.int64).max  # exclude self like the operator
        exact10 = set(ids[np.lexsort((ids, d))[:10]].tolist())
        recalls.append(len(by_q[q] & exact10) / 10)
    assert float(np.mean(recalls)) >= 0.15, float(np.mean(recalls))

    # determinism: integer ADC + explicit tie order
    again = ivf_pq_topk(
        emb, "vec_id", "embedding", 20, cb, k=10, k_cells=16, nprobe=6
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_rerank_improves_over_adc(spark, emb):
    from dwca_parquet_spark.operators.pq import ivf_pq_topk, ivf_pq_topk_rerank

    cb = pq_fit(emb, "vec_id", "embedding", DIM, M, K, iters=3)
    ids, mat = _np_vectors(emb)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]

    def truth(q):
        d = ((mat - mat[q][None, :]) ** 2).sum(axis=1)
        d[q] = np.iinfo(np.int64).max
        return set(ids[np.lexsort((ids, d))[:10]].tolist())

    def recall(res):
        by_q = {}
        for r in res.collect():
            by_q.setdefault(r["query_id"], set()).add(r["cand_id"])
        return np.mean([len(by_q[q] & truth(q)) / 10 for q in range(20)])

    plain = recall(
        ivf_pq_topk(emb, "vec_id", "embedding", 20, cb, k=10,
                    k_cells=16, nprobe=6)
    )
    rr = recall(
        ivf_pq_topk_rerank(emb, "vec_id", "embedding", 20, cb, k=10,
                           k_cells=16, nprobe=6, rerank=100)
    )
    assert rr > plain + 0.1, (plain, rr)
    # reranked distances are EXACT integers → fully deterministic
    a = ivf_pq_topk_rerank(emb, "vec_id", "embedding", 5, cb, k=5,
                           k_cells=16, nprobe=6, rerank=50).collect()
    b = ivf_pq_topk_rerank(emb, "vec_id", "embedding", 5, cb, k=5,
                           k_cells=16, nprobe=6, rerank=50).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
