"""SQ8 scalar quantization (operators/sq.py): codes bit-equal to an
independent integer reference, per-dimension reconstruction bound,
partition-invariant fit, and recall vs the exact baseline with and
without rerank."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.similarity import VEC_SCALE, knn_bruteforce
from dwca_parquet_spark.operators.sq import (
    sq8_decode_scaled,
    sq8_encode,
    sq8_fit,
    sq8_topk,
)
from tests.conftest import SF_T2


def _half_up(x):
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def _ref_scaled(vecs: np.ndarray) -> np.ndarray:
    return _half_up(vecs.astype(np.float64) * VEC_SCALE).astype(np.int64)


def _ref_fit(sv: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lo = sv.min(axis=0)
    hi = np.maximum(sv.max(axis=0), lo + 1)
    return lo, hi


def _ref_encode(sv, lo, hi):
    n = np.maximum(sv - lo, 0)
    d = hi - lo
    return np.minimum((510 * n + d) // (2 * d), 255).astype(np.int64)


def _ref_decode(codes, lo, hi):
    d = hi - lo
    return lo + (2 * codes * d + 255) // 510


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_T2}/embeddings.parquet")


def test_sq8_codes_match_reference_and_bound(spark, emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    sv = _ref_scaled(np.array([r["embedding"] for r in rows], np.float32))
    order = np.argsort(ids)
    ids, sv = ids[order], sv[order]
    lo, hi = _ref_fit(sv)

    model = sq8_fit(emb, "embedding", sv.shape[1])
    assert model["lo"] == [int(x) for x in lo]
    assert model["hi"] == [int(x) for x in hi]

    got = {
        r["vec_id"]: np.array(r["codes"])
        for r in sq8_encode(emb, "vec_id", "embedding", model).collect()
    }
    want = _ref_encode(sv, lo, hi)
    for i, vid in enumerate(ids):
        assert (got[vid] == want[i]).all()

    # decode round-trip: reconstruction error ≤ half a quantization step
    dec = {
        r["vec_id"]: np.array(r["d"])
        for r in sq8_encode(emb, "vec_id", "embedding", model)
        .select(
            "vec_id", sq8_decode_scaled(F.col("codes"), model).alias("d")
        )
        .collect()
    }
    step = (hi - lo) / 255.0
    for i, vid in enumerate(ids):
        assert (np.abs(dec[vid] - sv[i]) <= np.ceil(step / 2) + 1).all()
        assert (dec[vid] == _ref_decode(want[i], lo, hi)).all()


def test_sq8_fit_partition_invariant(spark, emb):
    m1 = sq8_fit(emb, "embedding", 64)
    m2 = sq8_fit(emb.repartition(13), "embedding", 64)
    assert m1 == m2


def test_sq8_topk_recall_and_rerank(spark, emb):
    """SQ8 is near-lossless: approximate top-10 recall vs exact must be
    high, and exact rerank can only help."""
    k, nq = 10, 30
    exact = {
        (r["query_id"], r["cand_id"])
        for r in knn_bruteforce(emb, "vec_id", "embedding", nq, k).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"])
        for r in sq8_topk(emb, "vec_id", "embedding", nq, k).collect()
    }
    rer = {
        (r["query_id"], r["cand_id"])
        for r in sq8_topk(
            emb, "vec_id", "embedding", nq, k, rerank=3 * k
        ).collect()
    }
    recall = len(approx & exact) / len(exact)
    recall_r = len(rer & exact) / len(exact)
    assert recall >= 0.9  # 8-bit per-dim quantization barely moves cosine
    assert recall_r >= recall
    assert recall_r >= 0.97


# ---------------------------------------------------------------------------
# Binary quantization (op 108)
# ---------------------------------------------------------------------------


def _ref_bq_fit(sv: np.ndarray) -> np.ndarray:
    return sv.sum(axis=0) // sv.shape[0]


def _ref_bq_encode(sv: np.ndarray, thr: np.ndarray) -> np.ndarray:
    bits = (sv > thr).astype(np.int64)
    dim = sv.shape[1]
    nw = (dim + 31) // 32
    out = np.zeros((sv.shape[0], nw), dtype=np.int64)
    for w in range(nw):
        chunk = bits[:, w * 32 : (w + 1) * 32]
        out[:, w] = (chunk * (1 << np.arange(chunk.shape[1]))).sum(axis=1)
    return out


def test_bq_codes_match_reference_and_duckdb(spark, emb):
    import duckdb

    from dwca_parquet_spark.operators.sq import bq_encode, bq_fit, sql_bq_encode

    rows = emb.orderBy("vec_id").collect()
    vecs = np.array([r["embedding"] for r in rows])
    sv = _ref_scaled(vecs)
    thr = _ref_bq_fit(sv)
    dim = vecs.shape[1]

    model = bq_fit(emb, "embedding", dim)
    assert model["thr"] == [int(x) for x in thr]

    got = {r["vec_id"]: np.array(r["bcode"])
           for r in bq_encode(emb, "vec_id", "embedding", model).collect()}
    want = _ref_bq_encode(sv, thr)
    for i, r in enumerate(rows):
        assert (got[r["vec_id"]] == want[i]).all()

    # engine parity: DuckDB computes the identical packed words
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_T2}/embeddings.parquet')"
    )
    dk = {row[0]: np.array(row[1]) for row in con.execute(
        sql_bq_encode("embeddings", "vec_id", "embedding", model, dim)
    ).fetchall()}
    for vid, code in got.items():
        assert (dk[vid] == code).all()


def test_bq_fit_partition_invariant(spark, emb):
    from dwca_parquet_spark.operators.sq import bq_fit

    m1 = bq_fit(emb.repartition(1), "embedding", 64)
    m2 = bq_fit(emb.repartition(13), "embedding", 64)
    assert m1 == m2


def test_bq_hamming_topk_recall_and_rerank(spark, emb):
    """1-bit codes are lossy; the measured contract is (a) Hamming
    ranking is deterministic and self-consistent, (b) exact rerank of a
    4k shortlist recovers most of the exact top-10 on worst-case
    structureless vectors, and (c) rerank never hurts."""
    from dwca_parquet_spark.operators.sq import bq_hamming_topk

    k, qb = 10, 20
    exact = {
        (r["query_id"], r["cand_id"])
        for r in knn_bruteforce(emb, "vec_id", "embedding", qb, k).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"])
        for r in bq_hamming_topk(emb, "vec_id", "embedding", qb, k).collect()
    }
    rer = {
        (r["query_id"], r["cand_id"])
        for r in bq_hamming_topk(
            emb, "vec_id", "embedding", qb, k, rerank=100
        ).collect()
    }
    recall = len(approx & exact) / len(exact)
    recall_r = len(rer & exact) / len(exact)
    assert recall_r >= recall
    assert recall_r >= 0.5  # floor on structureless random vectors
    # determinism
    again = {
        (r["query_id"], r["cand_id"])
        for r in bq_hamming_topk(emb, "vec_id", "embedding", qb, k).collect()
    }
    assert again == approx


def test_bq_mih_exact_within_radius(spark, emb):
    """Multi-index candidates find EVERY pair within the radius — the
    pigeonhole guarantee — verified against the brute-force scan on a
    corpus with planted near-duplicates."""
    from dwca_parquet_spark.operators.sq import (
        bq_encode,
        bq_fit,
        bq_hamming_neighbors_mih,
    )

    rows = emb.orderBy("vec_id").collect()
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    # plant near-dups: tiny perturbations flip only a few sign bits
    rng = np.random.default_rng(3)
    n_dup = 40
    src = rng.integers(0, len(vecs), size=n_dup)
    dups = vecs[src] + rng.normal(0, 0.01, size=(n_dup, vecs.shape[1]))
    allv = np.vstack([vecs, dups])
    df = spark.createDataFrame(
        [(int(i), allv[i].tolist()) for i in range(len(allv))],
        "vec_id long, embedding array<float>",
    )
    radius = 7
    model = bq_fit(df, "embedding", vecs.shape[1])
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in bq_hamming_neighbors_mih(
            df, "vec_id", "embedding", radius, model=model
        ).collect()
    }

    # brute force over the exact codes
    codes = {r["vec_id"]: np.array(r["bcode"], dtype=np.uint64)
             for r in bq_encode(df, "vec_id", "embedding", model).collect()}
    ids = sorted(codes)
    want = set()
    mat = np.array([codes[i] for i in ids])
    for i in range(len(ids)):
        x = mat[i] ^ mat[i + 1:]
        d = np.unpackbits(x.view(np.uint8), axis=1).sum(axis=1)
        for j_off in np.nonzero(d <= radius)[0]:
            want.add((ids[i], ids[i + 1 + j_off], int(d[j_off])))
    assert want, "fixture must contain pairs within the radius"
    assert got == want

    # the guard: radius >= n_chunks must refuse, not silently lose recall
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bq_hamming_neighbors_mih(
            df, "vec_id", "embedding", 8, model=model, n_chunks=8
        )

    # round-6 ADVICE regression: n_chunks beyond the code's bit budget
    # used to leave trailing all-zero chunks — one bucket holding the
    # whole corpus (silent O(n²)) and a vacuous radius guard. Now the
    # EFFECTIVE chunk count governs: 64 bits / 9 chunks -> ceil(64/8)=8
    # real chunks, so radius 8 must refuse...
    with _pytest.raises(ValueError):
        bq_hamming_neighbors_mih(
            df, "vec_id", "embedding", 8, model=model, n_chunks=9
        )
    # ...and radius 7 under the clamp still finds EVERY pair
    got9 = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in bq_hamming_neighbors_mih(
            df, "vec_id", "embedding", radius, model=model, n_chunks=9
        ).collect()
    }
    assert got9 == want
