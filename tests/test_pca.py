"""Gates for distributed PCA (SURVEY §2 op 125): bit-identical NumPy
reference on the same scaled integers, partition invariance as an EXACT
law, orthonormality/variance properties, transform parity, the NULL and
magnitude contracts, and a kNN-recall composition gate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.pca import (
    _model_from_moments,
    pca_fit,
    pca_transform,
)
from dwca_parquet_spark.operators.similarity import VEC_SCALE
from tests.conftest import SF_T2

DIM = 64


def _emb(spark):
    return spark.read.parquet(f"{SF_T2}/embeddings.parquet")


def _collected_svecs(spark):
    """The exact scaled integers the operator hashes its moments from —
    collected via the SAME Spark rounding expression, so the reference
    isolates the distributed moment sums, not the rounding."""
    rows = (
        _emb(spark)
        .select(
            F.transform(
                "embedding",
                lambda v: F.round(v.cast("double") * VEC_SCALE, 0).cast(
                    "long"
                ),
            ).alias("svec")
        )
        .collect()
    )
    return [list(r["svec"]) for r in rows]


def _ref_model(svecs, dim, k):
    x = np.array(svecs, dtype=np.int64)
    n = len(svecs)
    s1 = [int(v) for v in x.sum(axis=0)]
    tri = [int(v) for v in (x.T @ x)[np.triu_indices(dim)]]
    return _model_from_moments(n, s1, tri, dim, k)


def test_fit_bit_identical_to_numpy_reference(spark):
    got = pca_fit(_emb(spark), "vec_id", "embedding", DIM, 8)
    want = _ref_model(_collected_svecs(spark), DIM, 8)
    assert got.n == want.n
    assert np.array_equal(got.mean, want.mean)
    assert np.array_equal(got.components, want.components)
    assert np.array_equal(got.eigvals, want.eigvals)


def test_fit_partition_invariance_exact(spark):
    emb = _emb(spark)
    one = pca_fit(emb.repartition(1), "vec_id", "embedding", DIM, 6)
    many = pca_fit(emb.repartition(17), "vec_id", "embedding", DIM, 6)
    assert np.array_equal(one.components, many.components)
    assert np.array_equal(one.mean, many.mean)
    assert np.array_equal(one.eigvals, many.eigvals)


def test_model_properties(spark):
    m = pca_fit(_emb(spark), "vec_id", "embedding", DIM, DIM)
    # row-orthonormal components
    assert np.allclose(m.components @ m.components.T, np.eye(DIM), atol=1e-9)
    # eigenvalues descending and total variance = trace of the covariance
    assert all(
        m.eigvals[i] >= m.eigvals[i + 1] - 1e-12
        for i in range(len(m.eigvals) - 1)
    )
    svecs = np.array(_collected_svecs(spark), dtype=np.float64)
    cov = np.cov(svecs, rowvar=False, ddof=1) / (VEC_SCALE * VEC_SCALE)
    assert np.isclose(m.eigvals.sum(), np.trace(cov), rtol=1e-9)
    # deterministic sign: each component's largest-|coeff| entry positive
    for row in m.components:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_transform_matches_numpy_and_null_passthrough(spark):
    emb = _emb(spark)
    model = pca_fit(emb, "vec_id", "embedding", DIM, 8)
    got = {
        r["vec_id"]: np.array(r["pca"])
        for r in pca_transform(emb, "vec_id", "embedding", model).collect()
    }
    raw = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    for vid, x in raw.items():
        want = (x - model.mean) @ model.components.T
        assert np.allclose(got[vid], want, atol=1e-12)
    # NULL vectors project to NULL, not a crash
    with_null = emb.select(
        "vec_id",
        F.when(F.col("vec_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("embedding")
        ).alias("embedding"),
    )
    out = {
        r["vec_id"]: r["pca"]
        for r in pca_transform(
            with_null, "vec_id", "embedding", model
        ).collect()
    }
    assert all(
        (out[v] is None) == (v % 7 == 0) for v in out
    )


def test_fit_excludes_null_vectors(spark):
    emb = _emb(spark).select("vec_id", "embedding")
    with_null = emb.unionByName(
        emb.limit(5).select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"),
            F.lit(None).cast("array<float>").alias("embedding"),
        )
    )
    a = pca_fit(emb, "vec_id", "embedding", DIM, 4)
    b = pca_fit(with_null, "vec_id", "embedding", DIM, 4)
    assert a.n == b.n and np.array_equal(a.components, b.components)


def test_magnitude_contract_raises(spark):
    big = spark.createDataFrame(
        [(i, [float(i + 5), 0.0]) for i in range(10)],
        "id long, v array<double>",
    )
    with pytest.raises(Exception, match="magnitude"):
        pca_fit(big, "id", "v", 2, 1)


def test_moment_pass_slices_oversized_batches_exactly():
    """ADVICE r8: the per-batch x.T @ x int64 bound must be ENFORCED
    per matmul, not assumed from the default Arrow batch size. Feed one
    250k-row batch (2.5× the slice bound) straight into the moment
    factory: it must emit multiple slice partials whose sums equal the
    whole-batch NumPy moments exactly."""
    import pandas as pd

    from dwca_parquet_spark.operators.pca import (
        _MOMENT_SLICE_ROWS,
        _moment_rows_factory,
    )

    rng = np.random.default_rng(7)
    dim, rows = 3, 250_000
    assert rows > 2 * _MOMENT_SLICE_ROWS
    x = rng.integers(-1000, 1000, size=(rows, dim), dtype=np.int64)
    pdf = pd.DataFrame({"svec": list(x)})
    outs = list(_moment_rows_factory(dim)(iter([pdf])))
    assert len(outs) == 3  # 250k rows → 3 slices
    summed: dict[int, int] = {}
    for o in outs:
        for pos, val in zip(o["pos"], o["val"]):
            summed[int(pos)] = summed.get(int(pos), 0) + int(val)
    assert summed[0] == rows
    want_s1 = x.sum(axis=0)
    for i in range(dim):
        assert summed[1 + i] == int(want_s1[i])
    iu = np.triu_indices(dim)
    want_tri = (x.T @ x)[iu]
    for t in range(len(want_tri)):
        assert summed[1 + dim + t] == int(want_tri[t])


def test_knn_recall_survives_reduction(spark):
    """Composition gate: on clustered vectors, each point's top-1
    neighbor in the PCA-8 space stays within its cluster — the reduce
    preserves the neighborhood structure the ANN ladder consumes."""
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(20, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(20):
        for j in range(10):
            v = centers[c] + 0.05 * rng.normal(size=DIM)
            rows.append((c * 10 + j, c, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "id long, cluster long, v array<double>")
    model = pca_fit(df, "id", "v", DIM, 8)
    proj = {
        r["id"]: np.array(r["pca"])
        for r in pca_transform(df, "id", "v", model).collect()
    }
    ids = sorted(proj)
    mat = np.stack([proj[i] for i in ids])
    d2 = ((mat[:, None, :] - mat[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nn = d2.argmin(axis=1)
    same = sum(1 for i, j in enumerate(nn) if ids[i] // 10 == ids[j] // 10)
    assert same / len(ids) >= 0.95


def test_state_update_equals_refit_bit_exact(spark, tmp_path):
    """op 130's exact law: state(A) + update(B) + update(C) →
    fit_from_state ≡ pca_fit over A∪B∪C BIT-FOR-BIT (integer moment
    addition commutes and the driver math is shared)."""
    from dwca_parquet_spark.operators.pca import (
        pca_fit_from_state,
        pca_state_update,
        pca_state_write,
    )

    emb = _emb(spark).select("vec_id", "embedding")
    a = emb.filter(F.col("vec_id") % 3 == 0)
    b = emb.filter(F.col("vec_id") % 3 == 1)
    c = emb.filter(F.col("vec_id") % 3 == 2)
    p = str(tmp_path / "pca_state")
    pca_state_write(a, "vec_id", "embedding", DIM, p)
    pca_state_update(b, "vec_id", "embedding", p)
    pca_state_update(c, "vec_id", "embedding", p)
    got = pca_fit_from_state(spark, p, 8)
    want = pca_fit(emb, "vec_id", "embedding", DIM, 8)
    assert got.n == want.n
    assert np.array_equal(got.mean, want.mean)
    assert np.array_equal(got.components, want.components)
    assert np.array_equal(got.eigvals, want.eigvals)
    # and the state survives a cold read (nothing driver-resident)
    again = pca_fit_from_state(spark, p, 8)
    assert np.array_equal(again.components, want.components)
