"""Distributed PCA over embedding columns — exact integer moments, one
corpus pass (SURVEY §2 op 125).

Why the engine needs it: the ANN ladder (sign-LSH → IVF → PQ → SQ8 →
1-bit/MIH, ops 17/27/65/67/98/108) and SemDeDup (op 91) all pay per-
vector costs linear in dimension. Production embedding pipelines run a
PCA reduce FIRST (e.g. 768 → 64) — it shrinks every downstream index,
and for SemDeDup the paper itself clusters in a reduced space. No
reference analogue (SURVEY §2.F — the reference ships no vector
surface); the algorithm is textbook public knowledge (covariance
eigendecomposition; Pearson 1901, and every stats text since).

Spark-first shape (the part that matters at 100 TB):

* ``pca_fit`` makes ONE pass: vectors scale to integers (the repo-wide
  ``VEC_SCALE`` protocol from similarity.py), each Arrow batch reduces
  to (count, Σx, upper-triangle Σxxᵀ) — d(d+3)/2 + 1 int64 values,
  exact within a batch by a documented magnitude bound — emitted as
  (pos, val) rows, and a map-side-combinable groupBy(pos) sums them in
  Decimal(38,0). The driver collects ≤ d(d+3)/2 + 1 rows (d=768 →
  ~296k — bounded by DIMENSION, never by the corpus), assembles the
  exact integer moments, and runs float64 covariance + ``numpy.eigh``
  once. Nothing corpus-sized shuffles; nothing corpus-sized ever
  reaches the driver.
* Integer moments make the fit EXACT and therefore engine- and
  partitioning-DETERMINISTIC: any repartitioning sums the same
  integers (addition commutes), so the model is bit-identical — the
  pq_fit/kmeans_fit determinism protocol extended to second moments.
  The only floats are the final covariance/eigh, computed once on the
  driver from identical integers every time.
* Eigenvector sign is fixed deterministically (largest-|coefficient|
  component made positive, first-index tie-break), so models compare
  bit-for-bit across runs and engines.
* ``pca_transform`` is one Arrow-batched pandas UDF: (X − μ) @ Wᵀ, a
  single matmul per batch against the broadcast (k, d) component
  matrix — the multimodal/phash batch discipline, zero shuffle.

Verification (test_pca.py): fit ≡ a NumPy reference fed the same
scaled integers (bit-identical model), partition-invariance as an
EXACT law, orthonormality / descending-eigenvalue / total-variance
properties, transform ≡ NumPy, and a composition gate — kNN neighbor
recall in the reduced space on clustered data. No SQL twin:
eigendecomposition is genuinely non-SQL-expressible (the op-65/93
precedent); the NumPy differential is the oracle.

Magnitude contract: scaled components must satisfy |x·VEC_SCALE| ≤
3·10⁶ (original |x| ≤ 3 — generous for unit-norm embeddings) so a
10k-row Arrow batch's triangle sums stay < 2⁶³; violated → ValueError
at fit time (never a silent overflow).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.similarity import VEC_SCALE

__all__ = [
    "PCAModel",
    "pca_fit",
    "pca_transform",
    "pca_state_write",
    "pca_state_update",
    "pca_fit_from_state",
]

_MAX_SCALED = 3_000_000  # |scaled component| bound for in-batch int64 safety

# Per-matmul row bound (ADVICE round 8): each x.T @ x cell is a sum of
# len(x) products, each ≤ _MAX_SCALED², so int64 exactness needs
# len(x)·_MAX_SCALED² < 2⁶³ — i.e. len(x) ≤ ~1.02M. The default Arrow
# batch (10k rows) sits far inside, but the bound must be ENFORCED, not
# assumed from spark.sql.execution.arrow.maxRecordsPerBatch: a raised
# batch size would otherwise wrap silently. 100k rows keeps a 10×
# margin; oversized batches are sliced, and the downstream groupBy(pos)
# sums slices exactly like batches.
_MOMENT_SLICE_ROWS = 100_000


@dataclass(frozen=True)
class PCAModel:
    """Bounded driver-side state: d-vector mean (original units), (k, d)
    row-orthonormal components, k eigenvalues (original units², sample
    covariance), corpus count."""

    mean: np.ndarray
    components: np.ndarray
    eigvals: np.ndarray
    n: int


def _moment_rows_factory(dim: int):
    """mapInPandas: per Arrow batch, (pos, val) int64 moment rows.
    pos 0 = count; 1..d = Σx; d+1.. = row-major upper triangle of Σxxᵀ
    (i ≤ j). Exact: integer einsum, magnitude-guarded."""
    iu = np.triu_indices(dim)

    def moments(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["svec"].values).astype(np.int64)
            if x.shape[1] != dim:
                raise ValueError(
                    f"vector dim {x.shape[1]} != declared dim {dim}"
                )
            if np.abs(x).max(initial=0) > _MAX_SCALED:
                raise ValueError(
                    "scaled component exceeds the magnitude contract "
                    f"(|x| > {_MAX_SCALED / VEC_SCALE:g})"
                )
            # slice so every matmul stays under the documented 2⁶³
            # bound regardless of the session's Arrow batch size
            for lo in range(0, len(x), _MOMENT_SLICE_ROWS):
                xs = x[lo : lo + _MOMENT_SLICE_ROWS]
                tri = (xs.T @ xs)[iu]  # int64-exact: rows·mag² < 2⁶³
                vals = np.concatenate(
                    (
                        [np.int64(len(xs))],
                        xs.sum(axis=0, dtype=np.int64),
                        tri,
                    )
                )
                yield pd.DataFrame(
                    {"pos": np.arange(len(vals), dtype=np.int64), "val": vals}
                )

    return moments


def _exact_moments(df: DataFrame, vec_col: str, dim: int):
    """(n, S1[d], T[d(d+1)/2]) as exact Python ints — the one corpus
    pass. Batch partials are int64; the cross-batch sum is
    Decimal(38,0) so no corpus size overflows it."""
    scaled = df.filter(F.col(vec_col).isNotNull()).select(
        F.transform(
            F.col(vec_col),
            lambda v: F.round(v.cast("double") * VEC_SCALE, 0).cast("long"),
        ).alias("svec")
    )
    rows = (
        scaled.mapInPandas(_moment_rows_factory(dim), "pos long, val long")
        .groupBy("pos")
        .agg(F.sum(F.col("val").cast("decimal(38,0)")).alias("val"))
        .collect()  # bounded: d(d+3)/2 + 1 rows, never corpus-sized
    )
    vals = {int(r["pos"]): int(r["val"]) for r in rows}
    n = vals.get(0, 0)
    s1 = [vals.get(1 + i, 0) for i in range(dim)]
    n_tri = dim * (dim + 1) // 2
    tri = [vals.get(1 + dim + t, 0) for t in range(n_tri)]
    return n, s1, tri


def _model_from_moments(
    n: int, s1: list[int], tri: list[int], dim: int, k: int
) -> PCAModel:
    """Driver-side: exact ints → float64 covariance → eigh → sign-fixed
    top-k model. Shared verbatim by the NumPy reference in test_pca.py,
    so the gate isolates the DISTRIBUTED part (the moment sums)."""
    if n < 2:
        raise ValueError("need at least 2 vectors to fit")
    s1_f = np.array(s1, dtype=np.float64)
    s2 = np.zeros((dim, dim), dtype=np.float64)
    iu = np.triu_indices(dim)
    s2[iu] = np.array(tri, dtype=np.float64)
    s2 = s2 + np.triu(s2, 1).T
    cov = (s2 - np.outer(s1_f, s1_f) / n) / (n - 1)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T  # (k, d)
    # deterministic sign: the largest-|coefficient| entry (first index
    # on exact ties) is made positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=s1_f / n / VEC_SCALE,
        components=comps,
        eigvals=w[order] / (VEC_SCALE * VEC_SCALE),
        n=int(n),
    )


def pca_fit(
    df: DataFrame, id_col: str, vec_col: str, dim: int, k: int
) -> PCAModel:
    """Fit a k-component PCA over ``vec_col`` (fixed length ``dim``,
    NULL vectors excluded) in one corpus pass. Deterministic and
    partition-invariant as an exact law — see module docstring."""
    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}]")
    n, s1, tri = _exact_moments(df, vec_col, dim)
    return _model_from_moments(n, s1, tri, dim, k)


def pca_transform(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    model: PCAModel,
    out_col: str = "pca",
) -> DataFrame:
    """(id, out_col array<double>): the projection (x − μ) @ Wᵀ as PURE
    JVM expressions — (x − μ)·wᵢ = x·wᵢ − μ·wᵢ, where μ·wᵢ folds to a
    literal, so each output component is one zip_with/aggregate dot
    product against the literal component row, entirely inside
    whole-stage codegen. Zero Python, zero Arrow crossing, zero shuffle
    (measured at 2M×64→8: 33.6 s as an Arrow-batched pandas UDF vs
    4–5 s as expressions — the UDF cost was the Arrow round-trip of
    every input vector, not the matmul). NULL vectors → NULL
    projections. Within ~1e-15 of the NumPy reference (sequential fold
    vs BLAS accumulation order — gated at 1e-12 in test_pca.py)."""
    comps = model.components  # (k, d)
    mean_dots = comps @ model.mean  # (k,) — fold μ·wᵢ into literals
    # stage the vector through its own projection: the k dot products
    # reference it k+1 times, and a CALLER-computed vector expression
    # would otherwise re-evaluate per reference (the shingle-staging
    # lesson; CollapseProject keeps multiply-referenced non-cheap
    # aliases staged)
    staged = df.select(F.col(id_col), F.col(vec_col).alias("_pv"))
    v = F.col("_pv")

    def dot_minus(i: int):
        w = F.array(*[F.lit(float(x)) for x in comps[i]])
        return (
            F.aggregate(
                F.zip_with(v, w, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            - F.lit(float(mean_dots[i]))
        )

    proj = F.when(
        v.isNotNull(),
        F.array(*[dot_minus(i) for i in range(comps.shape[0])]),
    )
    return staged.select(F.col(id_col), proj.alias(out_col))


# ---------------------------------------------------------------------------
# Incremental PCA — persisted exact moment state (SURVEY §2 op 130)
# ---------------------------------------------------------------------------
# The incremental column (ops 59/78/104/118/120) extended to PCA: because
# the fit consumes EXACT INTEGER moments, the stored state is just those
# integers, and updating with a new batch is integer ADDITION — so
# update-then-fit equals refit-over-everything BIT-FOR-BIT (not
# approximately: the law test_pca.py pins). No other incremental-PCA
# formulation (e.g. the streaming eigenvector updates in the literature)
# gets an exact law; this one does because the sufficient statistics are
# exact and tiny (d(d+3)/2 + 1 numbers), which is also why the state fits
# one parquet file at any corpus size.


def pca_state_write(
    df: DataFrame, id_col: str, vec_col: str, dim: int, path: str
) -> None:
    """Materialize the exact moment state for ``df`` under ``path``:
    ``moments/`` (pos, val DECIMAL(38,0)) + ``meta/`` (dim). One corpus
    pass (the pca_fit scan)."""
    path = str(path).rstrip("/")
    n, s1, tri = _exact_moments(df, vec_col, dim)
    _write_state(df.sparkSession, path, dim, n, s1, tri)


def _write_state(spark, path: str, dim: int, n, s1, tri) -> None:
    from decimal import Decimal

    vals = [n] + list(s1) + list(tri)
    rows = [(i, Decimal(int(v))) for i, v in enumerate(vals)]
    spark.createDataFrame(rows, "pos long, val decimal(38,0)").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/moments")
    spark.createDataFrame([(dim,)], "dim long").write.mode(
        "overwrite"
    ).parquet(f"{path}/meta")


def _read_state(spark, path: str):
    path = str(path).rstrip("/")
    dim = int(spark.read.parquet(f"{path}/meta").collect()[0]["dim"])
    rows = spark.read.parquet(f"{path}/moments").collect()
    vals = {int(r["pos"]): int(r["val"]) for r in rows}
    n = vals.get(0, 0)
    s1 = [vals.get(1 + i, 0) for i in range(dim)]
    n_tri = dim * (dim + 1) // 2
    tri = [vals.get(1 + dim + t, 0) for t in range(n_tri)]
    return dim, n, s1, tri


def pca_state_update(
    batch: DataFrame, id_col: str, vec_col: str, path: str
) -> None:
    """Fold a new batch into the stored state: ONE batch-sized moment
    pass + exact integer addition of two bounded vectors driver-side,
    then rewrite the (tiny) state. History vectors are never re-read —
    the op-78/104/118 incremental contract, here with a BIT-EXACT
    equivalence to the from-scratch fit instead of a row-equivalence."""
    spark = batch.sparkSession
    dim, n0, s1_0, tri0 = _read_state(spark, path)
    n1, s1_1, tri1 = _exact_moments(batch, vec_col, dim)
    _write_state(
        spark,
        path,
        dim,
        n0 + n1,
        [a + b for a, b in zip(s1_0, s1_1)],
        [a + b for a, b in zip(tri0, tri1)],
    )


def pca_fit_from_state(spark, path: str, k: int) -> PCAModel:
    """Model from the stored moments — zero corpus reads. After any
    sequence of updates, BIT-IDENTICAL to pca_fit over the union of
    everything folded in (the exact law)."""
    dim, n, s1, tri = _read_state(spark, path)
    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}]")
    return _model_from_moments(n, s1, tri, dim, k)
