"""Similarity search over embedding columns (north-star op; SURVEY §2.G 17).

Two tiers, as a large-scale pipeline needs both:

- ``knn_bruteforce``: exact cosine top-k for a bounded query set. The query
  side broadcasts; the candidate scan streams — no shuffle of the big side.
- ``rp_lsh_buckets`` / ``ann_topk_lsh``: random-hyperplane (sign) LSH — the
  scale path. Bucket assignment is a per-row projection (no shuffle); the
  candidate join is an equi-join on the bucket id, so cost is Σ bucket²
  instead of n². Hyperplane coefficients are ±1 derived from fixed integer
  arithmetic, so Spark and the DuckDB oracle build identical planes.

Determinism protocol (exact-integer, order-free): every vector is scaled
once to BIGINT components (round(x·1e6)). All dot products are integer
sums — associative and exact — so ANY execution order (NumPy vectorized
here, sequential list_reduce in the oracle) yields the same integers, and
cosine = dot / (√self_a · √self_b) derives from identical integers in
DOUBLE. This removes the float-reduction-order hazard entirely AND unlocks
the fast path: per-pair scoring runs as an Arrow-batched pandas UDF over
int64 NumPy arrays (vectorized C loops) instead of interpreted per-element
expression folds — the q34 95 s → seconds fix.

At 100 TB the pandas-UDF scoring stays the right shape: Arrow batches on
executors, no driver involvement, composes with the LSH bucket join that
bounds the candidate set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# Component scale: float32 embeddings keep ~6 significant decimals.
VEC_SCALE = 1_000_000

# Random-hyperplane LSH: NUM_PLANES sign bits → bucket in [0, 2**NUM_PLANES).
NUM_PLANES = 8
COEF_A = 1_000_003
COEF_B = 7_919
COEF_C = 13
COEF_MOD = 1_000_000_007


def scaled_vec(vec: Column) -> Column:
    """array<float> → array<bigint>: round(x·1e6). One pass per vector."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * VEC_SCALE, 0).cast("long")
    )


def self_dot(svec: Column) -> Column:
    """Σ v_i² over the scaled ints (exact; ≤ 64·(2²⁰)² ≪ 2⁶³)."""
    return F.aggregate(
        svec, F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )


@pandas_udf(DoubleType())
def _cosine_scaled(
    va: pd.Series, vb: pd.Series, na: pd.Series, nb: pd.Series
) -> pd.Series:
    """cosine from pre-scaled int vectors + precomputed self-dots.

    int64 einsum is exact (no BLAS float reordering), so the result is
    bit-deterministic and equal to the oracle's sequential integer fold.
    """
    a = np.stack(va.to_numpy())
    b = np.stack(vb.to_numpy())
    dots = np.einsum("ij,ij->i", a, b)
    denom = np.sqrt(na.to_numpy().astype(np.float64)) * np.sqrt(
        nb.to_numpy().astype(np.float64)
    )
    return pd.Series(dots.astype(np.float64) / denom)


def _prepped(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, scaled vector, self-dot): computed once per vector, staged so
    the scaling never re-runs per pair."""
    return df.select(
        F.col(id_col), scaled_vec(F.col(vec_col)).alias("svec")
    ).select(F.col(id_col), F.col("svec"), self_dot(F.col("svec")).alias("sdot"))


def _score_pairs(pairs: DataFrame) -> DataFrame:
    """Attach rounded cosine to (…, svec_q, sdot_q, svec_c, sdot_c) rows."""
    return pairs.withColumn(
        "cosine",
        F.round(
            _cosine_scaled(
                F.col("svec_q"), F.col("svec_c"), F.col("sdot_q"), F.col("sdot_c")
            ),
            4,
        ),
    )


def sql_scaled_vec(vec: str, dim: int) -> str:
    return (
        f"[CAST(round(CAST({vec}[i] AS DOUBLE) * {VEC_SCALE}, 0) AS BIGINT) "
        f"for i in range(1, {dim + 1})]"
    )


def sql_cosine_scaled(sa: str, sb: str, dim: int) -> str:
    """Oracle mirror: sequential integer folds over the same scaled ints."""
    dot = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"[{sa}[i] * {sb}[i] for i in range(1, {dim + 1})]), (x, y) -> x + y)"
    )
    na = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"[{sa}[i] * {sa}[i] for i in range(1, {dim + 1})]), (x, y) -> x + y)"
    )
    nb = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"[{sb}[i] * {sb}[i] for i in range(1, {dim + 1})]), (x, y) -> x + y)"
    )
    return (
        f"(CAST({dot} AS DOUBLE) / (sqrt(CAST({na} AS DOUBLE)) * "
        f"sqrt(CAST({nb} AS DOUBLE))))"
    )


def _plane_dot(svec: Column, j: int) -> Column:
    """⟨scaled vec, plane_j⟩ with plane_j[i] = ±1 from the coefficient hash.
    Integer sum — exact and order-free."""

    def term(i: Column) -> Column:
        coef = F.when(
            ((F.lit(j * COEF_A) + i * COEF_B + COEF_C) % COEF_MOD) % 2 == 0, 1
        ).otherwise(-1)
        return F.element_at(svec, i) * coef

    return F.aggregate(
        F.transform(F.sequence(F.lit(1), F.size(svec)), term),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sql_plane_dot(svec: str, j: int, dim: int) -> str:
    """DuckDB mirror of :func:`_plane_dot` (same coefs, integer sum)."""
    coef = (
        f"(CASE WHEN (({j} * {COEF_A} + i * {COEF_B} + {COEF_C}) % {COEF_MOD}) % 2 = 0 "
        f"THEN 1 ELSE -1 END)"
    )
    prods = f"[{svec}[i] * {coef} for i in range(1, {dim + 1})]"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {prods}), (x, y) -> x + y)"
    )


def rp_lsh_buckets(
    df: DataFrame, id_col: str, vec_col: str, num_planes: int = NUM_PLANES
) -> DataFrame:
    """(id, bucket): sign-LSH bucket id. Pure projection — scales linearly."""
    prepped = df.select(F.col(id_col), scaled_vec(F.col(vec_col)).alias("svec"))
    bucket = F.lit(0).cast("long")
    for j in range(num_planes):
        bucket = bucket + F.when(
            _plane_dot(F.col("svec"), j) > 0, F.lit(2**j).cast("long")
        ).otherwise(F.lit(0))
    return prepped.select(F.col(id_col), bucket.alias("bucket"))


def knn_bruteforce(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids_below: int,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: broadcast the bounded query set against the full
    candidate scan; rank with a deterministic tie-break on candidate id."""
    prepped = _prepped(df, id_col, vec_col)
    q = prepped.filter(F.col(id_col) < query_ids_below).select(
        F.col(id_col).alias("query_id"),
        F.col("svec").alias("svec_q"),
        F.col("sdot").alias("sdot_q"),
    )
    c = prepped.select(
        F.col(id_col).alias("cand_id"),
        F.col("svec").alias("svec_c"),
        F.col("sdot").alias("sdot_c"),
    )
    pairs = F.broadcast(q).join(c, F.col("query_id") != F.col("cand_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        _score_pairs(pairs)
        .select("query_id", "cand_id", "cosine")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def ann_topk_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    num_planes: int = NUM_PLANES,
) -> DataFrame:
    """Approximate top-k per vector: candidates = same LSH bucket only.

    The self-join keys on the bucket id, so the pair count is Σ|bucket|²
    rather than n² — the 100 TB path. Recall tunes via num_planes.
    """
    prepped = rp_lsh_buckets(df, id_col, vec_col, num_planes).join(
        _prepped(df, id_col, vec_col), id_col
    )
    left = prepped.select(
        F.col("bucket"),
        F.col(id_col).alias("query_id"),
        F.col("svec").alias("svec_q"),
        F.col("sdot").alias("sdot_q"),
    )
    right = prepped.select(
        F.col("bucket").alias("bucket_r"),
        F.col(id_col).alias("cand_id"),
        F.col("svec").alias("svec_c"),
        F.col("sdot").alias("sdot_c"),
    )
    pairs = left.join(
        right,
        (left.bucket == right.bucket_r) & (F.col("query_id") != F.col("cand_id")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        _score_pairs(pairs)
        .select("query_id", "cand_id", "cosine")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    bucketed: bool = False,
    num_planes: int = NUM_PLANES,
) -> DataFrame:
    """Pairs (a < b) with cosine ≥ threshold — embedding near-dup dedup.

    ``bucketed=False``: exact all-pairs via a non-equi (nested-loop) join —
    O(n²), only for bounded inputs (fixture parity, small dedup batches).

    ``bucketed=True`` — the 100 TB path: compose :func:`rp_lsh_buckets` so
    pair generation is an *equi-join on the bucket id* (cost Σ|bucket|²,
    same shape as :func:`ann_topk_lsh`). Approximate: a near-dup pair whose
    vectors land in different sign-LSH buckets is missed; recall tunes via
    ``num_planes`` (fewer planes → bigger buckets → higher recall, more
    candidates). Each vector has exactly one bucket, so no pair dedup is
    needed afterwards.
    """
    prepped = _prepped(df, id_col, vec_col)
    if bucketed:
        prepped = rp_lsh_buckets(df, id_col, vec_col, num_planes).join(
            prepped, id_col
        )
        a = prepped.select(
            F.col("bucket"),
            F.col(id_col).alias("id_a"),
            F.col("svec").alias("svec_q"),
            F.col("sdot").alias("sdot_q"),
        )
        b = prepped.select(
            F.col("bucket").alias("bucket_r"),
            F.col(id_col).alias("id_b"),
            F.col("svec").alias("svec_c"),
            F.col("sdot").alias("sdot_c"),
        )
        pairs = a.join(
            b,
            (a.bucket == b.bucket_r) & (F.col("id_a") < F.col("id_b")),
        )
    else:
        a = prepped.select(
            F.col(id_col).alias("id_a"),
            F.col("svec").alias("svec_q"),
            F.col("sdot").alias("sdot_q"),
        )
        b = prepped.select(
            F.col(id_col).alias("id_b"),
            F.col("svec").alias("svec_c"),
            F.col("sdot").alias("sdot_c"),
        )
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        _score_pairs(pairs)
        .select("id_a", "id_b", "cosine")
        .filter(F.col("cosine") >= threshold)
    )
