"""Similarity search over embedding columns (north-star op; SURVEY §2.G 17).

Two tiers, as a large-scale pipeline needs both:

- ``knn_bruteforce``: exact cosine top-k for a bounded query set. The query
  side broadcasts; the candidate scan streams — no shuffle of the big side.
  This is the correctness baseline and the right tool when |queries| is small.
- ``rp_lsh_buckets`` / ``ann_topk_lsh``: random-hyperplane (sign) LSH — the
  scale path. Bucket assignment is a per-row projection (no shuffle); the
  candidate join is an equi-join on the bucket id, so cost is Σ bucket²
  instead of n². Hyperplane coefficients are ±1 derived from fixed integer
  arithmetic, so Spark and the DuckDB oracle build the identical planes
  (no RNG, reproducible across engines and runs — the determinism protocol
  from SURVEY §2.G).

All dot products fold left-to-right in DOUBLE (functions/vectors.py) and are
rounded before ranking, so ordering is engine-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dwca_parquet_spark.functions import vectors as V

# Random-hyperplane LSH: NUM_PLANES sign bits → bucket in [0, 2**NUM_PLANES).
NUM_PLANES = 8
# coef(j, i) ∈ {+1, −1} from fixed integer arithmetic — identical in SQL.
COEF_A = 1_000_003
COEF_B = 7_919
COEF_C = 13
COEF_MOD = 1_000_000_007


def _plane_dot(vec: Column, j: int) -> Column:
    """⟨vec, plane_j⟩ where plane_j[i] = ±1 from the fixed coefficient hash."""

    def term(i: Column) -> Column:
        coef = F.when(
            ((F.lit(j * COEF_A) + i * COEF_B + COEF_C) % COEF_MOD) % 2 == 0, 1.0
        ).otherwise(-1.0)
        return F.element_at(vec, i).cast("double") * coef

    return F.aggregate(
        F.transform(F.sequence(F.lit(1), F.size(vec)), term),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sql_plane_dot(vec: str, j: int, dim: int) -> str:
    """DuckDB mirror of :func:`_plane_dot` (same fold order, same coefs)."""
    coef = (
        f"(CASE WHEN (({j} * {COEF_A} + i * {COEF_B} + {COEF_C}) % {COEF_MOD}) % 2 = 0 "
        f"THEN 1.0 ELSE -1.0 END)"
    )
    prods = f"[CAST({vec}[i] AS DOUBLE) * {coef} for i in range(1, {dim + 1})]"
    return f"list_reduce(list_prepend(0.0, {prods}), (x, y) -> x + y)"


def rp_lsh_buckets(
    df: DataFrame, id_col: str, vec_col: str, num_planes: int = NUM_PLANES
) -> DataFrame:
    """(id, bucket): sign-LSH bucket id. Pure projection — scales linearly."""
    bucket = F.lit(0).cast("long")
    for j in range(num_planes):
        bucket = bucket + F.when(
            _plane_dot(F.col(vec_col), j) > 0, F.lit(2**j).cast("long")
        ).otherwise(F.lit(0))
    return df.select(F.col(id_col), bucket.alias("bucket"))


def knn_bruteforce(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids_below: int,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: broadcast the bounded query set against the full
    candidate scan; rank with a deterministic tie-break on candidate id."""
    q = df.filter(F.col(id_col) < query_ids_below).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("vec_q")
    )
    c = df.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("vec_c"))
    pairs = F.broadcast(q).join(c, F.col("query_id") != F.col("cand_id")).select(
        "query_id",
        "cand_id",
        F.round(V.cosine(F.col("vec_q"), F.col("vec_c")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
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
    rather than n² — the 100 TB path. Recall is tunable via num_planes
    (fewer planes → bigger buckets → higher recall, more compute).
    """
    with_bucket = rp_lsh_buckets(df, id_col, vec_col, num_planes).join(
        df.select(id_col, vec_col), id_col
    )
    left = with_bucket.select(
        F.col("bucket"),
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("vec_q"),
    )
    right = with_bucket.select(
        F.col("bucket"),
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("vec_c"),
    )
    pairs = left.join(
        right, (left.bucket == right.bucket) & (F.col("query_id") != F.col("cand_id"))
    ).select(
        "query_id",
        "cand_id",
        F.round(V.cosine(F.col("vec_q"), F.col("vec_c")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def embedding_neardup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.9
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold — embedding near-dup dedup.

    Exact form for fixture scale; at 100 TB compose rp_lsh_buckets first so
    the pair generation keys on buckets (same shape as ann_topk_lsh).
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(V.cosine(F.col("vec_a"), F.col("vec_b")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
