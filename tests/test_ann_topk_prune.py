"""Per-bucket top-k pruning parity (round-12 optimization).

The ANN scoring UDF now emits, per query row within a bucket, only
candidates within a tie-safe margin of the row's k-th largest exact
cosine (see _group_cosine_pairs). These gates pin that the pruned
stream still yields the IDENTICAL final top-k after the JVM's
4-decimal round + (cosine desc, cand_id asc) ranking — on the fixture
tables and on a tie-dense synthetic built from coarsely quantized
vectors (many exact-cosine collisions, the worst case for any
pre-round pruning).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.similarity import (
    NUM_PLANES,
    _bucket_pairs,
    ann_topk_lsh,
    ann_topk_multitable,
)
from tests.conftest import SF_T2


def _rank_unpruned(pairs, k):
    """The pre-round-12 JVM ranking over the UNPRUNED pair stream."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        pairs.select(
            F.col("id_a").alias("query_id"),
            F.col("id_b").alias("cand_id"),
            F.round(F.col("cosine"), 4).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _tie_dense_vectors(spark, n=240, dim=8):
    """Coarse integer vectors from a tiny alphabet: cosine collisions
    (exact AND 4-dp-rounded) are abundant, so the top-k boundary is
    crossed by ties and the margin logic is actually exercised."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [float(rng.choice((0.0, 0.5, 1.0))) for _ in range(dim)])
        for i in range(n)
    ]
    # zero vectors would make cosine NaN on both paths; keep them out
    rows = [(i, v) for i, v in rows if any(x != 0.0 for x in v)]
    return spark.createDataFrame(rows, "id long, vec array<float>")


def test_ann_topk_lsh_prune_parity_fixture(spark):
    emb = spark.read.parquet(f"{SF_T2}/embeddings.parquet")
    got = _rows(ann_topk_lsh(emb, "vec_id", "embedding", k=3))
    unpruned = _bucket_pairs(
        emb, "vec_id", "embedding", NUM_PLANES, ordered=True
    )
    want = _rows(_rank_unpruned(unpruned, 3))
    assert got == want


def test_ann_topk_lsh_prune_parity_tie_dense(spark):
    df = _tie_dense_vectors(spark)
    for k in (1, 3, 7):
        got = _rows(ann_topk_lsh(df, "id", "vec", k=k))
        unpruned = _bucket_pairs(df, "id", "vec", NUM_PLANES, ordered=True)
        want = _rows(_rank_unpruned(unpruned, k))
        assert got == want, f"k={k}"


def test_ann_topk_multitable_prune_parity_tie_dense(spark):
    df = _tie_dense_vectors(spark, n=180)
    got = _rows(ann_topk_multitable(df, "id", "vec", k=3, n_tables=2))
    # unpruned reference: same plan with the pruning disabled via a huge k
    # is not equivalent (k feeds the final window too), so rebuild the
    # stream by hand: buckets from both tables, all pairs, distinct, rank.
    from dwca_parquet_spark.operators.similarity import (
        _GROUP_PAIRS_SCHEMA,
        _buckets_udf_multi,
        _group_cosine_pairs,
        scaled_vec,
    )

    exploded = (
        df.select(F.col("id").alias("_gid"), scaled_vec(F.col("vec")).alias("svec"))
        .withColumn("_bkts", _buckets_udf_multi(NUM_PLANES, 2)(F.col("svec")))
        .select("_gid", "svec", F.posexplode("_bkts").alias("_table", "bucket"))
    )
    unpruned = (
        exploded.groupBy("_table", "bucket")
        .applyInPandas(
            lambda pdf: _group_cosine_pairs(pdf, ordered=True),
            _GROUP_PAIRS_SCHEMA,
        )
        .distinct()
    )
    want = _rows(_rank_unpruned(unpruned, 3))
    assert got == want


def _with_zero_vectors(spark, n=120, dim=8, n_zero=5):
    """Tie-dense corpus plus zero-norm vectors (failed embeddings):
    their cosines are NaN, which crosses Arrow as NULL — Spark then
    ranks them LAST under `desc` (nulls-last) and drops them at `>=`
    filters. The round-13 ADVICE case: the pruning masks must reproduce
    that fate exactly instead of letting NaN poison np.partition."""
    import random

    rng = random.Random(11)
    rows = [
        (i, [float(rng.choice((0.0, 0.5, 1.0))) for _ in range(dim)])
        for i in range(n)
    ]
    rows = [(i, v) for i, v in rows if any(x != 0.0 for x in v)]
    rows += [(1000 + j, [0.0] * dim) for j in range(n_zero)]
    return spark.createDataFrame(rows, "id long, vec array<float>")


def test_ann_topk_prune_parity_zero_norm_vectors(spark):
    df = _with_zero_vectors(spark)
    for k in (1, 3):
        got = _rows(ann_topk_lsh(df, "id", "vec", k=k))
        unpruned = _bucket_pairs(df, "id", "vec", NUM_PLANES, ordered=True)
        want = _rows(_rank_unpruned(unpruned, k))
        assert got == want, f"k={k}"


def test_neardup_min_cosine_parity_zero_norm_vectors(spark):
    from dwca_parquet_spark.operators.similarity import embedding_neardup_pairs

    df = _with_zero_vectors(spark)
    for thr in (0.5, 0.9):
        got = _rows(
            embedding_neardup_pairs(df, "id", "vec", threshold=thr, bucketed=True)
        )
        unpruned = _bucket_pairs(df, "id", "vec", NUM_PLANES, ordered=False)
        want = _rows(
            unpruned.select(
                "id_a", "id_b", F.round(F.col("cosine"), 4).alias("cosine")
            ).filter(F.col("cosine") >= thr)
        )
        assert got == want, f"thr={thr}"
        # zero-norm pairs appear in NEITHER stream (NULL fails `>=`)
        assert not any(a >= 1000 or b >= 1000 for a, b, _ in got)
