"""Training-shard export: deterministic shuffled shards + a verifiable
manifest (SURVEY §2 round-5 extension).

The last mile of the pipeline: a data-parallel training job wants the
corpus as N shards where (a) every shard is an unbiased random slice,
(b) shard contents and order are REPRODUCIBLE from (data, seed, N)
alone, and (c) a loader can verify it got exactly what the pipeline
wrote. This sink composes the engine's own primitives:

- shard/order come from :func:`~dwca_parquet_spark.operators.sampling.
  global_shuffle` (seeded quadratic-mix permutation; shard = key mod N,
  unbiased and balanced in expectation);
- the write is one hash-partitioned pass, ``partitionBy("shard")``
  directories, rows pre-sorted by the shuffle key so each shard file
  inherits the global shuffled order;
- the manifest records per shard: doc count, token count, and an
  ORDER-FREE integer checksum (sum over rows of poly_hash(key ‖ token
  count) mod 2⁶³ — associative, so any reader can recompute it in any
  order, any engine).

``verify_shards`` re-derives every manifest row from the written files
and fails loudly on any mismatch — the loader-side contract check.

Scale: one shuffle for the shard partitioning (the write's own), one
combinable aggregate for the manifest. Nothing driver-side beyond the
N-row manifest.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwca_parquet_spark.functions import hashing as H
from dwca_parquet_spark.operators.sampling import global_shuffle
from dwca_parquet_spark.operators.text import token_count

CHECK_MOD = 2**63 - 25  # largest prime < 2^63: sums stay in BIGINT


def _row_check(key, n_tok):
    return F.pmod(
        H.poly_hash(F.concat(key.cast("string"), F.lit("|"), n_tok.cast("string"))),
        F.lit(CHECK_MOD),
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str | Path,
    key_col: str,
    text_col: str,
    n_shards: int,
    seed: str = "",
) -> DataFrame:
    """Write ``out_dir/data/shard=i/*.parquet`` + ``out_dir/manifest``;
    returns the manifest DataFrame (shard, n_docs, n_tokens, checksum)."""
    out = str(out_dir)
    shuffled = global_shuffle(df, key_col, seed=seed, n_shards=n_shards)
    staged = (
        shuffled.withColumn("n_tokens", token_count(F.col(text_col)))
        .withColumn("_chk", _row_check(F.col(key_col), F.col("n_tokens")))
        .persist()  # referenced twice (write + manifest) — without this
        # the manifest pass re-runs the whole sort + token count
    )
    # one task set per shard; rows arrive in shuffle_key order per file
    (
        staged.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_key", key_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out + "/data")
    )
    manifest = (
        staged.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.pmod(F.sum("_chk"), F.lit(CHECK_MOD)).alias("checksum"),
        )
        .orderBy("shard")
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(out + "/manifest")
    staged.unpersist()  # both actions have executed by here
    return spark_read_manifest(df.sparkSession, out)


def spark_read_manifest(spark: SparkSession, out_dir: str | Path) -> DataFrame:
    return spark.read.parquet(str(out_dir) + "/manifest").orderBy("shard")


def verify_shards(
    spark: SparkSession, out_dir: str | Path, key_col: str
) -> DataFrame:
    """Recompute every manifest row from the written shard files; returns
    rows that MISMATCH (empty = verified). The loader-side check: counts,
    token sums, and the order-free checksum must all re-derive."""
    out = str(out_dir)
    data = spark.read.parquet(out + "/data")
    recomputed = (
        data.withColumn(
            "_chk", _row_check(F.col(key_col), F.col("n_tokens"))
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs_r"),
            F.sum("n_tokens").alias("n_tokens_r"),
            F.pmod(F.sum("_chk"), F.lit(CHECK_MOD)).alias("checksum_r"),
        )
    )
    manifest = spark.read.parquet(out + "/manifest")
    return (
        manifest.join(recomputed, "shard", "full")
        .filter(
            ~(
                (F.col("n_docs") == F.col("n_docs_r"))
                & (F.col("n_tokens") == F.col("n_tokens_r"))
                & (F.col("checksum") == F.col("checksum_r"))
            )
            | F.col("n_docs").isNull()
            | F.col("n_docs_r").isNull()
        )
    )
