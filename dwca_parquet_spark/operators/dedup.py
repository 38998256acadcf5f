"""Deduplication operators (north-star; generalizes reference set() dedup,
``/root/reference/src/dwca_parquet/libs/csw.py:91,98``).

Four families, all shuffle-conscious:

- exact: hash-groupBy on a normalized-text fingerprint. One shuffle on the
  hash; at 100 TB this is the canonical map-side-combinable aggregation.
- MinHash + LSH banding: shingle → portable hash → explode → ONE groupBy
  computing all k min-aggregates (map-side combine ⇒ the shuffle carries at
  most k values per doc, not the shingle stream) → band buckets → bucket
  self-join for candidates → exact Jaccard verify. Candidate generation is
  O(pairs-sharing-a-bucket), never O(n²).
- SimHash: same exploded shape, 32 conditional-sum aggregates → 32-bit
  fingerprint; near-dups collide on fingerprint (or low Hamming distance).
- n-gram Jaccard: exact set similarity on shingle-hash arrays — used both
  standalone (bounded candidate sets) and as the LSH verify stage.

Embedding-based near-dup lives in operators/similarity.py.

The hash arithmetic is engine-portable (functions/hashing.py) so every
operator here is verified against a DuckDB oracle computing the identical
signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dwca_parquet_spark.functions import hashing as H


def text_key(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """id + normalized-text rolling hash (the exact-dedup key).

    Staged projections (normalize → hash) so the regex normalization runs
    once per row — inlining it under the fold lambda re-evaluates it per
    character (the q29 13.5s→sub-second lesson; see functions/hashing.py).
    """
    return df.select(
        F.col(id_col), H.normalize_text(F.col(text_col)).alias("_norm")
    ).select(F.col(id_col), H.poly_hash(F.col("_norm")).alias("text_hash"))


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup groups: canonical (min) id + multiplicity per text hash."""
    return (
        text_key(df, id_col, text_col)
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingle_hash_table(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(id, array<distinct shingle hashes>) — the input relation for MinHash,
    SimHash and Jaccard. Computed once and reused by composition.

    Three staged projections (normalize → codepoints → shingle hashes):
    each stage's result is referenced multiple times by the next, which
    stops CollapseProject from inlining and re-running the regexes/split
    per shingle.
    """
    return (
        df.select(F.col(id_col), H.normalize_text(F.col(text_col)).alias("_norm"))
        .select(F.col(id_col), H.char_codes(F.col("_norm")).alias("_codes"))
        .select(
            F.col(id_col),
            H.shingle_hashes_from_codes(F.col("_codes"), k).alias("hashes"),
        )
    )


def minhash_signatures(sh: DataFrame, id_col: str) -> DataFrame:
    """MinHash signature columns mh0..mh{k-1} via explode + one aggregation.

    Exploding then aggregating beats per-row array lambdas twice over: the
    16 ``min`` aggregates map-side-combine (tiny shuffle), and codegen stays
    small instead of inlining the shingle pipeline 16×.
    """
    exploded = sh.select(F.col(id_col), F.explode("hashes").alias("h"))
    aggs = []
    for j in range(H.MINHASH_K):
        a, b = H._minhash_ab(j)
        aggs.append(F.min((F.col("h") * a + b) % H.MINHASH_P).alias(f"mh{j}"))
    return exploded.groupBy(id_col).agg(*aggs)


def band_bucket_table(sigs: DataFrame, id_col: str) -> DataFrame:
    """(id, band, bucket): one row per LSH band, bucket = folded band hash."""
    bands = []
    for band in range(H.MINHASH_BANDS):
        lo = band * H.MINHASH_ROWS_PER_BAND
        expr = F.lit(0).cast("long")
        for r in range(lo, lo + H.MINHASH_ROWS_PER_BAND):
            expr = (expr * H.HASH_BASE + F.col(f"mh{r}")) % H.HASH_MOD
        bands.append(F.struct(F.lit(band).alias("band"), expr.alias("bucket")))
    return sigs.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def jaccard(a: str, b: str) -> F.Column:
    """|A∩B| / |A∪B| over distinct-element arrays, via the union-free form
    |I|/(|A|+|B|−|I|) so the oracle computes the identical float."""
    inter = F.size(F.array_intersect(F.col(a), F.col(b))).cast("double")
    return inter / (
        F.size(F.col(a)).cast("double") + F.size(F.col(b)).cast("double") - inter
    )


def minhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH candidate pairs verified by exact shingle Jaccard ≥ threshold.

    Returns (id_a, id_b, jaccard) with id_a < id_b. The bucket self-join is
    an equi-join on (band, bucket) — shuffled on the bucket key, so skew only
    arises from degenerate buckets (e.g. many empty docs); candidates are
    deduplicated before the verify join.
    """
    sh = shingle_hash_table(df, id_col, text_col, k)
    buckets = band_bucket_table(minhash_signatures(sh, id_col), id_col)
    left = buckets.alias("l")
    right = buckets.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sh_a = sh.select(
        F.col(id_col).alias("id_a"), F.col("hashes").alias("hashes_a")
    )
    sh_b = sh.select(
        F.col(id_col).alias("id_b"), F.col("hashes").alias("hashes_b")
    )
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard("hashes_a", "hashes_b"), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """32-bit SimHash per document via explode + 32 conditional sums.

    All 32 bit-votes aggregate in ONE pass over the exploded shingle stream
    (single shuffle, map-side combined), then the fingerprint folds together
    arithmetically in the projection.
    """
    sh = shingle_hash_table(df, id_col, text_col, k)
    exploded = sh.select(F.col(id_col), F.explode("hashes").alias("h"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"s{i}")
        for i in range(32)
    ]
    votes = exploded.groupBy(id_col).agg(*aggs)
    fp = F.lit(0).cast("long")
    for i in range(32):
        fp = fp + F.when(F.col(f"s{i}") > 0, F.lit(2**i).cast("long")).otherwise(
            F.lit(0)
        )
    return votes.select(F.col(id_col), fp.alias("simhash"))


def ngram_jaccard_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_ids_below: int,
    topk: int = 1,
    k: int = 3,
) -> DataFrame:
    """For each query doc (id < query_ids_below): top-k most-similar other
    docs by exact shingle Jaccard. Brute-force over a bounded query set —
    the scale path is minhash_dup_pairs / LSH; this is the exact baseline."""
    sh = shingle_hash_table(df, id_col, text_col, k)
    q = sh.filter(F.col(id_col) < query_ids_below).select(
        F.col(id_col).alias("query_id"), F.col("hashes").alias("hashes_q")
    )
    c = sh.select(F.col(id_col).alias("cand_id"), F.col("hashes").alias("hashes_c"))
    pairs = F.broadcast(q).join(c, F.col("query_id") != F.col("cand_id")).select(
        "query_id",
        "cand_id",
        F.round(jaccard("hashes_q", "hashes_c"), 6).alias("jaccard"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("jaccard").desc(), F.col("cand_id").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .drop("rn")
    )
