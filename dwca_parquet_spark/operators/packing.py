"""Training-shard packing and data-mixture operators.

Two operations every pretraining data pipeline runs after filtering/dedup:

- :func:`pack_documents` — assign each document to a fixed-token-budget
  training shard, deterministically, so shard N always holds the same docs
  on any engine/partitioning/day. The assignment is a global exclusive
  prefix sum of per-doc token counts over a canonical document order,
  divided by the budget.
- :func:`mix_sources` — rebalance the corpus so the OUTPUT token mix per
  source matches target weights (e.g. books .3 / web .6 / code .1), keeping
  as much data as the binding source allows. Composes a bounded
  per-source-totals aggregate with the deterministic
  :func:`~dwca_parquet_spark.operators.sampling.stratified_sample`.

The reference has no training-pipeline surface (its one query is
``/root/reference/src/dwca_parquet/templates/query.sql:1-5``); these extend
the SURVEY §2 LLM-pipeline family alongside dedup/sampling/decontamination.

Scale design (100 TB):

- A naive global prefix sum is a single-partition window — a non-starter.
  :func:`pack_documents` uses the classic two-level scan: per-bucket
  cumulative sums in parallel (one shuffle on ``n_buckets`` keys, each
  bucket ~|rows|/n_buckets), plus a bucket-offset table of exactly
  ``n_buckets`` rows whose own prefix sum and broadcast join are O(buckets),
  not O(rows). Canonical order is (bucket, portable_hash, id) — hash order,
  so shard fill is skew-free regardless of input order.
- :func:`mix_plan` collects one row per SOURCE (corpora have tens of
  sources, not millions — bounded by contract, like the IVF centroid
  collect). The applied filter is a pure per-row projection via
  ``stratified_sample`` — zero extra shuffle, commutes with pushdown.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dwca_parquet_spark.functions import hashing as H
from dwca_parquet_spark.operators import text as T
from dwca_parquet_spark.operators.sampling import (
    SAMPLE_MOD,
    stratified_sample,
)

PACK_BUCKETS = 256


def pack_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget_tokens: int,
    n_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Deterministic token-budget shard assignment.

    Returns (id, doc_tokens, shard_id) where ``shard_id =
    floor(exclusive_prefix_tokens / budget_tokens)`` over the canonical
    order (hash-bucket, portable-hash, id). A document is placed in the
    shard where its first token lands (documents are not split), so every
    shard except the last carries ≥ budget and < budget + max_doc tokens.

    Two-level prefix sum: stage 1 computes in-bucket inclusive cumsums
    under a window partitioned by bucket (parallel across ``n_buckets``
    reducers); stage 2 computes each bucket's starting offset from the
    n_buckets-row per-bucket totals (a one-partition window over
    ``n_buckets`` rows — O(buckets), deliberately tiny) and broadcast-joins
    it back.
    """
    idc, b, h = F.col(id_col), F.col("_bucket"), F.col("_h")
    base = df.select(
        idc.alias(id_col),
        T.token_count(F.col(text_col)).alias("doc_tokens"),
        H.poly_hash(idc.cast("string")).alias("_h"),
    ).withColumn("_bucket", F.pmod(h, F.lit(n_buckets)))

    w_in = (
        Window.partitionBy("_bucket")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.withColumn("_cum_in", F.sum("doc_tokens").over(w_in))

    offsets = (
        base.groupBy("_bucket")
        .agg(F.sum("doc_tokens").alias("_btot"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_btot").over(
                    Window.orderBy("_bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_bucket", "_offset")
    )

    return (
        cum.join(F.broadcast(offsets), "_bucket")
        .select(
            id_col,
            "doc_tokens",
            F.floor(
                (F.col("_offset") + F.col("_cum_in") - F.col("doc_tokens"))
                / F.lit(budget_tokens)
            )
            .cast("long")
            .alias("shard_id"),
        )
    )


def sql_pack_documents(
    id_expr: str,
    text_expr: str,
    budget_tokens: int,
    n_buckets: int = PACK_BUCKETS,
    source: str = "documents",
) -> str:
    """DuckDB oracle computing the identical shard assignment.

    Single global window — correct and simple at oracle scale; the Spark
    side's two-level scan is proved equivalent against this by the
    differential tests."""
    norm = H.sql_normalize_text(text_expr)
    tok = (
        f"CASE WHEN length({norm}) = 0 THEN 0 "
        f"ELSE len(string_split_regex({norm}, '\\s+')) END"
    )
    h = H.sql_poly_hash(f"CAST({id_expr} AS VARCHAR)")
    return f"""
    WITH t AS (
        SELECT {id_expr} AS id, CAST({tok} AS BIGINT) AS doc_tokens,
               {h} AS h
        FROM {source}
    )
    SELECT id AS {id_expr}, doc_tokens,
           CAST(floor(
               coalesce(sum(doc_tokens) OVER (
                   ORDER BY h % {n_buckets}, h, id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {budget_tokens}) AS BIGINT) AS shard_id
    FROM t
    """


def mix_plan(
    df: DataFrame,
    source_col: str,
    text_col: str,
    weights: dict[str, float],
) -> dict[str, float]:
    """Per-source keep-fractions that hit the target token mix.

    Given per-source token totals ``T_s`` and target weights ``w_s``
    (need not sum to 1 — they are normalized), the largest achievable
    output size is ``K = min_s T_s / w_s`` tokens; source *s* must then
    contribute ``w_s · K`` tokens, i.e. keep fraction ``w_s · K / T_s``
    (exactly 1.0 for the binding source). Fractions are floored to ppm —
    the resolution of the sampling hash — so the Spark filter and any SQL
    mirror built from this plan use identical integer thresholds.

    One map-side-combinable aggregate; collects one row per source
    (bounded by contract — a corpus has tens of sources).
    """
    wsum = sum(weights.values())
    norm_w = {s: w / wsum for s, w in weights.items() if w > 0}
    totals = {
        r["s"]: r["toks"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.sum(T.token_count(F.col(text_col))).alias("toks"))
        .collect()
        if r["s"] in norm_w
    }
    missing = set(norm_w) - set(totals)
    if missing:
        raise ValueError(f"weighted sources absent from data: {sorted(missing)}")
    k = min(totals[s] / w for s, w in norm_w.items())
    return {
        s: math.floor(min(1.0, norm_w[s] * k / totals[s]) * SAMPLE_MOD)
        / SAMPLE_MOD
        for s in norm_w
    }


def mix_sources(
    df: DataFrame,
    source_col: str,
    key_col: str,
    text_col: str,
    weights: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Filter to a deterministic sample whose token mix per source matches
    ``weights``. Sources with no weight are dropped. Sampling is by
    document (the unit a training pipeline keeps or drops), so the
    achieved token mix converges to the target as 1/√docs per source."""
    return stratified_sample(
        df,
        source_col,
        key_col,
        mix_plan(df, source_col, text_col, weights),
        default_fraction=0.0,
        salt=salt,
    )


def temperature_weights(
    df: DataFrame,
    source_col: str,
    text_col: str,
    tau: float = 2.0,
) -> dict[str, float]:
    """Temperature-sampling target weights from the corpus itself —
    ``w_s ∝ p_s^(1/τ)`` over the observed per-source token shares
    ``p_s`` (the standard multilingual/multi-source rebalancing rule:
    τ > 1 upweights low-resource sources toward uniform, τ = 1
    reproduces the natural mix, τ → ∞ → uniform).

    Returns a weights dict for :func:`mix_plan`/:func:`mix_sources`.
    Driver-side floats never cross an engine boundary: mix_plan floors
    the resulting fractions to ppm, and the sampling itself is the
    integer-threshold stratified filter — so an oracle reproduces
    membership exactly from the same plan. One map-side-combinable
    aggregate, one row per source.
    """
    if tau <= 0:
        raise ValueError("tau must be > 0")
    totals = {
        r["s"]: r["toks"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.sum(T.token_count(F.col(text_col))).alias("toks"))
        .collect()
        if r["toks"]
    }
    grand = sum(totals.values())
    return {s: (t / grand) ** (1.0 / tau) for s, t in totals.items()}


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int,
    overlap: int = 0,
    n_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Fixed-length training-SEQUENCE packing: chunk every document to
    ≤ seq_len tokens (text.chunk_documents), then next-fit-pack chunks
    into sequences that never exceed ``seq_len`` — the step that turns a
    curated corpus into the (sequence, position) layout a trainer
    consumes, with padding waste made measurable instead of implicit.

    Unlike :func:`pack_documents` (shards may overflow by one document —
    fine for files), a training sequence is a HARD budget: a chunk that
    does not fit starts the next sequence. Next-fit is inherently
    sequential, so the distributed shape is the two-level pattern run the
    other way around: hash-bucket the chunks (parallel), run the exact
    sequential next-fit INSIDE each bucket as one Arrow-batched
    applyInPandas pass over the bucket's canonically-ordered chunks, and
    namespace sequence ids by bucket — no global coordination, identical
    output under any partitioning. Since every chunk ≤ seq_len, next-fit
    wastes less than one chunk per sequence → utilization > 50% by
    construction (in practice ~90%+; see test).

    Output: (id, chunk_idx, n_chunk_tokens, seq_id, seq_pos) where
    seq_pos is the chunk's token offset inside its sequence.
    """
    import pandas as pd

    from dwca_parquet_spark.operators import text as T2

    chunks = T2.chunk_documents(df, id_col, text_col, seq_len, overlap)
    keyed = chunks.select(
        F.col(id_col),
        "chunk_idx",
        "n_chunk_tokens",
        H.poly_hash(F.col(id_col).cast("string")).alias("_h"),
    ).withColumn("_bucket", F.pmod(F.col("_h"), F.lit(n_buckets)))

    # the id column keeps its INPUT type (string ids are common in corpora
    # and the poly_hash bucketing casts to string anyway) — hard-coding
    # `long` here made applyInPandas reject any non-bigint id at runtime
    id_type = chunks.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, chunk_idx long, n_chunk_tokens long, "
        "seq_id long, seq_pos long"
    )

    def pack_bucket(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(key[0])
        pdf = pdf.sort_values(["_h", id_col, "chunk_idx"], kind="mergesort")
        seq_local, fill, seq_ids, seq_pos = 0, 0, [], []
        for n in pdf["n_chunk_tokens"]:
            n = int(n)
            if fill + n > seq_len:
                seq_local += 1
                fill = 0
            seq_ids.append(bucket * (1 << 40) + seq_local)
            seq_pos.append(fill)
            fill += n
        pdf = pdf.assign(seq_id=seq_ids, seq_pos=seq_pos)
        return pdf[
            [id_col, "chunk_idx", "n_chunk_tokens", "seq_id", "seq_pos"]
        ]

    return keyed.groupBy("_bucket").applyInPandas(pack_bucket, out_schema)


def sequence_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """Per-sequence fill statistics: (seq_id, n_chunks, n_tokens,
    utilization) — the padding-waste audit."""
    return packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_chunk_tokens").alias("n_tokens"),
        F.round(
            F.sum("n_chunk_tokens").cast("double") / F.lit(float(seq_len)), 6
        ).alias("utilization"),
    )
