"""Scalar quantization (SQ8) for embedding columns — the 4× memory lever
(SURVEY §2 round-5 extension).

The other point on the PQ trade-off curve (FAISS's SQ8; Jégou et al.'s
baseline): quantize each DIMENSION independently to one byte against the
corpus per-dimension min/max. 4× smaller than float32 (vs PQ's 32×) but
near-lossless — reconstruction error is bounded per dimension by
(max−min)/510 (half a quantization step), so approximate cosine ranking
barely moves and a small exact rerank recovers the rest.

Determinism protocol: everything runs on the exact-integer scaled vectors
(similarity.py VEC_SCALE). The fit is a per-dimension integer min/max —
associative, exact under any partitioning. Encoding is pure integer
arithmetic: code = round_half_up((v−min)·255 / (max−min)) computed as
(2·255·(v−min) + (max−min)) div (2·(max−min)) — no float ever enters, so
codes are bit-identical across engines and runs. Decoding back to
integer space (min + code·(max−min)/255, same half-up division) gives a
deterministic approximate vector for scoring with the existing exact
integer-cosine machinery.

Shape at 100 TB: the fit is ONE map-side-combinable aggregate collecting
2·dim integers; encode/decode are scan-stage array transforms (zero
shuffle); approximate top-k reuses knn_bruteforce's broadcast-bounded
query contract over the DECODED codes — the float32 table is read once
at encode time and never again; rerank joins true vectors back for the
top candidates only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.similarity import (
    _cosine_scaled,
    _prepped,
    scaled_vec,
    self_dot,
)


def sq8_fit(df: DataFrame, vec_col: str, dim: int) -> dict:
    """Per-dimension (min, max) over the scaled integer components.

    One combinable shuffle (groupBy(pos) over the posexploded scaled
    vectors), one 2·dim-integer collect. Dimensions with max == min get
    span 1 so encode/decode stay total (all codes 0, decode = min).
    """
    rows = (
        df.select(F.posexplode(scaled_vec(F.col(vec_col))).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    )
    lo = [0] * dim
    hi = [0] * dim
    for r in rows:
        lo[r["pos"]], hi[r["pos"]] = r["lo"], r["hi"]
    return {"lo": lo, "hi": [max(h, l + 1) for l, h in zip(lo, hi)]}


def _span(model: dict) -> list[int]:
    return [h - l for l, h in zip(model["lo"], model["hi"])]


def sq8_encode(
    df: DataFrame, id_col: str, vec_col: str, model: dict
) -> DataFrame:
    """(id, codes array<int> in [0, 255]) — integer half-up quantization;
    zero shuffle (scan-stage zip_with against the literal bounds)."""
    lo = F.array(*[F.lit(x).cast("long") for x in model["lo"]])
    span = F.array(*[F.lit(x).cast("long") for x in _span(model)])
    clamped = F.zip_with(
        scaled_vec(F.col(vec_col)),
        lo,
        lambda v, l: F.greatest(v - l, F.lit(0).cast("long")),
    )
    # Spark's / is double division; floor() restores exact integer div
    # (numerators < 2^33 ≪ 2^53, so the double quotient is exact at every
    # integer boundary — the rational's denominator 2d bounds how close a
    # non-integer value can sit to an integer, far above double eps)
    codes = F.zip_with(
        clamped,
        span,
        lambda n, d: F.least(
            F.floor(
                (F.lit(510).cast("long") * n + d)
                / (F.lit(2).cast("long") * d)
            ),
            F.lit(255).cast("long"),
        ).cast("int"),
    )
    return df.select(F.col(id_col), codes.alias("codes"))


def sq8_decode_scaled(codes: Column, model: dict) -> Column:
    """codes → deterministic approximate scaled-integer vector
    (min + round_half_up(code·span/255))."""
    lo = F.array(*[F.lit(x).cast("long") for x in model["lo"]])
    span = F.array(*[F.lit(x).cast("long") for x in _span(model)])
    stepped = F.zip_with(
        codes.cast("array<long>"),
        span,
        lambda c, d: F.floor(
            (F.lit(2).cast("long") * c * d + F.lit(255).cast("long"))
            / F.lit(510).cast("long")
        ),
    )
    return F.zip_with(stepped, lo, lambda s, l: (s + l).cast("long"))


def sq8_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids_below: int,
    k: int = 5,
    rerank: int = 0,
    model: dict | None = None,
) -> DataFrame:
    """Approximate cosine top-k over SQ8 codes (+ optional exact rerank).

    Queries (the bounded ``id < query_ids_below`` set, knn_bruteforce's
    contract) broadcast with their TRUE vectors; candidates are scored
    from their DECODED codes only. ``rerank > 0`` keeps the top
    ``rerank`` approximate candidates per query and re-scores them with
    true vectors (one semi-join back to the float table) — the standard
    two-stage retrieval.
    """
    if model is None:  # pass a fitted model to amortize across calls
        model = sq8_fit(df, vec_col, _dim_of(df, vec_col))
    codes = sq8_encode(df, id_col, vec_col, model)
    approx = codes.select(
        F.col(id_col).alias("cand_id"),
        sq8_decode_scaled(F.col("codes"), model).alias("svec_c"),
    ).withColumn("sdot_c", self_dot(F.col("svec_c")))
    q = (
        _prepped(df, id_col, vec_col)
        .filter(F.col(id_col) < query_ids_below)
        .select(
            F.col(id_col).alias("query_id"),
            F.col("svec").alias("svec_q"),
            F.col("sdot").alias("sdot_q"),
        )
    )
    pairs = F.broadcast(q).join(approx, F.col("query_id") != F.col("cand_id"))
    scored = pairs.select(
        "query_id",
        "cand_id",
        F.round(
            _cosine_scaled(
                F.col("svec_q"), F.col("svec_c"), F.col("sdot_q"), F.col("sdot_c")
            ),
            4,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    if not rerank:
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )
    shortlist = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max(rerank, k))
        .select("query_id", "cand_id")
    )
    true_c = _prepped(df, id_col, vec_col).select(
        F.col(id_col).alias("cand_id"),
        F.col("svec").alias("svec_c"),
        F.col("sdot").alias("sdot_c"),
    )
    exact = (
        shortlist.join(true_c, "cand_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "cand_id",
            F.round(
                _cosine_scaled(
                    F.col("svec_q"),
                    F.col("svec_c"),
                    F.col("sdot_q"),
                    F.col("sdot_c"),
                ),
                4,
            ).alias("cosine"),
        )
    )
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def _dim_of(df: DataFrame, vec_col: str) -> int:
    return df.select(F.size(F.col(vec_col)).alias("d")).first()["d"]


# ---------------------------------------------------------------------------
# Binary quantization (1-bit) — the 32x point on the same ladder
# (SURVEY §2 op 108)
# ---------------------------------------------------------------------------

BQ_WORD = 32  # bits packed per int64 word; 32 keeps every sum < 2^32


def bq_fit(df: DataFrame, vec_col: str, dim: int) -> dict:
    """Per-dimension integer-mean threshold over the scaled components —
    ``thr_d = floor(Σv_d / n)``. One combinable shuffle, a 2·dim-integer
    collect; exact integer arithmetic so the fit is partition-invariant
    and engine-portable (same protocol as sq8_fit)."""
    rows = (
        df.select(F.posexplode(scaled_vec(F.col(vec_col))).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    thr = [0] * dim
    for r in rows:
        thr[r["pos"]] = r["s"] // r["n"]
    return {"thr": thr}


def bq_encode(df: DataFrame, id_col: str, vec_col: str, model: dict) -> DataFrame:
    """(id, bcode array<long>) — bit d = (scaled_v_d > thr_d), packed
    little-endian BQ_WORD bits per word (⌈dim/32⌉ words: a 32× shrink
    at 64 float32 dims → 2 longs). Zero shuffle; the bit array is
    staged once per row before the word folds consume it."""
    dim = len(model["thr"])
    nw = (dim + BQ_WORD - 1) // BQ_WORD
    thr = F.array(*[F.lit(x).cast("long") for x in model["thr"]])
    bits = F.zip_with(
        scaled_vec(F.col(vec_col)),
        thr,
        lambda v, t: (v > t).cast("long"),
    )
    staged = df.select(F.col(id_col), bits.alias("_bits"))
    pow_arr = F.array(*[F.lit(1 << j).cast("long") for j in range(BQ_WORD)])

    def word(w: int):
        return F.aggregate(
            F.zip_with(
                F.slice(F.col("_bits"), w * BQ_WORD + 1, BQ_WORD),
                pow_arr,
                lambda b, p: b * p,
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + F.coalesce(x, F.lit(0).cast("long")),
        )

    return staged.select(
        F.col(id_col), F.array(*[word(w) for w in range(nw)]).alias("bcode")
    )


def sql_bq_encode(
    source: str, id_col: str, vec_col: str, model: dict, dim: int
) -> str:
    """DuckDB twin of :func:`bq_encode` — identical thresholds (model
    literals), identical little-endian packing."""
    from dwca_parquet_spark.operators.similarity import sql_scaled_vec

    nw = (dim + BQ_WORD - 1) // BQ_WORD
    thr = "[" + ", ".join(str(x) for x in model["thr"]) + "]"
    pows = "[" + ", ".join(str(1 << j) for j in range(BQ_WORD)) + "]"
    sv = sql_scaled_vec(vec_col, dim)
    words = ", ".join(
        "list_sum(list_transform(generate_series(1, {w}), j -> "
        "CASE WHEN {off} + j <= {dim} AND b[{off} + j] = 1 "
        "THEN ({pows})[j] ELSE 0 END))".format(
            w=BQ_WORD, off=w * BQ_WORD, dim=dim, pows=pows
        )
        for w in range(nw)
    )
    return f"""
    WITH s AS (SELECT {id_col}, {sv} AS sv FROM {source}),
    bt AS (SELECT {id_col},
             list_transform(generate_series(1, {dim}),
               d -> CASE WHEN sv[d] > ({thr})[d] THEN 1 ELSE 0 END) AS b
           FROM s)
    SELECT {id_col}, [{words}] AS bcode FROM bt
    """


def bq_hamming_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids_below: int,
    k: int = 5,
    rerank: int = 0,
    model: dict | None = None,
) -> DataFrame:
    """Approximate top-k by Hamming distance over 1-bit codes
    (+ optional exact cosine rerank) — the flat-scan regime where the
    candidate table is 32× smaller and the distance is a handful of
    XOR+popcount word ops instead of a dim-long dot product.

    Same bounded-query broadcast contract as knn_bruteforce/sq8_topk;
    ties break on (distance ASC, cand_id ASC) so results are exact-
    deterministic and the DuckDB twin reproduces them bit-for-bit.
    """
    if model is None:
        model = bq_fit(df, vec_col, _dim_of(df, vec_col))
    codes = bq_encode(df, id_col, vec_col, model)
    q = codes.filter(F.col(id_col) < query_ids_below).select(
        F.col(id_col).alias("query_id"), F.col("bcode").alias("bq")
    )
    c = codes.select(
        F.col(id_col).alias("cand_id"), F.col("bcode").alias("bc")
    )
    pairs = F.broadcast(q).join(c, F.col("query_id") != F.col("cand_id"))
    dist = F.aggregate(
        F.zip_with(
            F.col("bq"), F.col("bc"), lambda a, b: F.bit_count(a.bitwiseXOR(b))
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    scored = pairs.select(
        "query_id", "cand_id", dist.cast("long").alias("hamming")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("cand_id").asc()
    )
    ranked = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max(rerank, k))
        .drop("rn")
    )
    if not rerank:
        return ranked
    true_t = _prepped(df, id_col, vec_col)
    true_c = true_t.select(
        F.col(id_col).alias("cand_id"),
        F.col("svec").alias("svec_c"),
        F.col("sdot").alias("sdot_c"),
    )
    true_q = true_t.filter(F.col(id_col) < query_ids_below).select(
        F.col(id_col).alias("query_id"),
        F.col("svec").alias("svec_q"),
        F.col("sdot").alias("sdot_q"),
    )
    exact = (
        ranked.select("query_id", "cand_id")
        .join(true_c, "cand_id")
        .join(F.broadcast(true_q), "query_id")
        .select(
            "query_id",
            "cand_id",
            F.round(
                _cosine_scaled(
                    F.col("svec_q"), F.col("svec_c"),
                    F.col("sdot_q"), F.col("sdot_c"),
                ),
                4,
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        exact.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def bq_hamming_neighbors_mih(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    radius: int,
    model: dict | None = None,
    n_chunks: int = 8,
) -> DataFrame:
    """All pairs within Hamming ``radius`` over the 1-bit codes via
    multi-index hashing (Norouzi et al. 2012; PAPERS.md) — the
    sub-quadratic scale path for op 108's flat scan: split each code
    into ``n_chunks`` bit chunks; by pigeonhole, two codes at distance
    ≤ radius < n_chunks agree EXACTLY on at least one chunk, so the
    candidate set is an equi-join on (chunk_index, chunk_value) and the
    guarantee is exact — every pair within ``radius`` is found
    (asserted against the brute-force scan, test_sq.py).

    Output: (id_a, id_b, hamming) with id_a < id_b, hamming ≤ radius.

    Scale shape: explode to n_chunks rows/vector → ONE equi-join on the
    chunk key (candidates = Σ_bucket |bucket|² like every LSH in this
    repo, never n²) → distinct pair → exact XOR+popcount verify on the
    codes carried through. Requires radius < n_chunks (raises
    otherwise — a silent recall loss is not an option).
    """
    if model is None:
        model = bq_fit(df, vec_col, _dim_of(df, vec_col))
    dim = len(model["thr"])
    nw = (dim + BQ_WORD - 1) // BQ_WORD
    total_bits = nw * BQ_WORD
    chunk_bits = (total_bits + n_chunks - 1) // n_chunks
    # EFFECTIVE chunk count: asking for more chunks than the code has
    # bits for leaves trailing chunks past the code — constant 0 for
    # every row, i.e. one join bucket holding the whole corpus and a
    # silent O(n²) degeneration; worse, those vacuous chunks also made
    # the radius guard vacuous. Clamp and re-guard on the real count
    # (round-6 ADVICE fix, tested: dim 64 / n_chunks 9 / radius 8 now
    # raises instead of degenerating).
    n_eff = (total_bits + chunk_bits - 1) // chunk_bits
    if radius >= n_eff:
        raise ValueError(
            f"pigeonhole guarantee needs radius < effective chunks: "
            f"{total_bits} bits / {chunk_bits}-bit chunks gives "
            f"{n_eff} non-empty chunks (requested n_chunks={n_chunks}), "
            f"radius {radius} >= {n_eff}"
        )
    n_chunks = n_eff
    if chunk_bits > 62:
        raise ValueError("chunk too wide for a signed long key")

    codes = bq_encode(df, id_col, vec_col, model)

    # chunk c covers bits [c*chunk_bits, (c+1)*chunk_bits) of the
    # little-endian concatenation of the 32-bit words
    def chunk_val(c: int):
        val = F.lit(0).cast("long")
        for b in range(chunk_bits):
            bit = c * chunk_bits + b
            if bit >= total_bits:
                break
            w, off = bit // BQ_WORD, bit % BQ_WORD
            val = val + F.when(
                F.element_at("bcode", w + 1)
                .bitwiseAND(F.lit(1 << off).cast("long")) != 0,
                F.lit(1 << b).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        return val

    chunked = codes.select(
        F.col(id_col).alias("_id"),
        F.col("bcode"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("c"), chunk_val(c).alias("v")
                )
                for c in range(n_chunks)
            ])
        ).alias("_ch"),
    ).select("_id", "bcode", F.col("_ch.c").alias("c"), F.col("_ch.v").alias("v"))

    a = chunked.select(
        F.col("_id").alias("id_a"), F.col("bcode").alias("ba"), "c", "v"
    )
    b = chunked.select(
        F.col("_id").alias("id_b"), F.col("bcode").alias("bb"), "c", "v"
    )
    cand = (
        a.join(b, ["c", "v"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ba", "bb")
        .distinct()
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("ba"), F.col("bb"), lambda x, y: F.bit_count(x.bitwiseXOR(y))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        cand.withColumn("hamming", dist.cast("long"))
        .filter(F.col("hamming") <= radius)
        .select("id_a", "id_b", "hamming")
    )
