"""Record linkage / entity resolution (SURVEY §2 ops 110-111).

The string-similarity self-join is the canonical entity-resolution
primitive (customer/supplier name reconciliation — the relational face
of the dedup family; the reference's only dedup is ``set()`` over
metadata keywords, ``/root/reference/src/dwca_parquet/libs/csw.py:91``).
The exact problem: all pairs with levenshtein(a, b) ≤ d — and the naive
answer is an O(n²·len²) cross join.

:func:`edit_distance_pairs` is the PassJoin-style segment join
(Li, Deng, Wang & Feng 2011, "PASS-JOIN: A Partition-based Method for
Similarity Joins"; PAPERS.md): partition every string into d+1 segments;
by pigeonhole, if lev(a, b) ≤ d then b contains at least one of a's
segments EXACTLY, starting within ±d of its position in a. Candidates
are therefore an equi-join on (segment index, segment value) between
each record's d+1 index segments and each record's bounded probe
substrings — never a cross join — followed by a length filter and the
exact levenshtein verify (which both engines implement identically —
the q56-gated function).

Bounds: index side emits ≤ d+1 rows/record; probe side ≤
(d+1)·(2d+1)·(2d+1) (i × length-hypothesis × shift) before dedup —
O(d³) per record, independent of corpus size; candidates are
Σ_bucket |index ∩ bucket|·|probe ∩ bucket| — the repo-wide blocking
bound. Strings shorter than d+1 characters cannot donate d+1 non-empty
segments, so the pigeonhole lapses for pairs BOTH shorter than 2d+1;
those live in a tiny length-bounded bucket handled by a direct join
(documented all-pairs over |len ≤ 2d| records only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segments(s, length, d: int):
    """Index side: array of (i, seg) structs — the d+1 even partition
    segments of ``s`` (empty segments of too-short strings excluded)."""

    def seg(i: int):
        start = (F.lit(i) * length / (d + 1)).cast("int")
        end = ((F.lit(i + 1) * length / (d + 1))).cast("int")
        return F.struct(
            F.lit(i).alias("i"),
            s.substr(start + 1, end - start).alias("seg"),
        )

    arr = F.array(*[seg(i) for i in range(d + 1)])
    return F.filter(arr, lambda x: F.length(x["seg"]) > 0)


def _probe_subs(s, length, d: int):
    """Probe side: array of (i, seg) structs — for every length
    hypothesis La ∈ [Lb-d, Lb+d] and every segment i, the substrings of
    ``s`` with that segment's exact length starting within ±d of its
    position in the hypothetical a. Deduplicated before the explode."""
    la = F.sequence(
        F.greatest(length - d, F.lit(1)), length + d
    )

    def for_la(lav):
        def for_i(i: int):
            start_a = (F.lit(i) * lav / (d + 1)).cast("int")
            end_a = (F.lit(i + 1) * lav / (d + 1)).cast("int")
            seg_len = end_a - start_a
            lo = F.greatest(start_a - F.lit(d), F.lit(0))
            hi = F.least(start_a + F.lit(d), length - seg_len)
            p = F.when(
                (seg_len > 0) & (hi >= lo), F.sequence(lo, hi)
            ).otherwise(F.array().cast("array<int>"))
            return F.transform(
                p,
                lambda pos: F.struct(
                    F.lit(i).alias("i"),
                    s.substr(pos + 1, seg_len).alias("seg"),
                ),
            )

        return F.flatten(F.array(*[for_i(i) for i in range(d + 1)]))

    return F.array_distinct(F.flatten(F.transform(la, for_la)))


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    d: int,
    short_bucket_limit: int = 100_000,
) -> DataFrame:
    """All pairs (id_a < id_b) with levenshtein ≤ ``d`` — exact and
    complete (proved against the brute-force cross join, test_linkage),
    via PassJoin segment blocking. See the module docstring for bounds.

    ``short_bucket_limit`` guards the len ≤ 2d fallback bucket (where
    the pigeonhole lapses and a broadcast nested-loop join runs): it is
    tiny by construction only for LONG-string corpora. For short keys
    (d=3 makes every ≤6-char string "short" — codes, abbreviations) the
    bucket is the whole table: an O(n²) BNLJ and a broadcast OOM with
    no warning. The guard counts the bucket (one bounded aggregate on
    the already-persisted base) and refuses past the limit with the
    actual count, instead of degenerating silently (round-6 ADVICE
    fix). Raise the limit explicitly if you really want the quadratic
    bucket — the cost is then a stated decision, not an ambush.
    """
    if d < 1:
        raise ValueError("d must be >= 1")
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(str_col).alias("_s"),
        F.length(str_col).alias("_len"),
    )
    from dwca_parquet_spark.cache import persist_tracked

    base = persist_tracked(base)

    idx = base.select(
        "_id", "_s", "_len",
        F.explode(_segments(F.col("_s"), F.col("_len"), d)).alias("_g"),
    ).select(
        F.col("_id").alias("id_a"),
        F.col("_s").alias("s_a"),
        F.col("_len").alias("len_a"),
        F.col("_g.i").alias("i"),
        F.col("_g.seg").alias("seg"),
    )
    prb = base.select(
        "_id", "_s", "_len",
        F.explode(_probe_subs(F.col("_s"), F.col("_len"), d)).alias("_g"),
    ).select(
        F.col("_id").alias("id_b"),
        F.col("_s").alias("s_b"),
        F.col("_len").alias("len_b"),
        F.col("_g.i").alias("i"),
        F.col("_g.seg").alias("seg"),
    )
    cand = (
        idx.join(prb, ["i", "seg"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= d)
        )
        .select("id_a", "id_b", "s_a", "s_b")
        .distinct()
    )

    # short bucket: pairs where BOTH strings are too short to donate d+1
    # segments — the pigeonhole lapses there; direct length-bounded join
    shorts = base.filter(F.col("_len") <= 2 * d)
    n_short = shorts.count()
    if n_short > short_bucket_limit:
        raise ValueError(
            f"short-string bucket (len <= {2 * d}) holds {n_short} rows "
            f"> short_bucket_limit={short_bucket_limit}: the broadcast "
            f"nested-loop fallback would be O(n²) over the bucket. "
            f"Either the corpus is short-key (use a smaller d or a "
            f"different blocking) or raise short_bucket_limit knowingly."
        )
    sa = shorts.select(
        F.col("_id").alias("id_a"), F.col("_s").alias("s_a"),
        F.col("_len").alias("len_a"),
    )
    sb = shorts.select(
        F.col("_id").alias("id_b"), F.col("_s").alias("s_b"),
        F.col("_len").alias("len_b"),
    )
    # broadcast the (by-construction tiny) bucket explicitly: a BNLJ over
    # |len ≤ 2d| rows, never a CartesianProduct over a shuffled side
    short_cand = (
        F.broadcast(sa).join(
            sb,
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= d),
        )
        .select("id_a", "id_b", "s_a", "s_b")
    )

    both = cand.unionByName(short_cand).distinct()
    return (
        both.withColumn(
            "dist", F.levenshtein("s_a", "s_b").cast("long")
        )
        .filter(F.col("dist") <= d)
        .select("id_a", "id_b", "dist")
    )


def link_records(
    df: DataFrame, id_col: str, str_col: str, d: int
) -> DataFrame:
    """Entity-resolution clusters: (id, entity_id) where records whose
    key strings are within edit distance ``d`` — transitively — share an
    entity id (= min record id of the cluster; singletons keep their
    own). The edge list is :func:`edit_distance_pairs` (exact, bounded),
    collapsed by the repo's pointer-jumping connected components."""
    from dwca_parquet_spark.operators.dedup import connected_components

    pairs = edit_distance_pairs(df, id_col, str_col, d)
    labels = connected_components(pairs, "id_a", "id_b")
    return (
        df.select(F.col(id_col))
        .join(
            labels.select(
                F.col("node").alias(id_col),
                F.col("label").alias("entity_id"),
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.coalesce("entity_id", F.col(id_col)).alias("entity_id"),
        )
    )
