"""Deterministic sampling / dataset-split operators.

A 100 TB training pipeline needs reproducible train/val/test assignment that
is (a) stable across runs and engines, (b) computable per-row with no state,
and (c) skew-free. ``df.randomSplit`` fails (a) — its sampling depends on
partition layout — so these operators derive the assignment from the
engine-portable polynomial hash (functions/hashing.py) of a key column:
``bucket = poly_hash(key) mod 100``. Same input row → same split, on any
engine, any partitioning, any day.

The reference has no sampling surface (its only query is
``/root/reference/src/dwca_parquet/templates/query.sql:1-5``); this closes
the training-data-pipeline gap alongside dedup/similarity/text (SURVEY §2
round-2 extensions).

Scale notes: pure per-row projections — they codegen into the scan stage,
shuffle nothing, and commute with partition pruning. The per-split counts
aggregate is one map-side-combinable shuffle over ≤ |splits| keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dwca_parquet_spark.functions import hashing as H

# (name, upper-bound-exclusive) over the 0..99 hash-bucket space.
DEFAULT_SPLITS: tuple[tuple[str, int], ...] = (
    ("train", 80),
    ("val", 90),
    ("test", 100),
)


def split_bucket(key: Column) -> Column:
    """0..99 bucket from the portable polynomial hash of ``key`` (as string)."""
    return F.pmod(H.poly_hash(key.cast("string")), F.lit(100))


def split_label(
    key: Column, splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS
) -> Column:
    """Split name for ``key`` under cumulative bucket thresholds."""
    b = split_bucket(key)
    expr = F.lit(splits[-1][0])
    for name, hi in reversed(splits[:-1]):
        expr = F.when(b < hi, F.lit(name)).otherwise(expr)
    return expr


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
) -> DataFrame:
    """Assign every row a deterministic split label (adds ``split``)."""
    return df.withColumn("split", split_label(F.col(key_col), splits))


SAMPLE_MOD = 1_000_000  # ppm resolution for fraction sampling
SAMPLE_A = 2_654_435_761  # Knuth multiplicative constant; A*HASH_MOD < 2^63
SAMPLE_B = 104_729


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on ``key_col``.

    Keeps rows whose portable hash of (key ‖ salt) lands below
    fraction·SAMPLE_MOD — the reproducible replacement for
    ``df.sample(fraction)`` (whose output depends on partition layout and
    seed plumbing). Different ``salt`` values draw independent samples;
    the same salt always draws the SAME keys, which is exactly what a
    training pipeline wants for resumable subsampling and for consistent
    joins between sampled tables (sample the fact and its features by the
    same key+salt and the join still lines up). Per-row projection, zero
    shuffle, commutes with pushdown.
    """
    threshold = int(fraction * SAMPLE_MOD)
    h = H.poly_hash(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    # Mixing permutation before the mod: poly_hash of a short key is a
    # small number (3 chars → < ~57k), so h % 1e6 would keep EVERYTHING
    # under a ppm threshold. (h·A + B) mod M spreads any input range over
    # the full modulus; A·max(h) < 2^63 keeps it ANSI-safe, and the same
    # constants reproduce in the oracle.
    bucket = F.pmod(
        F.pmod(h * F.lit(SAMPLE_A) + F.lit(SAMPLE_B), F.lit(H.HASH_MOD)),
        F.lit(SAMPLE_MOD),
    )
    return df.filter(bucket < threshold)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling — the data-mixture rebalancing
    primitive (keep 100% of books, 10% of web, 1% of logs).

    Same membership rule as :func:`hash_sample`, but the threshold is
    looked up from ``fractions`` by the row's stratum (strata absent from
    the dict get ``default_fraction``). Still a pure per-row projection —
    the threshold map compiles into the expression, so there is no join,
    no shuffle, and the nesting property holds per stratum (raising one
    stratum's fraction strictly extends its sample).
    """
    h = H.poly_hash(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    bucket = F.pmod(
        F.pmod(h * F.lit(SAMPLE_A) + F.lit(SAMPLE_B), F.lit(H.HASH_MOD)),
        F.lit(SAMPLE_MOD),
    )
    threshold = F.lit(int(default_fraction * SAMPLE_MOD))
    for stratum, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(int(frac * SAMPLE_MOD))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def sql_hash_sample_pred(key_expr: str, fraction: float, salt: str = "") -> str:
    """DuckDB predicate computing the identical sample membership.

    The salt is embedded as a SQL string literal, so quotes are doubled —
    a salt containing ' must not silently diverge from the Spark side."""
    threshold = int(fraction * SAMPLE_MOD)
    esc = salt.replace("'", "''")
    keyed = f"({key_expr} || '{esc}')" if salt else key_expr
    h = H.sql_poly_hash(keyed)
    return (
        f"((({h}) * {SAMPLE_A} + {SAMPLE_B}) % {H.HASH_MOD} % {SAMPLE_MOD})"
        f" < {threshold}"
    )


def sql_split_bucket(key_expr: str) -> str:
    """DuckDB SQL for split_bucket — same hash constants, same mod."""
    return f"(({H.sql_poly_hash(key_expr)}) % 100)"


def sql_split_label(
    key_expr: str, splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS
) -> str:
    b = sql_split_bucket(key_expr)
    cases = " ".join(
        f"WHEN {b} < {hi} THEN '{name}'" for name, hi in splits[:-1]
    )
    return f"CASE {cases} ELSE '{splits[-1][0]}' END"


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, salt: str = ""
) -> DataFrame:
    """Per-ROW inclusion probabilities — keep each row with probability
    equal to its own ``weight_col`` value (clamped to [0, 1], ppm
    resolution), deterministically.

    The quality-proportional selection step of a curation pipeline
    (keep docs with probability ∝ classifier score — CCNet/Gopher-style
    soft filtering) without RNG: the same (key, salt) always decides the
    same way, different salts draw independent selections, and the
    comparison is INTEGER (hash bucket < round(weight·1e6)) so the
    oracle reproduces membership exactly — no float threshold ever
    crosses an engine boundary. Pure projection: zero shuffle, and the
    nesting property holds per row (a higher weight never drops a row a
    lower weight kept).
    """
    h = H.poly_hash(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    bucket = F.pmod(
        F.pmod(h * F.lit(SAMPLE_A) + F.lit(SAMPLE_B), F.lit(H.HASH_MOD)),
        F.lit(SAMPLE_MOD),
    )
    w = F.least(F.greatest(F.col(weight_col), F.lit(0.0)), F.lit(1.0))
    threshold = F.round(w * SAMPLE_MOD, 0).cast("long")
    return df.filter(bucket < threshold)


def sql_weighted_sample_pred(
    key_expr: str, weight_expr: str, salt: str = ""
) -> str:
    """DuckDB predicate for :func:`weighted_sample` — identical hash
    arithmetic, identical integer threshold."""
    esc = salt.replace("'", "''")
    keyed = f"({key_expr} || '{esc}')" if salt else key_expr
    h = H.sql_poly_hash(keyed)
    w = f"least(greatest({weight_expr}, 0.0), 1.0)"
    return (
        f"((({h}) * {SAMPLE_A} + {SAMPLE_B}) % {H.HASH_MOD} % {SAMPLE_MOD})"
        f" < CAST(round({w} * {SAMPLE_MOD}, 0) AS BIGINT)"
    )


def global_shuffle(
    df: DataFrame,
    key_col: str,
    seed: str = "",
    n_shards: int | None = None,
) -> DataFrame:
    """Deterministic seeded global shuffle — the training-export ordering.

    Training loaders want the corpus in RANDOM order, reproducibly:
    ``ORDER BY (poly_hash(key || seed), key)`` is a seeded permutation
    that is independent of input partitioning and row order (same rows →
    same permutation on any engine; a different ``seed`` draws a fresh
    permutation). The key itself tie-breaks hash collisions, so the
    order is TOTAL and run-stable. The hash rides along as
    ``shuffle_key`` so consumers (and the oracle) can verify the order.

    The raw polynomial hash of short sequential keys is nearly MONOTONIC
    (consecutive ids differ by a fixed stride — the trap hash_sample's
    mixing comment documents), and any affine mix maps an arithmetic
    progression to another arithmetic progression, so the mix here is
    QUADRATIC: ``(h² + A·h + B) mod M`` — non-linear (the stride becomes
    position-dependent: f(h+d)−f(h) = 2hd+d²+Ad varies with h), exact in
    int64 (h < 1e9+7 → h² < 2^63), and identical in both engines.

    ``n_shards`` adds ``shard = shuffle_key mod n_shards``: hash-sharding
    makes every shard an unbiased random slice of the corpus (what a
    data-parallel loader wants), balanced in expectation, and each shard
    internally inherits the global shuffled order.

    Scale shape: one range-partitioned sort (Spark samples boundaries,
    then sorts within partitions) — the canonical distributed total
    order; the hash/shard columns are scan-stage projections. Writing
    with ``partitionBy("shard")`` after this sort keeps per-shard files
    ordered without a second shuffle.
    """
    h = H.poly_hash(F.concat(F.col(key_col).cast("string"), F.lit(seed)))
    # stage the hash behind an alias before referencing it three times —
    # the poly_hash aggregate re-evaluates per reference otherwise
    # (functions/hashing.py:78 NOTE)
    gh = F.col("_gh")
    out = (
        df.withColumn("_gh", h)
        .withColumn(
            "shuffle_key",
            F.pmod(
                gh * gh + F.lit(SAMPLE_A) * gh + F.lit(SAMPLE_B),
                F.lit(H.HASH_MOD),
            ),
        )
        .drop("_gh")
    )
    if n_shards is not None:
        out = out.withColumn(
            "shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards))
        )
    return out.orderBy("shuffle_key", key_col)


def sql_global_shuffle(
    source: str,
    key_col: str,
    cols: str = "*",
    seed: str = "",
    n_shards: int | None = None,
) -> str:
    """DuckDB twin of :func:`global_shuffle` — identical hash, identical
    total order."""
    esc = seed.replace("'", "''")
    keyed = (
        f"(CAST({key_col} AS VARCHAR) || '{esc}')"
        if seed
        else f"CAST({key_col} AS VARCHAR)"
    )
    h = H.sql_poly_hash(keyed)
    mixed = f"((_gh * _gh + {SAMPLE_A} * _gh + {SAMPLE_B}) % {H.HASH_MOD})"
    shard = (
        f", ({mixed}) % {n_shards} AS shard" if n_shards is not None else ""
    )
    return (
        f"SELECT {cols}, {mixed} AS shuffle_key{shard} "
        f"FROM (SELECT *, {h} AS _gh FROM {source}) "
        f"ORDER BY shuffle_key, {key_col}"
    )


def group_sample_k(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic k-per-group sample — the distribution-safe stand-in
    for per-group reservoir sampling (RNG reservoirs depend on encounter
    order; this depends only on row identity).

    Rank rows inside each group by the MIXED hash (quadratic mix — see
    :func:`global_shuffle`: the raw polynomial hash of sequential ids is
    nearly monotonic, which would make "first k" mean "lowest k ids"),
    tie-break by key, keep rank ≤ k. Properties that fall out: stable
    under any partitioning, a smaller k picks a PREFIX of a larger k's
    sample (nesting), and a fresh ``salt`` draws an independent sample.

    One shuffle on the group key (the window). At 100 TB group skew is
    the hazard: a window over a hot group serializes its partition —
    for heavy groups pre-filter with :func:`hash_sample` at a fraction
    that overshoots k, then rank the survivors.
    """
    h = H.poly_hash(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    from pyspark.sql import Window

    out = df.withColumn("_gh", h).withColumn(
        "_mix",
        F.pmod(
            F.col("_gh") * F.col("_gh")
            + F.lit(SAMPLE_A) * F.col("_gh")
            + F.lit(SAMPLE_B),
            F.lit(H.HASH_MOD),
        ),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("_mix").asc(), F.col(key_col).asc()
    )
    return (
        out.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_gh", "_mix", "_rk")
    )


def quantile_bins(
    df: DataFrame,
    score_col: str,
    key_col: str,
    n_bins: int = 10,
    out_col: str = "bin",
) -> DataFrame:
    """Equal-population quantile bins over ``score_col`` (deciles by
    default) — the curriculum/quality-binning primitive: rank documents
    by a quality score, then train on bins in order (or mix them with
    :func:`~dwca_parquet_spark.operators.packing.mix_sources`).

    ``ntile`` over a TOTAL order (score, then key — ties must break
    deterministically or bin edges wander between runs/engines). Bins
    are 1..n_bins, populations differ by at most one row — exactly the
    ANSI ntile contract, so any SQL engine reproduces the assignment
    bit-for-bit.

    One range-ish shuffle (the unpartitioned window's sort) — this is
    the EXACT contract, usable to the single-sort limit. For a corpus
    past that, :func:`quantile_bins_approx` is the implemented scale
    path (sampled quantile edges + a per-row projection, zero window),
    gated against this operator on per-row assignment and bin
    populations (test_sampling_r6.py).
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col(score_col).asc(), F.col(key_col).asc())
    return df.withColumn(out_col, F.ntile(n_bins).over(w))


def sql_quantile_bins(
    source: str, score_col: str, key_col: str, n_bins: int = 10,
    cols: str = "*", out_col: str = "bin",
) -> str:
    """DuckDB twin of :func:`quantile_bins` (identical ANSI ntile)."""
    return (
        f"SELECT {cols}, ntile({n_bins}) OVER "
        f"(ORDER BY {score_col} ASC, {key_col} ASC) AS {out_col} "
        f"FROM {source}"
    )


def quantile_bins_approx(
    df: DataFrame,
    score_col: str,
    key_col: str,
    n_bins: int = 10,
    out_col: str = "bin",
    accuracy: int = 10_000,
) -> DataFrame:
    """The 100 TB path for :func:`quantile_bins` — equal-population
    quality bins WITHOUT the global sort. The exact operator's ntile
    needs a total order over the corpus (an unpartitioned window =
    single-partition sort, the canonical scale-killer); this one bins
    against sampled quantile EDGES instead: one ``percentile_approx``
    aggregate (map-side-combinable, a bounded n_bins-1 array collected
    to the driver) and then a pure per-row projection
    ``bin = 1 + #edges < score`` that codegens into the scan — ZERO
    window, zero additional shuffle (plan-pinned, test_plans_r6.py).

    Contract vs the exact operator (gated, test_sampling_r6.py):
    bins are monotone in score, land in 1..n_bins, per-row assignment
    differs from exact ntile by ≤1 bin on distinct scores at this
    accuracy, and bin populations match n/n_bins within the GK-sketch
    error bound (ε = 1/accuracy of the rank). What it gives up vs
    exact: ties cannot be split across bins (ntile splits them by the
    key tiebreak to equalize populations; an edge-based bin must put
    every tied row on one side), so heavily-tied score distributions
    collapse bins — same caveat the exact docstring states, now with
    the scale-safe behavior actually implemented instead of documented.
    ``key_col`` is accepted for signature parity and ignored (no
    tiebreak exists without a total order). NULL scores land in bin 1,
    matching exact ntile's ASC NULLS FIRST placement.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if n_bins == 1:
        return df.withColumn(out_col, F.lit(1))
    edges = (
        df.select(
            F.percentile_approx(
                score_col,
                [i / n_bins for i in range(1, n_bins)],
                accuracy,
            ).alias("_e")
        ).first()["_e"]
        or []
    )
    sc = F.col(score_col)
    b = sum((sc > F.lit(e)).cast("int") for e in sorted(set(edges)))
    # NULL scores: exact ntile orders ASC (Spark: NULLS FIRST), so the
    # exact operator puts them in bin 1; the edge-comparison sum is
    # NULL for them, so coalesce to 1 to keep the two paths consistent
    return df.withColumn(
        out_col, F.coalesce((b + F.lit(1)).cast("int"), F.lit(1))
    )


def sql_group_sample_k(
    source: str,
    group_col: str,
    key_col: str,
    k: int,
    cols: str = "*",
    salt: str = "",
) -> str:
    """DuckDB twin of :func:`group_sample_k` (identical hash, mix, rank)."""
    esc = salt.replace("'", "''")
    keyed = (
        f"(CAST({key_col} AS VARCHAR) || '{esc}')"
        if salt
        else f"CAST({key_col} AS VARCHAR)"
    )
    h = H.sql_poly_hash(keyed)
    mixed = f"((_gh * _gh + {SAMPLE_A} * _gh + {SAMPLE_B}) % {H.HASH_MOD})"
    return (
        f"SELECT {cols} FROM ("
        f"SELECT *, row_number() OVER "
        f"(PARTITION BY {group_col} ORDER BY {mixed} ASC, {key_col} ASC) AS _rk "
        f"FROM (SELECT *, {h} AS _gh FROM {source})"
        f") WHERE _rk <= {k}"
    )


def select_to_token_budget(
    df: DataFrame,
    id_col: str,
    score_col: str,
    tokens_col: str,
    budget_tokens: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Token-budget corpus selection (SURVEY §2 op 105) — the standard
    data-selection step: walk documents best-score-first and keep each
    one whose FIRST token still fits under ``budget_tokens`` (documents
    are never split — same placement rule as packing.pack_documents).
    The canonical order is (score DESC, id ASC), so selection is exactly
    deterministic and engine-portable. Output: one row per input doc —
    ``(id, score, doc_tokens, cum_tokens, selected)`` where
    ``cum_tokens`` is the INCLUSIVE prefix sum over the canonical order,
    so callers audit the cut line instead of losing it.

    Scale shape: a naive rank-everything window is a single-partition
    sort — a non-starter. This uses the packing module's two-level
    prefix sum, ordered by SCORE: bucket edges from a percentile_approx
    aggregate (a bounded driver collect; edge placement only affects
    balance, never
    the result, because buckets are score-monotone and the in-bucket
    window re-orders exactly), in-bucket cumsums across ``n_buckets``
    parallel reducers, then an O(buckets) offset table broadcast back.
    Heavily-tied score distributions collapse buckets (ties must share
    one) — the same caveat as quantile_bins, and AQE's skew handling is
    the mitigation.
    """
    sc, tc = F.col(score_col), F.col(tokens_col)
    if n_buckets <= 1:
        edges = []
    else:
        edges = (
            df.select(
                F.percentile_approx(
                    score_col,
                    [i / n_buckets for i in range(1, n_buckets)],
                    10_000,
                ).alias("_e")
            ).first()["_e"]
            or []
        )
    # bucket 0 = best scores; equal scores always share a bucket.
    # NULL scores: (NULL > e) is NULL, so the sum is NULL — coalesce
    # them into the WORST bucket, where the in-bucket (score DESC NULLS
    # LAST, id ASC) window places them after every scored row: exactly
    # the twin's global NULLS LAST order, so NULL-score docs are kept
    # (one output row per input doc) and selected only if budget
    # remains after all scored docs — never silently dropped.
    asc = sum(
        (sc > F.lit(e)).cast("int") for e in sorted(set(edges))
    )
    worst = len(set(edges))
    base = df.select(
        F.col(id_col),
        sc.alias(score_col),
        tc.cast("long").alias("doc_tokens"),
        F.coalesce(F.lit(worst) - asc, F.lit(worst)).alias("_bucket"),
    )
    from pyspark.sql import Window

    w_in = (
        Window.partitionBy("_bucket")
        .orderBy(F.desc(score_col), F.asc(id_col))
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
    cumt = F.col("_offset") + F.col("_cum_in")
    return (
        cum.join(F.broadcast(offsets), "_bucket")
        .select(
            id_col,
            score_col,
            "doc_tokens",
            cumt.cast("long").alias("cum_tokens"),
            ((cumt - F.col("doc_tokens")) < budget_tokens).alias(
                "selected"
            ),
        )
    )


def sql_select_to_token_budget(
    source: str,
    id_col: str,
    score_expr: str,
    tokens_expr: str,
    budget_tokens: int,
) -> str:
    """DuckDB twin of :func:`select_to_token_budget` — one window over
    the identical canonical order (score DESC, id ASC)."""
    return f"""
    SELECT {id_col},
           {score_expr} AS score,
           CAST({tokens_expr} AS BIGINT) AS doc_tokens,
           CAST(sum({tokens_expr}) OVER w AS BIGINT) AS cum_tokens,
           (sum({tokens_expr}) OVER w - {tokens_expr})
               < {budget_tokens} AS selected
    FROM {source}
    WINDOW w AS (ORDER BY {score_expr} DESC, {id_col} ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """


def realize_mixture(
    df: DataFrame,
    id_col: str,
    source_col: str,
    score_col: str,
    tokens_col: str,
    total_budget: int,
    weights: dict[str, float],
    n_buckets: int = 64,
) -> DataFrame:
    """Mixture realization (SURVEY §2 op 106) — turn target source
    weights (e.g. :func:`~dwca_parquet_spark.operators.packing.
    temperature_weights`) into an actual document selection: each source
    gets ``floor(total_budget · w_s / Σw)`` tokens and fills it
    best-score-first via :func:`select_to_token_budget`. The bridge
    between "what mixture do we want" (op 95) and "which documents do we
    take" (op 105). Sources absent from ``weights`` contribute nothing.

    Output: op-105 schema + ``(source, budget_tokens)`` so both the cut
    line and the per-source budget are auditable.

    Scale shape: a bounded driver loop over |sources| (mixtures have
    dozens of sources, not millions — the same bounded-driver contract
    as mix_plan); every iteration is the fully-distributed op-105 plan
    behind a pushed ``source = s`` filter, so a table partitioned or
    bucketed by source prunes to its own files. Budgets are floored to
    integers so the selection stays engine-exact.
    """
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("weights must have positive mass")
    from dwca_parquet_spark.cache import persist_tracked

    # one narrow materialization; every source branch then reads the
    # cached projection instead of re-executing the upstream plan
    # (scored corpora are usually join trees) once per source
    narrow = persist_tracked(
        df.select(id_col, source_col, score_col, tokens_col)
    )
    out = None
    for s, w in sorted(weights.items()):
        b = int(total_budget * w / wsum)
        part = (
            select_to_token_budget(
                narrow.filter(F.col(source_col) == s),
                id_col,
                score_col,
                tokens_col,
                b,
                n_buckets,
            )
            .withColumn(source_col, F.lit(s))
            .withColumn("budget_tokens", F.lit(b).cast("long"))
        )
        out = part if out is None else out.unionByName(part)
    return out


def sql_realize_mixture(
    source: str,
    id_col: str,
    source_col: str,
    score_expr: str,
    tokens_expr: str,
    total_budget: int,
    weights: dict[str, float],
) -> str:
    """DuckDB twin of :func:`realize_mixture` — one window per source
    partition over the identical canonical order, identical floored
    integer budgets."""
    wsum = sum(weights.values())
    cases = " ".join(
        f"WHEN {source_col} = '{s}' THEN {int(total_budget * w / wsum)}"
        for s, w in sorted(weights.items())
    )
    srcs = ", ".join(f"'{s}'" for s in sorted(weights))
    return f"""
    SELECT {id_col},
           {score_expr} AS score,
           CAST({tokens_expr} AS BIGINT) AS doc_tokens,
           CAST(sum({tokens_expr}) OVER w AS BIGINT) AS cum_tokens,
           (sum({tokens_expr}) OVER w - {tokens_expr})
               < (CASE {cases} END) AS selected,
           {source_col},
           CAST((CASE {cases} END) AS BIGINT) AS budget_tokens
    FROM {source}
    WHERE {source_col} IN ({srcs})
    WINDOW w AS (PARTITION BY {source_col}
                 ORDER BY {score_expr} DESC, {id_col} ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Dedup-aware train/val/test assignment (SURVEY §2 op 113) — the
    eval-leakage guard: hash-splitting documents independently lets two
    NEAR-DUPLICATES land on opposite sides of the train/test fence,
    which silently inflates eval scores. This splits by near-dup
    CLUSTER instead: MinHash-LSH clusters (op 21's dedup_clusters, same
    knobs) are the split unit, and every member inherits the portable
    hash-split of its cluster id — so a document and its near-copies
    are in the same split BY CONSTRUCTION. Property-tested in
    test_leakage_split.py: zero straddling clusters on a fixture whose
    planted near-dup trios PROVABLY straddle under plain hash_split,
    plus singleton-≡-hash_split parity and one-row-per-id.

    Output: (id, cluster_id, split). Scale shape: the cluster pass is
    the bounded LSH pipeline; the split itself is a pure projection on
    the cluster id; the only addition is one id-keyed equi-join of the
    (id, cluster_id) table back to nothing — the cluster table IS the
    output spine. Singleton documents are their own cluster, so their
    assignment matches plain hash_split on the id.
    """
    from dwca_parquet_spark.operators.dedup import dedup_clusters

    clusters = dedup_clusters(df, id_col, text_col, k=k, threshold=threshold)
    return clusters.select(
        F.col(id_col),
        F.col("cluster_id"),
        split_label(F.col("cluster_id"), splits).alias("split"),
    )


# ---------------------------------------------------------------------------
# Fixed-size weighted sampling WITHOUT replacement (SURVEY §2.G op 162 —
# VERDICT r10 #4: the missing selection primitive between op 71's Poisson
# weighted sampling, whose output SIZE is random, and op 94's fixed-size
# UNWEIGHTED group sample)
# ---------------------------------------------------------------------------
# Efraimidis–Spirakis (A-ES, "Weighted random sampling with a reservoir",
# IPL 2006; PAPERS.md): draw u_i ~ U(0,1] per row, rank by u_i^(1/w_i)
# descending, keep the top n — equivalently keep the n SMALLEST exponential
# keys E_i = -ln(u_i)/w_i ~ Exp(w_i). For n = 1 the winner is row i with
# probability exactly w_i/Σw; for n > 1 the scheme is the standard
# exponential-race WOR sample ("successive sampling" / PPS-without-
# replacement inclusion semantics).
#
# Determinism protocol (the op-92 portable-hash discipline): u_i derives
# from the seeded mixed hash — u = (mix + 1)/(HASH_MOD + 1) ∈ (0, 1] with
# mix = (poly_hash(key ‖ salt)·A + B) mod HASH_MOD — so the same (key,
# salt) draws the same u on any engine, any partitioning, any day, and a
# fresh salt draws an independent sample. The ONE float step, -ln(u)/w, is
# evaluated on argument-identical doubles in both engines (division and
# ln of the same rational — the q78 rounded-ln precedent) and immediately
# locked to DECIMAL(28,12) (both engines round half-up for positive
# values), so the ORDER that decides membership is a decimal order with a
# (key)-tiebreak — engine-exact. Falling out for free: a smaller n picks
# a PREFIX of a larger n's sample (nesting), and membership is invariant
# to input partitioning and row order.
#
# Rows with NULL, NaN, or non-positive weight are EXCLUDED (outside the
# E-S domain: w ≤ 0 has no exponential race; NaN compares > 0 under BOTH
# engines' total ordering, so it needs its own filter — ADVICE r11). The
# decimal lock bounds the representable key: -ln(u) ≤ ln(HASH_MOD+1)
# ≈ 42.3, so any w ≥ 4.3e-15 is always in range for DECIMAL(28,12)
# (max ~10^16); a smaller w can overflow for unlucky draws. Overflow is
# handled identically in both engines — try_cast/TRY_CAST to NULL, then
# the NULL race key is EXCLUDED from the race (never allowed to sort
# NULLS FIRST into the sample; Spark ASC is NULLS FIRST, DuckDB NULLS
# LAST — leaving them in would both corrupt and diverge).
#
# Scale shape: the key is a scan-stage projection (zero shuffle); the
# global variant is orderBy(limit) — Spark plans TakeOrderedAndProject,
# a per-partition partial top-n + one n-row merge, never a full sort;
# the per-group variant is one row_number window on the group key (the
# op-117 plan shape; group skew caveat and mitigation identical to
# group_sample_k). Differential gates: q81/q82 (DuckDB twin, identical
# hash + decimal order), inclusion-probability law at n=1, nesting,
# salt independence, partition invariance (tests/test_weighted_sample.py).

_ES_DEC = "decimal(28,12)"


def _es_key(key_col: str, weight_col: str, salt: str) -> Column:
    h = H.poly_hash(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    mix = F.pmod(h * F.lit(SAMPLE_A) + F.lit(SAMPLE_B), F.lit(H.HASH_MOD))
    u = (mix.cast("double") + F.lit(1.0)) / F.lit(float(H.HASH_MOD + 1))
    # try_cast, not cast: a sub-4.3e-15 weight can overflow the decimal
    # lock; under ANSI a plain cast would crash the job on one bad row,
    # and with ANSI off it would NULL — both wrong. try_cast → NULL →
    # the caller EXCLUDES the row (matching the DuckDB twin's TRY_CAST).
    return (-F.log(u) / F.col(weight_col).cast("double")).try_cast(_ES_DEC)


def weighted_sample_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Exactly ``n`` rows (fewer only if fewer qualify), probability of
    selection increasing in ``weight_col``, without replacement — the
    data-mixture primitive "exactly n docs, probability ∝ quality
    weight". Output: input columns + ``es_key`` (double, audit column:
    the decimal race key the selection ordered by).

    ``key_col`` must be a row identity (unique): the draw u derives
    from it, and it is the final tie-break — two distinct rows sharing
    a key would tie exactly at the cut line, where the survivor is
    engine-arbitrary."""
    ek = _es_key(key_col, weight_col, salt)
    return (
        # NULL keys are outside the race too (no identity → no
        # deterministic draw) — and they MUST be filtered, not sorted:
        # a NULL race key sorts NULLS FIRST under Spark ASC but NULLS
        # LAST in DuckDB, so leaving them in would diverge the engines.
        # NaN weights need their own clause: NaN > 0 is TRUE under both
        # engines' total ordering (ADVICE r11).
        df.filter(
            (F.col(weight_col).cast("double") > 0)
            & ~F.isnan(F.col(weight_col).cast("double"))
            & F.col(key_col).isNotNull()
        )
        .withColumn("_ek", ek)
        # decimal-overflow (w < ~4.3e-15) try_casts to NULL → excluded
        .filter(F.col("_ek").isNotNull())
        .orderBy(F.col("_ek").asc(), F.col(key_col).asc())
        .limit(n)
        .withColumn("es_key", F.col("_ek").cast("double"))
        .drop("_ek")
    )


def group_weighted_sample_k(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Per-group fixed-size weighted sample without replacement: the
    k smallest exponential race keys inside each group (one window
    shuffle on the group key). Output: input columns + ``es_key``."""
    from pyspark.sql import Window

    ek = _es_key(key_col, weight_col, salt)
    w = Window.partitionBy(group_col).orderBy(
        F.col("_ek").asc(), F.col(key_col).asc()
    )
    return (
        df.filter(
            (F.col(weight_col).cast("double") > 0)
            & ~F.isnan(F.col(weight_col).cast("double"))
            & F.col(key_col).isNotNull()
        )
        .withColumn("_ek", ek)
        # exclusion BEFORE the window: an overflowed (NULL) key must not
        # consume a row_number slot in its group
        .filter(F.col("_ek").isNotNull())
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .withColumn("es_key", F.col("_ek").cast("double"))
        .drop("_ek", "_rk")
    )


def _sql_es_key(key_expr: str, weight_expr: str, salt: str) -> str:
    esc = salt.replace("'", "''")
    keyed = (
        f"(CAST({key_expr} AS VARCHAR) || '{esc}')"
        if salt
        else f"CAST({key_expr} AS VARCHAR)"
    )
    h = H.sql_poly_hash(keyed)
    mix = f"((({h}) * {SAMPLE_A} + {SAMPLE_B}) % {H.HASH_MOD})"
    u = f"((CAST({mix} AS DOUBLE) + 1.0) / {float(H.HASH_MOD + 1)!r})"
    # TRY_CAST mirrors Spark's try_cast: decimal overflow → NULL →
    # excluded from the race (instead of a hard error on one bad row)
    return (
        f"TRY_CAST(-ln({u}) / CAST({weight_expr} AS DOUBLE)"
        f" AS DECIMAL(28,12))"
    )


def sql_weighted_sample_k(
    source: str,
    key_col: str,
    weight_expr: str,
    n: int,
    salt: str = "",
) -> str:
    """DuckDB twin of :func:`weighted_sample_k` — identical hash, u,
    decimal race key, order, and cut. Output schema matches the Spark
    side: the source columns + ``es_key`` (EXCLUDE keeps the helper
    column out of ``*``)."""
    ek = _sql_es_key(key_col, weight_expr, salt)
    return (
        f"SELECT * EXCLUDE (_ek), CAST(_ek AS DOUBLE) AS es_key FROM ("
        f"SELECT *, {ek} AS _ek FROM {source} "
        f"WHERE CAST({weight_expr} AS DOUBLE) > 0 "
        f"AND NOT isnan(CAST({weight_expr} AS DOUBLE)) "
        f"AND {key_col} IS NOT NULL"
        f") WHERE _ek IS NOT NULL "
        f"ORDER BY _ek ASC, {key_col} ASC LIMIT {n}"
    )


def sql_group_weighted_sample_k(
    source: str,
    group_col: str,
    key_col: str,
    weight_expr: str,
    k: int,
    salt: str = "",
) -> str:
    """DuckDB twin of :func:`group_weighted_sample_k`."""
    ek = _sql_es_key(key_col, weight_expr, salt)
    return (
        f"SELECT * EXCLUDE (_ek, _rk), CAST(_ek AS DOUBLE) AS es_key "
        f"FROM ("
        f"SELECT *, row_number() OVER "
        f"(PARTITION BY {group_col} ORDER BY _ek ASC, {key_col} ASC) AS _rk "
        f"FROM (SELECT *, {ek} AS _ek FROM {source} "
        f"WHERE CAST({weight_expr} AS DOUBLE) > 0 "
        f"AND NOT isnan(CAST({weight_expr} AS DOUBLE)) "
        f"AND {key_col} IS NOT NULL) "
        f"WHERE _ek IS NOT NULL"
        f") WHERE _rk <= {k}"
    )
