"""Corpus drift report — snapshot-to-snapshot monitoring (SURVEY §2
op 133).

A continuously-refreshed corpus needs "what changed since the last
snapshot?" answered by the engine's own gated operators (the op-86
datasheet rule, applied to DELTAS): did a source's token share move,
did the length distribution shift, did the duplication rate jump, and —
the question counts cannot answer — how much of the new snapshot's
CONTENT is genuinely new vs carried over? Composition, not new
machinery:

* per-source document/token counts and share deltas — two bounded mix
  aggregates (the datasheet's own);
* length-distribution shift — op 77's mergeable log2 histograms from
  both snapshots, compared driver-side with Jensen-Shannon divergence
  (base-2, so JS ∈ [0, 1]; computed from ≤ 41-bucket tables, never the
  corpus);
* exact-duplication-rate delta — op 16's content groups on each side;
* content novelty/retention — op 114 bottom-k states over the op-28
  normalized-text fingerprints of both snapshots, intersected with the
  op-131 KMV estimator: retention = |new ∩ old| / |new| (EXACT when
  both snapshots have fewer than k distinct texts AND their union fits
  in k — the op-131 tightened under-full contract; an estimate,
  flagged, otherwise; None when the union sample holds no new-snapshot
  key, where any number would be a guess).

Self-laws (pinned in test_drift.py): drift(X, X) has zero deltas, zero
JS divergence, retention 1 / novelty 0 — EXACTLY, at any size (the
same hash sets intersect fully); planted drift (a new source, shifted
lengths, injected duplicates, fresh content) moves exactly the
matching panel. Cost: two datasheet-class passes, one per snapshot;
every collect is bounded (mixes, ≤ 41 buckets, k-row sketch states).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.dedup import text_key
from dwca_parquet_spark.operators.rollup import log_hist_partial
from dwca_parquet_spark.operators.sketch import bottomk_build
from dwca_parquet_spark.operators.text import token_count

__all__ = [
    "collect_side",
    "compose_drift_report",
    "corpus_drift",
    "js_divergence",
    "kmv_retention",
    "side_frames",
]

DRIFT_K = 512  # bottom-k size for the novelty/retention estimate


def js_divergence(pa: dict[int, int], pb: dict[int, int]) -> float:
    """Jensen-Shannon divergence (base 2, ∈ [0,1]) between two count
    histograms (driver-side; inputs are bounded bucket tables)."""
    na, nb = sum(pa.values()), sum(pb.values())
    if na == 0 or nb == 0:
        return 1.0 if na != nb else 0.0
    keys = set(pa) | set(pb)
    js = 0.0
    for kx in keys:
        p = pa.get(kx, 0) / na
        q = pb.get(kx, 0) / nb
        m = (p + q) / 2
        if p > 0:
            js += 0.5 * p * math.log2(p / m)
        if q > 0:
            js += 0.5 * q * math.log2(q / m)
    return js


def kmv_retention(
    sk_a: set, sk_b: set, k: int
) -> tuple[float | None, bool]:
    """(retention, exact) from two bottom-k fingerprint states (sets of
    (key, bottomk_hash) pairs): the k smallest of the union is a valid
    KMV of it; membership of each sampled new-side key in the old key
    set estimates retention = |new ∩ old| / |new| (the op-131
    estimator). retention is None when the union sample holds no
    new-side key (possible when new ≪ old — any number would be a
    guess; ADVICE round 8). exact ⟺ both states are complete key sets
    (under-full) AND the union fits in k, the op-131 tightened
    condition."""
    keys_a = {key for key, _ in sk_a}
    union = sorted(sk_a | sk_b, key=lambda kv: (kv[1], kv[0]))[:k]
    new_keys = {key for key, _ in sk_b}
    x_new = [key for key, _ in union if key in new_keys]
    retained = sum(1 for key in x_new if key in keys_a)
    retention = retained / len(x_new) if x_new else None
    exact = len(sk_a) < k and len(sk_b) < k and len(sk_a | sk_b) <= k
    return retention, exact


def side_frames(df: DataFrame, id_col: str, text_col: str, source_col):
    """The four panel partials as DataFrames — every one a mergeable
    summary (additive counts / additive counts / additive per-hash
    counts / a KMV lattice element), which is exactly what lets
    streaming/drift.py (op 135) fold them per micro-batch with a
    bit-exact fold ≡ one-shot law:

    * mix    (_src, docs, toks)
    * hist   (bucket, cnt) — op 77 log2 partial
    * dups   (text_hash, n) — per-content-hash multiplicities, the op-16
             key (text_key), so dup-rate numbers equal dedup_exact's
    * sketch (key, _bh) — op 114 bottom-k over the SAME content hash
             (text_key's poly-hash chain is the fingerprint chain)
    """
    stats = df.select(
        F.col(id_col),
        F.col(source_col).alias("_src") if source_col else F.lit("all").alias("_src"),
        token_count(F.col(text_col)).alias("_nt"),
    )
    mix = stats.groupBy("_src").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("_nt").alias("toks")
    )
    hist = log_hist_partial(stats, "_nt")
    keyed = text_key(df, id_col, text_col)
    dups = keyed.groupBy("text_hash").agg(F.count(F.lit(1)).alias("n"))
    sketch = bottomk_build(
        keyed.select(F.col("text_hash").alias("_fp")), "_fp", DRIFT_K
    )
    return mix, hist, dups, sketch


def _side_stats(df: DataFrame, id_col: str, text_col: str, source_col):
    mix_df, hist_df, dups_df, sketch_df = side_frames(
        df, id_col, text_col, source_col
    )
    return collect_side(mix_df, hist_df, dups_df, sketch_df)


def collect_side(mix_df, hist_df, dups_df, sketch_df):
    """Bounded collects of the panel frames into the tuple
    compose_drift_report consumes — shared by the one-shot path and the
    stored-state path so both sides reduce identically."""
    mix = {
        r["_src"]: (r["docs"], r["toks"] or 0) for r in mix_df.collect()
    }
    hist = {int(r["bucket"]): int(r["cnt"]) for r in hist_df.collect()}
    dup_row = dups_df.agg(
        F.count(F.lit(1)).alias("distinct_texts"),
        F.sum(F.col("n") - 1).alias("redundant"),
    ).first()
    dup = {
        "distinct_texts": dup_row["distinct_texts"],
        "redundant": dup_row["redundant"],
    }
    sketch = {(r["key"], r["_bh"]) for r in sketch_df.collect()}
    n_docs = sum(d for d, _ in mix.values())
    return mix, hist, dup, sketch, n_docs


def corpus_drift(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str | None = None,
    name: str = "corpus",
) -> tuple[str, dict]:
    """(markdown report, metrics dict) comparing two snapshots. See the
    module docstring for the panels and their laws."""
    side_a = _side_stats(old, id_col, text_col, source_col)
    side_b = _side_stats(new, id_col, text_col, source_col)
    return compose_drift_report(side_a, side_b, name)


def compose_drift_report(side_a, side_b, name: str) -> tuple[str, dict]:
    """The report composition over two side-stat tuples (mix, hist,
    dup, sketch, n_docs) — shared verbatim by the one-shot snapshot
    compare above and the streaming state compare
    (streaming/drift.py, op 135), which is what makes the fold ≡
    one-shot law a statement about the STATS, not two report
    implementations."""
    mix_a, hist_a, dup_a, sk_a, n_a = side_a
    mix_b, hist_b, dup_b, sk_b, n_b = side_b
    tok_a = sum(t for _, t in mix_a.values()) or 1
    tok_b = sum(t for _, t in mix_b.values()) or 1
    js = js_divergence(hist_a, hist_b)
    dup_rate_a = (dup_a["redundant"] or 0) / max(n_a, 1)
    dup_rate_b = (dup_b["redundant"] or 0) / max(n_b, 1)
    retention, exact = kmv_retention(sk_a, sk_b, DRIFT_K)
    metrics = {
        "docs_old": n_a,
        "docs_new": n_b,
        "tokens_old": tok_a,
        "tokens_new": tok_b,
        "length_js_divergence": round(js, 6),
        "dup_rate_old": round(dup_rate_a, 6),
        "dup_rate_new": round(dup_rate_b, 6),
        "dup_rate_delta": round(dup_rate_b - dup_rate_a, 6),
        "retention": round(retention, 6) if retention is not None else None,
        "novelty": (
            round(1.0 - retention, 6) if retention is not None else None
        ),
        "overlap_exact": exact,
        "source_deltas": {},
    }
    lines = [
        f"# Drift report: {name}",
        "",
        f"- documents: {n_a:,} → {n_b:,} ({n_b - n_a:+,})",
        f"- tokens: {tok_a:,} → {tok_b:,} ({tok_b - tok_a:+,})",
        f"- token-length distribution JS divergence (base 2): {js:.6f}",
        f"- exact-dup rate: {dup_rate_a:.4f} → {dup_rate_b:.4f} "
        f"({dup_rate_b - dup_rate_a:+.4f})",
        (
            f"- content retention (new ∩ old / new, KMV k={DRIFT_K}"
            f"{', exact' if exact else ', estimate'}): {retention:.4f}"
            f" — novelty {1 - retention:.4f}"
            if retention is not None
            else f"- content retention (KMV k={DRIFT_K}): UNKNOWN — no "
            "new-snapshot key in the union sample (degenerate estimate)"
        ),
        "",
        "## Source mix drift (token share)",
        "| source | old share | new share | delta |",
        "|---|---|---|---|",
    ]
    for src in sorted(set(mix_a) | set(mix_b)):
        sa = mix_a.get(src, (0, 0))[1] / tok_a
        sb = mix_b.get(src, (0, 0))[1] / tok_b
        metrics["source_deltas"][src] = round(sb - sa, 6)
        flag = " ⚠" if abs(sb - sa) > 0.05 else ""
        lines.append(
            f"| {src} | {sa:.2%} | {sb:.2%} | {sb - sa:+.2%}{flag} |"
        )
    return "\n".join(lines) + "\n", metrics
