"""Corpus datasheet generator (SURVEY §2 round-4 extension).

"Datasheets for Datasets" (Gebru et al. 2021; PAPERS.md) made dataset
documentation a release artifact; every serious corpus ships one. This
composes the engine's OWN gated operators — token accounting
(text_stats), exact-dup profiling (dedup_exact), length distribution
(rollup.log_hist), per-source/language mixes — into one markdown card,
so the datasheet numbers are definitionally the numbers the pipeline
computed, not a second implementation that can drift.

Cost shape: one pass for the token/length stats, one content-hash
groupBy for the dup profile, two tiny mix aggregates; every collect is
bounded (scalars, ≤41 histogram buckets, |sources|, |languages|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.dedup import dedup_exact
from dwca_parquet_spark.operators.rollup import log_hist_partial
from dwca_parquet_spark.operators.text import (
    c4_clean,
    gopher_quality,
    text_stats,
)


def _f3(x: float | None) -> str:
    """Format a mean to 3 decimals; NULL aggregates (all-empty/NULL-text
    corpus) render as 'n/a' instead of raising TypeError in the card."""
    return "n/a" if x is None else f"{x:.3f}"


def corpus_card(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str | None = None,
    lang_col: str | None = None,
    name: str = "corpus",
    url_col: str | None = None,
    url_diversity_k: int = 128,
) -> str:
    """Markdown datasheet for a document table. Deterministic: every
    number is an exact aggregate; orderings are explicit.

    ``url_col``: pass the document-URL column to add a per-domain URL
    diversity panel — op 117's per-group bottom-k over (domain, url),
    KMV-estimated distinct URLs per domain (exact for domains under
    ``url_diversity_k`` URLs). The crawl-provenance question ("is this
    domain a thousand pages or one page mirrored a thousand times?")
    answered by the engine's own gated sketch, per the op-86 rule that
    datasheet numbers ARE operator outputs. Bounded: state ≤ k rows per
    domain, collect ≤ |domains| rows.
    """
    stats = text_stats(df, id_col, text_col)
    totals = stats.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("n_chars").alias("chars"),
        F.min("n_tokens").alias("min_t"),
        F.max("n_tokens").alias("max_t"),
    ).first()

    groups = dedup_exact(df, id_col, text_col)
    dup = groups.agg(
        F.count(F.lit(1)).alias("distinct_texts"),
        F.sum(F.col("n_copies") - 1).alias("redundant_docs"),
    ).first()

    hist = sorted(
        (r["bucket"], r["cnt"])
        for r in log_hist_partial(stats, "n_tokens").collect()
    )

    # the two canonical web filters' verdicts (ops 99 and 102), each one
    # zero-shuffle scan reduced to scalars
    c4 = c4_clean(df, id_col, text_col).agg(
        F.sum(F.col("keep").cast("long")).alias("kept")
    ).first()
    gq = gopher_quality(df, id_col, text_col).agg(
        F.sum(F.col("keep").cast("long")).alias("kept"),
        F.avg("alpha_word_frac").alias("alpha"),
        F.avg("dup_line_frac").alias("dup_lines"),
    ).first()

    # statistical repetition signals (op 116): scan-stage entropy fold +
    # one Arrow pass for zlib; both reduce to scalars
    from dwca_parquet_spark.operators.text import (
        compression_ratio,
        word_entropy,
    )

    ent = word_entropy(df, id_col, text_col).agg(
        F.avg("word_entropy").alias("mean_h")
    ).first()
    zr = compression_ratio(df, id_col, text_col).agg(
        F.avg("zlib_ratio").alias("mean_r"),
        F.sum((F.col("zlib_ratio") < 0.3).cast("long")).alias("suspicious"),
    ).first()

    lines = [
        f"# Datasheet: {name}",
        "",
        "## Size",
        f"- documents: {totals['docs']:,}",
        f"- tokens (whitespace): {totals['tokens']:,}",
        f"- characters (normalized): {totals['chars']:,}",
        f"- tokens per document: min {totals['min_t']}, max {totals['max_t']}",
        "",
        "## Exact duplication",
        f"- distinct normalized texts: {dup['distinct_texts']:,}",
        f"- redundant documents (exact copies beyond the first): "
        f"{dup['redundant_docs']:,} "
        f"({dup['redundant_docs'] / max(totals['docs'], 1):.2%})",
        "",
        "## Quality filters",
        f"- C4 line/page rules pass: {c4['kept']:,} "
        f"({c4['kept'] / max(totals['docs'], 1):.2%})",
        f"- Gopher rules pass: {gq['kept']:,} "
        f"({gq['kept'] / max(totals['docs'], 1):.2%})",
        f"- mean alpha-word fraction: {_f3(gq['alpha'])}; "
        f"mean duplicate-line fraction: {_f3(gq['dup_lines'])}",
        f"- mean word entropy (nats): {_f3(ent['mean_h'])}; "
        f"mean zlib ratio: {_f3(zr['mean_r'])}; "
        f"docs compressing below 0.3 (repetition suspects): "
        f"{zr['suspicious'] or 0:,}",
        "",
        "## Document length (log2 token buckets)",
        "| bucket (tokens ≥) | documents |",
        "|---|---|",
    ]
    for b, c in hist:
        lines.append(f"| {2**b:,} | {c:,} |")

    for label, col in (("Source mix", source_col), ("Language mix", lang_col)):
        if col is None:
            continue
        mix = (
            df.join(stats.select(id_col, "n_tokens"), id_col)
            .groupBy(col)
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("n_tokens").alias("tokens"),
            )
            .orderBy(F.desc("tokens"), F.asc(col))
            .collect()
        )
        total_tokens = max(totals["tokens"], 1)
        lines += ["", f"## {label}", f"| {col} | documents | tokens | token share |", "|---|---|---|---|"]
        for r in mix:
            lines.append(
                f"| {r[col]} | {r['docs']:,} | {r['tokens']:,} | "
                f"{r['tokens'] / total_tokens:.2%} |"
            )

    if source_col is not None:
        from dwca_parquet_spark.functions import hashing as H
        from dwca_parquet_spark.operators.sketch import (
            heavy_hitters_by_group,
        )

        # dominant repeated texts per source (op 126) — the mirror
        # question per source: exact-dup profiling says HOW MUCH is
        # duplicated, this says WHAT dominates where. Items are the
        # normalized-text fingerprint (op 28's protocol: staged
        # normalize, then the portable hash), counts are op 126's
        # verified-exact counts; the panel is a filter/sort of the
        # operator output, nothing recomputed.
        fp = (
            df.select(
                F.col(source_col),
                H.normalize_text(F.col(text_col)).alias("_norm"),
            )
            .select(source_col, H.poly_hash(F.col("_norm")).alias("_fp"))
        )
        hh = heavy_hitters_by_group(fp, source_col, "_fp", 16)
        top = (
            hh.filter(F.col("cnt") >= 2)
            .orderBy(F.desc("cnt"), F.asc("group"), F.asc("item"))
            .limit(30)
            .collect()  # bounded: ≤ 30 rows of the ≤ groups·16 output
        )
        lines += [
            "",
            "## Dominant repeated texts per source (exact counts, k=16)",
            "| source | text fingerprint | copies |",
            "|---|---|---|",
        ]
        if not top:
            lines.append("| (no text repeated ≥ 2× within a source) | | |")
        for r in top:
            lines.append(f"| {r['group']} | {r['item']} | {r['cnt']:,} |")

        # cross-source overlap (op 131) — KMV Jaccard between the
        # sources' distinct-text sets over the SAME fingerprint table:
        # "how much of source A is also in source B" (mirrors,
        # cross-source contamination). Exact for sources under k=256
        # distinct texts; estimates elsewhere (flagged).
        from dwca_parquet_spark.operators.sketch import (
            bottomk_by_group,
            group_overlap_estimates,
        )

        ov_state = bottomk_by_group(fp, source_col, "_fp", 256)
        overlaps = (
            group_overlap_estimates(ov_state, 256)
            .orderBy(F.desc("jaccard_est"), F.asc("grp_a"), F.asc("grp_b"))
            .collect()  # bounded: one row per source pair
        )
        lines += [
            "",
            "## Cross-source text overlap (KMV, k=256)",
            "| source A | source B | Jaccard | shared texts (est) | exact |",
            "|---|---|---|---|---|",
        ]
        for r in overlaps:
            lines.append(
                f"| {r['grp_a']} | {r['grp_b']} | {r['jaccard_est']:.4f} | "
                f"{r['intersect_est']:,.0f} | "
                f"{'yes' if r['exact'] else 'no'} |"
            )

    if url_col is not None:
        from dwca_parquet_spark.operators.sketch import (
            bottomk_by_group,
            bottomk_group_estimates,
        )

        # the SAME host extraction as op-122's blocklist filter
        # (userinfo stripped, query/fragment excluded, trailing dots
        # trimmed) — a laxer regex would split one domain's URLs into
        # phantom per-query-string panel rows
        with_domain = df.select(
            F.regexp_replace(
                F.lower(
                    F.regexp_extract(
                        F.col(url_col),
                        r"https?://(?:[^/\s@]*@)?([^/\s:?#]+)",
                        1,
                    )
                ),
                r"\.+$",
                "",
            ).alias("_domain"),
            F.col(url_col),
        ).filter(F.col("_domain") != "")
        state = bottomk_by_group(
            with_domain, "_domain", url_col, url_diversity_k
        )
        est = (
            bottomk_group_estimates(state, url_diversity_k)
            .orderBy(F.desc("distinct_est"), F.asc("grp"))
            .collect()  # bounded: one row per domain
        )
        lines += [
            "",
            f"## URL diversity (per domain, bottom-k k={url_diversity_k})",
            "| domain | sampled | distinct URLs (est) |",
            "|---|---|---|",
        ]
        for r in est:
            lines.append(
                f"| {r['grp']} | {r['n_sampled']:,} | "
                f"{r['distinct_est']:,} |"
            )
    return "\n".join(lines) + "\n"
