"""Corpus datasheet (SURVEY §2 round-4): the card's numbers ARE the
gated operators' numbers (recomputed independently here), and the output
is deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwca_parquet_spark.reports import corpus_card
from tests.conftest import SF_T2


def test_corpus_card_numbers_and_determinism(spark):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    card = corpus_card(
        docs, "doc_id", "text", source_col="source", lang_col="lang",
        name="fixture-sf0.01",
    )
    assert card == corpus_card(
        docs, "doc_id", "text", source_col="source", lang_col="lang",
        name="fixture-sf0.01",
    )

    n_docs = docs.count()
    assert f"- documents: {n_docs:,}" in card

    from dwca_parquet_spark.operators.text import text_stats

    n_tokens = (
        text_stats(docs, "doc_id", "text").agg(F.sum("n_tokens")).first()[0]
    )
    assert f"- tokens (whitespace): {n_tokens:,}" in card

    from dwca_parquet_spark.operators.dedup import dedup_exact

    distinct = dedup_exact(docs, "doc_id", "text").count()
    assert f"- distinct normalized texts: {distinct:,}" in card

    # structure: all sections present; mixes list every source/language
    for section in ("## Size", "## Exact duplication", "## Quality filters",
                    "## Document length", "## Source mix", "## Language mix"):
        assert section in card

    from dwca_parquet_spark.operators.text import gopher_quality

    gq_kept = (
        gopher_quality(docs, "doc_id", "text").filter("keep").count()
    )
    assert f"- Gopher rules pass: {gq_kept:,}" in card
    for r in docs.select("lang").distinct().collect():
        assert f"| {r['lang']} |" in card


def test_corpus_card_statistical_signals(spark):
    """The op-116 line: entropy/zlib numbers in the card equal the
    operators' own aggregates (the card composes, never re-implements)."""
    from dwca_parquet_spark.operators.text import (
        compression_ratio,
        word_entropy,
    )

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    card = corpus_card(docs, "doc_id", "text", name="x")
    mean_h = (
        word_entropy(docs, "doc_id", "text")
        .agg(F.avg("word_entropy"))
        .first()[0]
    )
    mean_r = (
        compression_ratio(docs, "doc_id", "text")
        .agg(F.avg("zlib_ratio"))
        .first()[0]
    )
    assert f"- mean word entropy (nats): {mean_h:.3f}; " in card
    assert f"mean zlib ratio: {mean_r:.3f}; " in card


def test_corpus_card_url_diversity_panel(spark):
    """The op-117 panel (round 7): per-domain distinct-URL estimates in
    the card equal bottomk_group_estimates' own output over the same
    (domain, url) stream — the op-86 rule, numbers ARE operator
    outputs. Mirror-heavy vs diverse domains separate correctly."""
    from dwca_parquet_spark.operators.sketch import (
        bottomk_by_group,
        bottomk_group_estimates,
    )

    rows = []
    for i in range(300):  # diverse.example: 300 distinct URLs
        rows.append((i, f"https://diverse.example/page{i}", f"text {i}"))
    for i in range(300, 600):  # mirror.example: 1 URL repeated
        rows.append((i, "https://mirror.example/home", f"text {i}"))
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    k = 64
    card = corpus_card(
        docs, "doc_id", "text", name="u", url_col="url", url_diversity_k=k
    )
    with_domain = docs.select(
        F.regexp_replace(
            F.lower(
                F.regexp_extract(
                    F.col("url"), r"https?://(?:[^/\s@]*@)?([^/\s:?#]+)", 1
                )
            ),
            r"\.+$",
            "",
        ).alias("_domain"),
        F.col("url"),
    )
    est = {
        r["grp"]: (r["n_sampled"], r["distinct_est"])
        for r in bottomk_group_estimates(
            bottomk_by_group(with_domain, "_domain", "url", k), k
        ).collect()
    }
    assert est["mirror.example"] == (1, 1.0)  # under-full: exact
    assert est["diverse.example"][0] == k  # full sketch: KMV estimate
    for dom, (n, e) in est.items():
        assert f"| {dom} | {n:,} | {e:,} |" in card
    assert card.index("diverse.example") < card.index("mirror.example")


def test_corpus_card_dominant_repeats_panel(spark):
    """op-126 panel: planted per-source repeats surface with EXACT
    counts, and the panel rows equal the operator's own output."""
    rows = (
        [(i, "the repeated mirror page text", "siteA") for i in range(40)]
        + [(100 + i, f"unique text number {i}", "siteA") for i in range(30)]
        + [(500 + i, "another mirrored page", "siteB") for i in range(7)]
        + [(900 + i, f"fresh text {i}", "siteB") for i in range(20)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    card = corpus_card(df, "doc_id", "text", source_col="source", name="m")
    assert "## Dominant repeated texts per source" in card
    # exact counts of the planted repeats appear against their source
    assert "| siteA | " in card and "| 40 |" in card
    assert "| siteB | " in card and "| 7 |" in card
    # panel ≡ operator output (the op-86 discipline)
    from dwca_parquet_spark.functions import hashing as H
    from dwca_parquet_spark.operators.sketch import heavy_hitters_by_group

    fp = df.select(
        "source", H.normalize_text(F.col("text")).alias("_n")
    ).select("source", H.poly_hash(F.col("_n")).alias("_fp"))
    hh = {
        (r["group"], str(r["item"])): r["cnt"]
        for r in heavy_hitters_by_group(fp, "source", "_fp", 16)
        .filter(F.col("cnt") >= 2)
        .collect()
    }
    panel = [
        ln for ln in card.splitlines()
        if ln.startswith("| site") and ln.count("|") == 4
    ]
    assert len(panel) == len(hh) == 2
    for ln in panel:
        _, src, fp_s, cnt_s, _ = [p.strip() for p in ln.split("|")]
        assert hh[(src, fp_s)] == int(cnt_s.replace(",", ""))


def test_corpus_card_no_repeats_panel_row(spark):
    df = spark.createDataFrame(
        [(i, f"all unique {i}", "s") for i in range(25)],
        "doc_id long, text string, source string",
    )
    card = corpus_card(df, "doc_id", "text", source_col="source", name="u")
    assert "(no text repeated ≥ 2× within a source)" in card


def test_corpus_card_cross_source_overlap_panel(spark):
    """op-131 panel: planted 50% mirror between two sources surfaces
    with the exact Jaccard (sources under k → exact flag)."""
    rows = (
        [(i, f"shared text {i}", "mirrorA") for i in range(40)]
        + [(100 + i, f"shared text {i}", "mirrorB") for i in range(20)]
        + [(200 + i, f"only b {i}", "mirrorB") for i in range(20)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    card = corpus_card(df, "doc_id", "text", source_col="source", name="ov")
    assert "## Cross-source text overlap" in card
    # J(A,B) = 20 shared / 60 union... A has 40 distinct, B has 40
    # distinct (20 shared + 20 own) → union 60, J = 20/60
    assert f"| mirrorA | mirrorB | {20/60:.4f} | 20 | yes |" in card
