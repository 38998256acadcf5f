"""End-to-end training-data pipeline composition: the operators are built
to chain, and this test runs the realistic chain on the fixture corpus —

    quality filter → stratified sample → fuzzy-dedup keep-best →
    PII redaction → chunking → token accounting

— asserting the structural invariants each stage guarantees to the next.
No oracle here (each operator has its own differential gate); this pins
COMPOSITION: schemas line up, determinism survives chaining, and the
corpus only ever shrinks where it must.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.dedup import dedup_clusters
from dwca_parquet_spark.operators.sampling import stratified_sample
from dwca_parquet_spark.operators.text import (
    chunk_documents,
    quality_score,
    redact_pii,
    token_count,
)
from tests.conftest import SF_T2


def test_pretraining_pipeline_composes(spark):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    n_docs = docs.count()

    # 1. quality gate: drop the low bucket
    scored = docs.join(quality_score(docs, "doc_id", "text"), "doc_id")
    kept = scored.filter(F.col("quality_bucket") != "low")
    n_kept = kept.count()
    assert 0 < n_kept <= n_docs

    # 2. language-mix rebalance (deterministic)
    langs = [r.lang for r in kept.select("lang").distinct().collect()]
    mix = {lang: 1.0 if i % 2 == 0 else 0.5 for i, lang in enumerate(sorted(langs))}
    sampled = stratified_sample(kept, "lang", "doc_id", mix)
    n_sampled = sampled.count()
    assert 0 < n_sampled <= n_kept
    # rerun → identical selection (the whole point of hash sampling)
    assert sampled.select("doc_id").collect() == stratified_sample(
        kept, "lang", "doc_id", mix
    ).select("doc_id").collect()

    # 3. fuzzy dedup, keep the best-quality doc per near-dup cluster
    clusters = dedup_clusters(sampled, "doc_id", "text")
    manifest = (
        sampled.join(clusters, "doc_id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("cluster_id").orderBy(
                    F.col("quality_score").desc(), F.col("doc_id").asc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    n_final = manifest.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    assert n_final == n_clusters  # exactly one doc per cluster
    assert n_final <= n_sampled

    # 4. PII scrub, then chunk the redacted text
    clean = manifest.join(
        redact_pii(manifest, "doc_id", "text"), "doc_id"
    ).select("doc_id", F.col("redacted_text").alias("text"))
    chunks = chunk_documents(clean, "doc_id", "text", chunk_tokens=64, overlap=8)

    # every chunk obeys the size contract and belongs to a surviving doc
    stats = chunks.agg(
        F.max("n_chunk_tokens").alias("mx"),
        F.min("n_chunk_tokens").alias("mn"),
        F.countDistinct("doc_id").alias("docs_with_chunks"),
        F.count(F.lit(1)).alias("n_chunks"),
    ).collect()[0]
    assert stats.mx <= 64 and stats.mn >= 1
    assert stats.docs_with_chunks <= n_final
    assert stats.n_chunks >= stats.docs_with_chunks

    # 5. token accounting: chunked token mass ≥ raw (overlap duplicates),
    #    bounded by raw + n_chunks·overlap
    raw_tokens = clean.agg(
        F.sum(token_count(F.col("text")).cast("long")).alias("t")
    ).collect()[0].t
    chunk_tokens = chunks.agg(F.sum("n_chunk_tokens").alias("t")).collect()[0].t
    assert raw_tokens <= chunk_tokens <= raw_tokens + stats.n_chunks * 8


def test_crawl_pipeline_composes(spark, tmp_path):
    """The crawl chain, end-to-end on synthetic WARC archives:

        WARC → decode → html_extract_text → canonical-URL dedup →
        quality stats → BPE encode

    Pins composition: payload bytes survive the reader, markup never
    reaches the text operators, URL variants that canonicalize equal
    collapse to one document, and the kept corpus tokenizes losslessly.
    """
    import gzip

    from dwca_parquet_spark.operators.bpe import bpe_encode, bpe_fit
    from dwca_parquet_spark.operators.html import clean_text_col
    from dwca_parquet_spark.operators.text import (
        canonicalize_urls,
        text_stats,
    )
    from dwca_parquet_spark.sources.warc import read_warc

    def record(uri: str, body: str) -> bytes:
        payload = (
            "<html><head><title>t</title><script>no()</script></head>"
            f"<body><nav><a href='/'>nav</a></nav><p>{body}</p>"
            "<!-- boilerplate --></body></html>"
        ).encode()
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: 2026-08-14T00:00:00Z\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        return head + payload + b"\r\n\r\n"

    # two URL variants of the SAME page (tracking param, default port,
    # host case) + two genuinely distinct pages
    arc = (
        record("http://A.example.com:80/page?utm_source=x", "same page body here")
        + record("http://a.example.com/page", "same page body here")
        + record("https://b.example.org/other", "a different page entirely")
        + record("https://c.example.net/third", "the third page text runs long "
                 "enough to matter for quality statistics and packing")
    )
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc").write_bytes(arc)
    (d / "b.warc.gz").write_bytes(gzip.compress(arc))  # a replayed copy

    raw = read_warc(spark, d)
    assert raw.count() == 8  # 4 responses × 2 files

    pages = raw.select(
        F.col("target_uri").alias("url"),
        F.decode(F.col("payload"), "UTF-8").alias("html"),
    )
    # the column-level extraction composes without a join (the operator
    # wrapper projects to its own schema; here url must ride along)
    extracted = canonicalize_urls(
        pages.select("url", clean_text_col(F.col("html")).alias("text")),
        "url",
    )

    # markup and boilerplate never reach the corpus
    texts = [r["text"] for r in extracted.collect()]
    assert all("<" not in t and "nav" not in t and "no()" not in t for t in texts)

    # canonical dedup: keep the lexicographically-first raw URL per key
    w = Window.partitionBy("canonical_url").orderBy("url", "text")
    kept = (
        extracted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    kept_rows = kept.collect()
    # 8 raw → 3 canonical pages (variants + replay all collapse)
    assert len(kept_rows) == 3
    canon = sorted(r["canonical_url"] for r in kept_rows)
    assert canon == [
        "http://a.example.com/page",
        "https://b.example.org/other",
        "https://c.example.net/third",
    ]

    # quality stats flow; token accounting is lossless through BPE
    stats = text_stats(kept, "canonical_url", "text")
    assert stats.filter(F.col("n_tokens") <= 0).count() == 0
    model = bpe_fit(kept, "text", n_merges=8)
    enc = bpe_encode(kept, "canonical_url", "text", model)
    from dwca_parquet_spark.functions.hashing import normalize_text_py

    by_url = {r["canonical_url"]: r for r in enc.collect()}
    for r in kept_rows:
        toks = by_url[r["canonical_url"]]["bpe_tokens"]
        rebuilt = "".join(toks).replace("</w>", " ").strip()
        assert rebuilt == " ".join(normalize_text_py(r["text"]).split())


def test_crawl_chain_leakage_fence_and_split_manifests(spark, tmp_path):
    """Round 7 (VERDICT r6 next #6): the chain's FINAL fence — op 113's
    leakage-safe split feeding per-split verified shard exports. Pins:
    every kept document lands in exactly one split; planted near-dup
    pairs NEVER straddle splits; the three manifests are individually
    verifiable and their doc counts sum to the corpus."""
    import random

    from dwca_parquet_spark.operators.sampling import leakage_safe_split
    from dwca_parquet_spark.sinks.shards import (
        verify_shards,
        write_training_shards,
    )

    rng = random.Random(20260815)
    # unique random words per doc: shingles are CHARACTER k-grams, so a
    # shared tiny vocabulary would make every random doc pair a genuine
    # near-dup and collapse the corpus into one cluster
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def word():
        return "".join(rng.choice(alpha) for _ in range(8))

    rows = []
    for i in range(90):
        rows.append(
            (f"https://s{i}.example/p", " ".join(word() for _ in range(30)))
        )
    # planted near-dup pairs: same text + two extra tokens
    planted = []
    for i in range(12):
        dup_id = f"https://dup{i}.example/p"
        rows.append((dup_id, rows[i][1] + " zz yy"))
        planted.append((rows[i][0], dup_id))
    docs = spark.createDataFrame(rows, "doc_id string, text string")

    assigned = leakage_safe_split(docs, "doc_id", "text").persist()
    by_id = {r["doc_id"]: r["split"] for r in assigned.collect()}
    assert len(by_id) == len(rows)  # one row per id
    for a, b in planted:  # the fence: near-dups share a split
        assert by_id[a] == by_id[b], (a, b)

    totals = 0
    for split_name in ("train", "val", "test"):
        part = docs.join(
            assigned.filter(F.col("split") == split_name).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        out = tmp_path / f"shards_{split_name}"
        manifest = write_training_shards(
            part, out, "doc_id", "text", n_shards=4
        )
        n = manifest.agg(F.sum("n_docs")).collect()[0][0] or 0
        totals += int(n)
        assert verify_shards(spark, out, "doc_id").count() == 0
        assert n == sum(1 for s in by_id.values() if s == split_name)
    assert totals == len(rows)  # the fence partitions, never drops
    assigned.unpersist()
