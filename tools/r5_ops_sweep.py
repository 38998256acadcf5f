#!/usr/bin/env python
"""Measured evidence for the round-5 operators (SCALE.md):

1. semantic_dedup — the SemDeDup cell-locality claim: candidate pairs
   Σ|cell|² vs the all-pairs n(n−1)/2, and wall-clock vs the exact
   block-matmul near-dup path, on synthetic embedding corpora well past
   the bundled sf0.1 size (the bundled table is only 2k vectors).
2. bpe_fit — driver vs distributed mode wall-clock at growing distinct-
   word counts (the table the merge loop actually runs on), plus
   bpe_encode throughput (tokens/s) on sf0.1 documents.
3. html_extract_text — extraction throughput (input MB/s) on sf0.1
   documents wrapped in markup.

Synthetic embeddings use planted cluster structure (Gaussian blobs) so
cells are meaningful, plus planted near-duplicates so the prune does
real work — generated fresh, never cloned from testdata.

Run: python tools/r5_ops_sweep.py [--quick]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from dwca_parquet_spark.cache import release_caches
from dwca_parquet_spark.operators.bpe import bpe_encode, bpe_fit
from dwca_parquet_spark.operators.html import html_extract_text
from dwca_parquet_spark.operators.semdedup import kmeans_fit, semantic_dedup
from dwca_parquet_spark.operators.similarity import embedding_neardup_pairs
from dwca_parquet_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def make_blobs(spark, n: int, dim: int = 64, n_blobs: int = 32, dup_frac: float = 0.05):
    rng = np.random.default_rng(42)
    centers = rng.normal(0, 1.0, size=(n_blobs, dim))
    base = n - int(n * dup_frac)
    assign = rng.integers(0, n_blobs, size=base)
    vecs = centers[assign] + rng.normal(0, 0.25, size=(base, dim))
    # planted near-dups: copies of existing rows with tiny scaling
    dup_src = rng.integers(0, base, size=n - base)
    dups = vecs[dup_src] * (1 + 1e-5)
    allv = np.vstack([vecs, dups]).astype(np.float32)
    if n <= 100_000:
        rows = [(int(i), allv[i].tolist()) for i in range(n)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # past 100k, driver-side python rows are the bottleneck — stage via
    # an arrow parquet file instead (still generated, never cloned)
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = tempfile.mkdtemp(prefix="blobs_") + "/blobs.parquet"
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(allv.reshape(-1), pa.float32()), dim
            ).cast(pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, path)
    return spark.read.parquet(path)


def bench_semdedup(spark, quick: bool):
    sizes = [20_000] if quick else [20_000, 100_000, 1_000_000]
    print("\n== semantic_dedup: cell-bounded candidates vs exact all-pairs ==")
    print("n | k_cells | cand_pairs | all_pairs | sem_dedup_s | exact_pairs_s")
    for n in sizes:
        df = make_blobs(spark, n).repartition(32).persist()
        df.count()
        k_cells = min(max(16, n // 2500), 400)  # keep |cell| ~ 2.5k
        t0 = time.time()
        out = semantic_dedup(
            df, "vec_id", "embedding", k_cells=k_cells, iters=1, threshold=0.99
        )
        n_keep = out.filter("keep").count()
        sem_s = time.time() - t0
        release_caches()
        # candidate pair count = sum over cells of |cell| choose 2
        cent_ids, cent_mat = kmeans_fit(
            df, "vec_id", "embedding", k_cells=k_cells, iters=1
        )
        from dwca_parquet_spark.operators.similarity import _cells_udf, _prepped

        cells = (
            _prepped(df, "vec_id", "embedding")
            .withColumn(
                "cell", _cells_udf(cent_ids, cent_mat, 1)(F.col("svec")).getItem(0)
            )
            .groupBy("cell")
            .count()
            .collect()
        )
        cand = sum(r["count"] * (r["count"] - 1) // 2 for r in cells)
        allp = n * (n - 1) // 2
        # exact path for comparison (block matmul, every pair scored)
        if n <= 20_000:
            t0 = time.time()
            embedding_neardup_pairs(
                df, "vec_id", "embedding", threshold=0.99, bucketed=False
            ).count()
            exact_s = time.time() - t0
            release_caches()
        else:
            exact_s = float("nan")
        print(
            f"{n} | {k_cells} | {cand:,} | {allp:,} | "
            f"{sem_s:.1f} | {exact_s:.1f}  (kept {n_keep})"
        )
        df.unpersist()


def make_zipf_corpus(spark, n_docs: int, vocab: int = 50_000, doc_len: int = 200):
    """English-like synthetic corpus: Zipf-ranked pseudo-words (letter
    strings whose lengths grow with rank — frequent words short, like
    real text), so the BPE word table has realistic size and shape.
    The sf0.1 documents table is unusable here: 31 distinct words."""
    rng = np.random.default_rng(7)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = []
    seen = set()
    while len(words) < vocab:
        ln = 2 + int(rng.gamma(2.0, 2.0))
        w = "".join(rng.choice(letters, size=min(ln, 14)))
        if w not in seen:
            seen.add(w)
            words.append(w)
    ranks = rng.zipf(1.3, size=n_docs * doc_len)
    ranks = ranks[ranks <= vocab] - 1
    per_doc = len(ranks) // n_docs
    docs = [
        (
            i,
            " ".join(words[r] for r in ranks[i * per_doc : (i + 1) * per_doc]),
        )
        for i in range(n_docs)
    ]
    return spark.createDataFrame(docs, "doc_id long, text string")


def bench_bpe(spark, quick: bool):
    print("\n== bpe_fit: driver vs distributed (Zipf synthetic corpus) ==")
    n_docs = 2_000 if quick else 20_000
    docs = make_zipf_corpus(spark, n_docs).repartition(32).persist()
    n_docs = docs.count()
    n_merges = 10 if quick else 30
    from dwca_parquet_spark.operators.bpe import word_counts

    n_words = word_counts(docs, "text").count()
    t0 = time.time()
    m_drv = bpe_fit(docs, "text", n_merges=n_merges)
    drv_s = time.time() - t0
    t0 = time.time()
    m_dst = bpe_fit(docs, "text", n_merges=n_merges, distributed=True)
    dst_s = time.time() - t0
    assert m_drv["merges"] == m_dst["merges"]
    print(
        f"{n_docs} docs, {n_words:,} distinct words, {n_merges} merges: "
        f"driver {drv_s:.1f}s | distributed {dst_s:.1f}s "
        f"({dst_s / n_merges:.2f}s/round) — identical merge lists"
    )

    t0 = time.time()
    total_toks = (
        bpe_encode(docs, "doc_id", "text", m_drv)
        .agg(F.sum("n_bpe_tokens"))
        .first()[0]
    )
    enc_s = time.time() - t0
    print(
        f"bpe_encode: {total_toks:,} subword tokens in {enc_s:.1f}s "
        f"→ {total_toks / enc_s / 1e6:.2f} M tokens/s (32 local cores)"
    )
    docs.unpersist()


def bench_html(spark):
    print("\n== html_extract_text throughput (sf0.1 documents ×100) ==")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .crossJoin(spark.range(100).withColumnRenamed("id", "rep"))
        .select(
            (F.col("doc_id") * 100 + F.col("rep")).alias("doc_id"), "text"
        )
        .repartition(32)  # the 2 MB parquet is one input split
    )  # sf0.1 text is only ~2 MB — replicate to get past job-dispatch floor
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit(
                "<html><head><title>t</title><script>var x=1;</script>"
                "<style>p{}</style></head><body><nav><a href='/'>n</a>"
                "</nav><h1>h</h1><p>"
            ),
            F.col("text"),
            F.lit("</p><!-- c --><footer>f</footer></body></html>"),
        ).alias("html"),
    ).persist()
    in_bytes = wrapped.agg(F.sum(F.octet_length("html"))).first()[0]
    wrapped.count()
    t0 = time.time()
    html_extract_text(wrapped, "doc_id", "html").agg(
        F.sum(F.length("text"))
    ).first()
    dt = time.time() - t0
    print(
        f"{in_bytes / 1e6:.0f} MB in → {dt:.1f}s → "
        f"{in_bytes / 1e6 / dt:.0f} MB/s (32 local cores)"
    )
    wrapped.unpersist()


def main() -> None:
    quick = "--quick" in sys.argv
    spark = get_spark("r5-ops-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    bench_semdedup(spark, quick)
    bench_bpe(spark, quick)
    bench_html(spark)


if __name__ == "__main__":
    main()
