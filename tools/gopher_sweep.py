#!/usr/bin/env python
"""Measured evidence for ops 102-103 (SCALE.md):

1. gopher_quality — scan throughput (input MB/s) on replicated sf0.1
   documents, plus Spark-vs-DuckDB wall on the identical parquet with a
   cross-engine verdict checksum (the operator is zero-shuffle, so the
   100 TB cost model is pure scan).
2. gopher_ngram_stats — Spark vs DuckDB wall at growing synthetic-corpus
   sizes (Zipf words, so n-gram counts are non-degenerate), with the
   (doc,n) row count and an order-free fraction checksum compared
   engine-to-engine.
3. dedup_paragraphs — Spark vs DuckDB wall on a synthetic corpus with
   planted cross-document boilerplate paragraphs; kept/total paragraph
   mass must agree exactly.

Fixtures are generated fresh (never cloned from testdata) and staged as
parquet so both engines read identical bytes.

Run: python tools/gopher_sweep.py [--quick]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.dedup import (
    dedup_paragraphs,
    sql_dedup_paragraphs,
)
from dwca_parquet_spark.operators.text import (
    gopher_ngram_stats,
    gopher_quality,
    sql_gopher_ngram_stats,
    sql_gopher_quality,
)
from dwca_parquet_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
WORDS = None  # lazily built Zipf vocabulary


def zipf_doc(rng, vocab, n_words: int, n_paras: int) -> str:
    words = vocab[rng.zipf(1.7, size=n_words) % len(vocab)]
    per = max(1, n_words // n_paras)
    paras = [
        " ".join(words[i * per : (i + 1) * per])
        for i in range(n_paras)
    ]
    return "\n\n".join(p for p in paras if p)


def make_corpus(path: str, n_docs: int, planted_boiler: int = 5) -> int:
    """Zipf corpus with `planted_boiler` shared boilerplate paragraphs
    stitched into ~40% of docs. Returns total bytes."""
    rng = np.random.default_rng(7)
    vocab = np.array(
        ["w%04d" % i for i in range(30_000)], dtype=object
    )
    boiler = [zipf_doc(rng, vocab, 40, 1) for _ in range(planted_boiler)]
    docs = []
    for i in range(n_docs):
        body = zipf_doc(rng, vocab, int(rng.integers(80, 400)), 5)
        if rng.random() < 0.4:
            b = boiler[int(rng.integers(0, planted_boiler))]
            body = b + "\n\n" + body
        docs.append(body)
    tbl = pa.table(
        {"doc_id": pa.array(range(n_docs), pa.int64()),
         "text": pa.array(docs, pa.string())}
    )
    pq.write_table(tbl, path)
    return sum(len(d) for d in docs)


def duck_for(path: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW docs AS SELECT * FROM read_parquet('{path}')"
    )
    return con


def bench_quality(spark, quick: bool) -> None:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    reps = 20 if quick else 100
    big = (
        docs.withColumn("_r", F.explode(F.sequence(F.lit(1), F.lit(reps))))
        .withColumn("doc_id", F.col("doc_id") * reps + F.col("_r"))
        .drop("_r")
        .repartition(32)
        .persist()
    )
    n = big.count()
    mb = (
        big.select(F.sum(F.length("text")).alias("b")).first()["b"] / 1e6
    )
    t0 = time.time()
    kept = gopher_quality(big, "doc_id", "text").filter("keep").count()
    dt = time.time() - t0
    print(
        f"gopher_quality scan: {n} docs, {mb:.0f} MB -> {dt:.2f} s "
        f"({mb/dt:.0f} MB/s, kept {kept})"
    )
    big.unpersist()

    # engine-vs-engine on identical parquet
    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/corpus.parquet"
        nbytes = make_corpus(path, 5_000 if quick else 50_000)
        sdocs = spark.read.parquet(path)
        t0 = time.time()
        srows = gopher_quality(sdocs, "doc_id", "text").select(
            F.sum(F.col("keep").cast("long")).alias("k"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("n_stop_words")).alias("s"),
        ).first()
        t_s = time.time() - t0
        con = duck_for(path)
        t0 = time.time()
        drow = con.sql(
            "SELECT sum(CAST(keep AS BIGINT)), count(*), "
            "sum(n_stop_words) FROM ("
            + sql_gopher_quality("docs", "doc_id", "text")
            + ")"
        ).fetchone()
        t_d = time.time() - t0
        assert (srows["k"], srows["n"], srows["s"]) == drow, (srows, drow)
        print(
            f"gopher_quality vs DuckDB ({nbytes/1e6:.0f} MB synthetic): "
            f"spark {t_s:.2f} s, duckdb {t_d:.2f} s, checksums equal"
        )


def bench_ngrams(spark, quick: bool) -> None:
    sizes = [5_000] if quick else [10_000, 50_000]
    for n_docs in sizes:
        with tempfile.TemporaryDirectory() as td:
            path = f"{td}/corpus.parquet"
            nbytes = make_corpus(path, n_docs)
            sdocs = spark.read.parquet(path).repartition(32)
            ns = (2, 3, 4, 5, 10)
            t0 = time.time()
            got = gopher_ngram_stats(
                sdocs, "doc_id", "text", ns=ns
            ).select(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.round("top_ngram_char_frac", 9)
                    + F.round("dup_ngram_char_frac", 9)
                ).alias("cs"),
            ).first()
            t_s = time.time() - t0
            con = duck_for(path)
            t0 = time.time()
            want = con.sql(
                "SELECT count(*), sum(round(top_ngram_char_frac, 9) "
                "+ round(dup_ngram_char_frac, 9)) FROM ("
                + sql_gopher_ngram_stats("docs", "doc_id", "text", ns=ns)
                + ")"
            ).fetchone()
            t_d = time.time() - t0
            assert got["n"] == want[0] and abs(got["cs"] - want[1]) < 1e-6
            print(
                f"gopher_ngram_stats n_docs={n_docs} "
                f"({nbytes/1e6:.0f} MB, ns={ns}): spark {t_s:.2f} s, "
                f"duckdb {t_d:.2f} s, {got['n']} (doc,n) rows, "
                "checksums equal"
            )


def bench_paragraphs(spark, quick: bool) -> None:
    sizes = [10_000] if quick else [50_000, 200_000]
    for n_docs in sizes:
        with tempfile.TemporaryDirectory() as td:
            path = f"{td}/corpus.parquet"
            nbytes = make_corpus(path, n_docs)
            sdocs = spark.read.parquet(path).repartition(32)
            t0 = time.time()
            got = dedup_paragraphs(sdocs, "doc_id", "text").select(
                F.sum("n_paras_kept").alias("k"),
                F.sum("n_paras").alias("n"),
                F.sum(F.length("text")).alias("b"),
            ).first()
            t_s = time.time() - t0
            con = duck_for(path)
            t0 = time.time()
            want = con.sql(
                "SELECT sum(n_paras_kept), sum(n_paras), sum(len(text)) "
                "FROM ("
                + sql_dedup_paragraphs("docs", "doc_id", "text")
                + ")"
            ).fetchone()
            t_d = time.time() - t0
            assert (got["k"], got["n"], got["b"]) == want, (got, want)
            print(
                f"dedup_paragraphs n_docs={n_docs} "
                f"({nbytes/1e6:.0f} MB): spark {t_s:.2f} s, "
                f"duckdb {t_d:.2f} s, kept {got['k']}/{got['n']} paras, "
                "checksums equal"
            )


def main() -> None:
    quick = "--quick" in sys.argv
    spark = get_spark("gopher-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    bench_quality(spark, quick)
    bench_ngrams(spark, quick)
    bench_paragraphs(spark, quick)


if __name__ == "__main__":
    main()
