"""Persistent inverted index + indexed BM25 probe (SURVEY §2 op 127).

op 123 (``bm25_topk``) is the bounded-query ranked-search operator: two
jobs over the corpus per query. Fine for one-off inspection; wrong for
the repeated-probe workflow ("show me docs about X" twenty times a day
over the same frozen corpus) — at 100 TB every probe re-tokenizes
every document. The classic fix is materializing the inverted index
once and making each probe touch only the queried terms' postings.
Public semantics throughout (the textbook postings/BM25 design every
search engine uses; Robertson & Zaragoza 2009 for the scoring).

Layout (all plain parquet under ``path`` — no catalog dependency):

* ``postings/``  (term, doc_id, tf, dl) — ONE row per (document, term),
  dl DENORMALIZED onto every posting so the probe never joins a
  corpus-sized docstats table (8 bytes/posting buys a join-free probe).
  Repartitioned BY TERM and sorted (term, doc_id) within partitions, so
  every parquet row group covers a narrow term range: a probe's
  ``term IN (...)`` filter reaches the scan (plan-pinned) and row-group
  min/max statistics skip everything else. At cluster scale the same
  layout bounds a probe to the handful of row groups containing the
  queried terms, independent of corpus size.
* ``termstats/`` (term, df) — per-term document frequency, so idf needs
  no corpus pass at probe time. Filtered to the query terms before the
  bounded (≤ |query| rows) collect.
* ``meta/`` one row (n_docs, total_dl) — the corpus constants avgdl/idf
  need. n_docs counts EVERY document (op 123 counts NULL-text and
  empty-text docs in N and avgdl's denominator; the index must agree
  or idf drifts).

Build cost: one tokenize pass + one (doc, term) aggregation shuffle —
the explicit one-time price the probes amortize. Skew note: posting
lists are Zipfian (stopword terms are huge), so the term-hash
repartition can produce hot partitions at build time — AQE's skew
handling splits those during the shuffle, and because the layout
contract is only "row groups cover narrow term ranges", a hot term
spanning several files costs probes nothing beyond reading that term's
own postings. Sub-splitting hot terms by doc-id range inside the
partitioning key would tighten build parallelism further without
changing the probe contract; not needed at tested scales.

EXACT parity law (pinned in test_invindex.py): for any query,
``bm25_topk_indexed`` returns byte-identical rows to op 123's
``bm25_topk`` on the source table — same tokenization (shared
``tokens``), same stats (df/N/avgdl identical by construction), same
idf literals, the score terms summed in the same query-term order with
the same float operations, same rounding, same tie-break. A document
matching no query term has no postings row and is absent, exactly as
the score>0 filter excludes it in op 123; a matched-term tf is never 0
by construction, and unmatched terms coalesce to the same literal 0.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwca_parquet_spark.functions import hashing as H
from dwca_parquet_spark.operators.text import BM25_B, BM25_K1, tokens

__all__ = ["bm25_index_build", "bm25_topk_indexed", "query_terms"]


def query_terms(query: str) -> list[str]:
    """Deduped, order-preserving normalized query terms — the exact
    protocol op 123 applies to its query string."""
    terms: list[str] = []
    for t in H.normalize_text_py(query).split():
        if t and t not in terms:
            terms.append(t)
    if not terms:
        raise ValueError("query normalizes to no terms")
    return terms


def bm25_index_build(
    df: DataFrame, id_col: str, text_col: str, path: str
) -> dict:
    """Materialize the inverted index for (id, text) under ``path``.
    Returns {"n_docs", "total_dl", "n_terms"} (also persisted in the
    index). Overwrites any previous index at the path (a frozen-corpus
    index is rebuilt, never patched — the op-100 shard discipline)."""
    path = str(path).rstrip("/")
    staged = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_tk")
    ).select("doc_id", F.size("_tk").alias("dl"), F.col("_tk"))
    postings = (
        staged.select("doc_id", "dl", F.explode("_tk").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("term", "doc_id", "tf", "dl")
    )
    (
        postings.repartition(F.col("term"))
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .parquet(f"{path}/postings")
    )
    spark = df.sparkSession
    written = spark.read.parquet(f"{path}/postings")
    termstats = written.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    termstats.write.mode("overwrite").parquet(f"{path}/termstats")
    meta_row = staged.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    meta_row.write.mode("overwrite").parquet(f"{path}/meta")
    meta = meta_row.collect()[0]
    n_terms = spark.read.parquet(f"{path}/termstats").count()
    return {
        "n_docs": int(meta["n_docs"]),
        "total_dl": int(meta["total_dl"]) if meta["total_dl"] is not None else None,
        "n_terms": int(n_terms),
    }


def bm25_topk_indexed(
    spark: SparkSession,
    path: str,
    query: str,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(doc_id, n_tokens, score): top-k by BM25 against a materialized
    index — touches ONLY the queried terms' postings (pushed IN filter
    + term-sorted row groups), two bounded collects (meta, per-term
    df), one small shuffle on the matched doc ids, and the same
    TakeOrderedAndProject head as op 123. EXACTLY ≡ ``bm25_topk`` on
    the indexed table (module docstring; pinned)."""
    path = str(path).rstrip("/")
    terms = query_terms(query)
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    n_docs = int(meta["n_docs"])
    if n_docs == 0:
        raise ValueError("empty corpus")
    if meta["total_dl"] is None:
        raise ValueError("corpus has no tokenizable text")
    avgdl = int(meta["total_dl"]) / n_docs
    df_rows = (
        spark.read.parquet(f"{path}/termstats")
        .filter(F.col("term").isin(terms))
        .collect()  # bounded: ≤ |query| rows
    )
    dfs = {r["term"]: int(r["df"]) for r in df_rows}
    matched = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("term").isin(terms))  # pushed to the scan (pinned)
        .groupBy("doc_id", "dl")
        .agg(
            *[
                F.coalesce(
                    F.max(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)
                ).alias(f"_tf{i}")
                for i, t in enumerate(terms)
            ]
        )
    )
    score = F.lit(0.0)
    dl_d = F.col("dl").cast("double")
    for i, t in enumerate(terms):
        dfi = dfs.get(t, 0)
        idf = math.log((n_docs - dfi + 0.5) / (dfi + 0.5) + 1.0)
        tf_d = F.col(f"_tf{i}").cast("double")
        score = score + F.lit(idf) * (tf_d * (k1 + 1.0)) / (
            tf_d + k1 * (1.0 - b + b * dl_d / F.lit(avgdl))
        )
    return (
        matched.select(
            F.col("doc_id"),
            F.col("dl").cast("long").alias("n_tokens"),
            F.round(score, 6).alias("score"),
        )
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
