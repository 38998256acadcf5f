"""Incremental dedup clusters (SURVEY §2 op 136): fold a batch into a
stored clustering without re-clustering history — row-identical to
from-scratch dedup_clusters over history ∪ batch, including the
transitive chain where cross pairs and batch-internal pairs land in
ONE component (forest ∪ cross ∪ internal composition); untouched
components pass through unchanged; two-batch sequences compose.

Why no two-history-cluster merge is planted: Jaccard is a metric, so a
batch doc at distance ≤ d from members of BOTH clusters forces the
clusters within 2d of each other — reliably-bridgeable clusters would
reliably have been one cluster already. (In production such merges
still happen at banding-luck similarity levels, and the CC composition
tested here handles them identically — the forest carries both
clusters' edges whenever cross pairs touch both.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.dedup import (
    dedup_clusters,
    dedup_clusters_incremental,
    lsh_state,
)

K, THR = 3, 0.5

A = "the quick brown fox jumps over the lazy dog near the river bank today"
B = "completely different content about distributed query engines and shuffles"


def _doc(i: int, body: str):
    return (i, body)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _hist_rows():
    """History: two near-dup clusters, plus genuinely-unique singletons
    (every token i-specific, so their pairwise Jaccard is 0)."""
    rows = [
        _doc(1, A),
        _doc(2, A + " extra"),
        _doc(3, A + " trailing words here"),
        _doc(10, B),
        _doc(11, B + " appended"),
    ]
    rows += [
        _doc(100 + i, " ".join(f"w{i}x{j}" for j in range(12)))
        for i in range(8)
    ]
    return rows


def _assign(df):
    return sorted((r["doc_id"], r["cluster_id"]) for r in df.collect())


def _state(spark, hist):
    clusters = dedup_clusters(hist, "doc_id", "text", K, THR)
    buckets, shingles = lsh_state(hist, "doc_id", "text", K)
    return clusters, buckets, shingles


def test_incremental_equals_from_scratch_incl_transitive_chain(spark):
    hist = _mk(spark, _hist_rows())
    batch = _mk(
        spark,
        [
            # chain into history cluster A through BOTH pair sources:
            # 1000 crosses to A; 1003/1004 are near-dups of 1000
            # (internal edges) — one component with the forest of A
            _doc(1000, A + " new copy"),
            _doc(1003, A + " new copy current"),
            _doc(1004, A + " new copy current version"),
            # batch-internal cluster with no history contact
            _doc(1010, "brand new batch content repeated phrase alpha beta"),
            _doc(1011, "brand new batch content repeated phrase alpha beta!"),
            # batch singleton
            _doc(1020, "entirely unrelated lone batch document xyz"),
        ],
    )
    clusters, buckets, shingles = _state(spark, hist)
    got = _assign(
        dedup_clusters_incremental(
            batch, clusters, buckets, shingles, "doc_id", "text", K, THR
        )
    )
    want = _assign(
        dedup_clusters(hist.unionByName(batch), "doc_id", "text", K, THR)
    )
    assert got == want
    # construction gates on the from-scratch truth — the scenario really
    # exercises cross+internal chaining into a touched forest:
    w = dict(want)
    assert w[1000] == w[1] == w[1003] == w[1004]  # chained into A
    assert w[1010] == w[1011] and w[1010] != w[1]  # internal-only cluster
    assert w[1020] == 1020 and w[10] == w[11] == 10  # B untouched
    assert len(got) == hist.count() + batch.count()


def test_untouched_components_pass_through_and_two_batches_compose(spark):
    hist = _mk(spark, _hist_rows())
    clusters, buckets, shingles = _state(spark, hist)
    b1 = _mk(
        spark,
        [_doc(2000, "fresh content batch one with its own words entirely")],
    )
    out1 = dedup_clusters_incremental(
        b1, clusters, buckets, shingles, "doc_id", "text", K, THR
    )
    # b1 touches nothing: every history row identical, batch doc singleton
    got1 = dict(_assign(out1))
    want0 = dict(_assign(clusters))
    for i, lab in want0.items():
        assert got1[i] == lab
    assert got1[2000] == 2000
    # advance state (the op-78 contract) and fold a second batch that
    # DOES touch both history and b1's doc
    hb1 = hist.unionByName(b1)
    clusters1 = out1
    buckets1, shingles1 = lsh_state(hb1, "doc_id", "text", K)
    b2 = _mk(
        spark,
        [
            _doc(
                3000,
                "fresh content batch one with its own words entirely plus",
            ),
            _doc(3001, A + " again"),
        ],
    )
    got2 = _assign(
        dedup_clusters_incremental(
            b2, clusters1, buckets1, shingles1, "doc_id", "text", K, THR
        )
    )
    want2 = _assign(
        dedup_clusters(hb1.unionByName(b2), "doc_id", "text", K, THR)
    )
    assert got2 == want2
    w2 = dict(got2)
    assert w2[3000] == 2000 and w2[3001] == 1  # both batches connected