"""embedding_dedup_clusters vs an independent Python union-find over the
same (already oracle-gated, q43) pair set — the clustering step itself is
verified by a second implementation, mirroring the text-side q44 gate."""

from __future__ import annotations

from dwca_parquet_spark.operators.similarity import (
    embedding_dedup_clusters,
    embedding_neardup_pairs,
)
from tests.conftest import SF_T2


def _union_find(nodes, pairs):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min reachable id (matches min-label propagation)
    return {n: find(n) for n in nodes}


def test_embedding_clusters_match_union_find(spark):
    emb = spark.read.parquet(f"{SF_T2}/embeddings.parquet")
    pairs = [
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(
            emb, "vec_id", "embedding", threshold=0.3, bucketed=True
        ).collect()
    ]
    assert pairs, "fixture must produce near-dup pairs at this threshold"
    ids = [r.vec_id for r in emb.select("vec_id").collect()]
    want = _union_find(ids, pairs)
    got = {
        r.vec_id: r.cluster_id
        for r in embedding_dedup_clusters(
            emb, "vec_id", "embedding", threshold=0.3
        ).collect()
    }
    assert got == want
    # singletons keep their own id
    in_pairs = {x for p in pairs for x in p}
    for vid in set(ids) - in_pairs:
        assert got[vid] == vid
