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


def test_block_pairs_autosize_and_blocking_invariance(spark):
    """Round 7: num_blocks=None auto-sizes from the table — one block
    when it fits (the r6 bench showed fixed 8-way fan-out is pure
    replication overhead at small n) — and the pair set is invariant to
    the blocking (every unordered pair lands in exactly one group under
    ANY blocking), so auto ≡ forced-8 ≡ forced-3 row-for-row."""
    import random

    from dwca_parquet_spark.operators.similarity import _block_pairs

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id long, vec array<float>")

    def res(nb):
        return sorted(
            (r.id_a, r.id_b, round(r.cosine, 4))
            for r in _block_pairs(df, "id", "vec", nb, -1.0).collect()
        )

    auto, one, three, eight = res(None), res(1), res(3), res(8)
    assert auto == one == three == eight
    assert len(auto) == 120 * 119 // 2  # threshold -1: every pair scored
