"""Differential tests for SemDeDup (operators/semdedup.py) against an
INDEPENDENT driver-side reference: same integer-scaling protocol, its own
k-means / pair scoring / union-find / keep rule — no Spark code shared
beyond the documented determinism contract. Exact equality on every output
column (the operator family's strongest gate, like embedding_dedup_clusters'
independent union-find test)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.cache import release_caches
from dwca_parquet_spark.operators.semdedup import kmeans_fit, semantic_dedup
from tests.conftest import SF_T2

VS = 1_000_000


def _half_up(x: np.ndarray) -> np.ndarray:
    """Spark F.round semantics: half away from zero (numpy rounds half to
    even, so np.round would diverge on exact .5 boundaries)."""
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def _scale(vecs: np.ndarray) -> np.ndarray:
    return _half_up(vecs.astype(np.float64) * VS).astype(np.int64)


def _assign(m: np.ndarray, cent_ids: np.ndarray, cent_mat: np.ndarray):
    c2 = np.einsum("ij,ij->i", cent_mat, cent_mat)
    v2 = np.einsum("ij,ij->i", m, m)
    d2 = v2[:, None] + c2[None, :] - 2 * (m @ cent_mat.T)
    return cent_ids[np.argsort(d2, axis=1, kind="stable")[:, 0]]


def _ref_semantic_dedup(
    ids: np.ndarray,
    vecs: np.ndarray,
    k_cells: int,
    iters: int,
    threshold: float,
    keep: str,
):
    """The whole pipeline, reimplemented flat: returns
    {id: (cell, cluster_id, cos_centroid, keep)}."""
    order = np.argsort(ids, kind="stable")
    ids, m = ids[order], _scale(vecs[order])
    cent_ids = ids[:k_cells].copy()
    cent_mat = m[:k_cells].copy()
    for _ in range(iters):
        cells = _assign(m, cent_ids, cent_mat)
        new_mat = cent_mat.copy()
        for i, c in enumerate(cent_ids):
            members = m[cells == c]
            if len(members):
                # mirrors the operator: python round() on the s/n quotient
                new_mat[i] = np.array(
                    [
                        int(round(int(s) / len(members)))
                        for s in members.sum(axis=0)
                    ],
                    dtype=np.int64,
                )
        cent_mat = new_mat
    cells = _assign(m, cent_ids, cent_mat)

    # centroid cosine, rounded half-up to 4 dp like F.round
    ci = {int(c): i for i, c in enumerate(cent_ids)}
    sd = np.einsum("ij,ij->i", m, m)
    cos_cent = {}
    for r, vid in enumerate(ids):
        c = cent_mat[ci[int(cells[r])]]
        denom = np.sqrt(np.float64(sd[r])) * np.sqrt(np.float64(c @ c))
        cos_cent[int(vid)] = float(_half_up(np.float64((m[r] @ c)) / denom * 1e4) / 1e4)

    # within-cell pairs >= threshold on the 4-dp rounded cosine
    parent = {int(v): int(v) for v in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for c in np.unique(cells):
        sel = cells == c
        sub_ids, sub = ids[sel], m[sel]
        ssd = np.einsum("ij,ij->i", sub, sub)
        dots = sub @ sub.T
        denom = np.sqrt(ssd.astype(np.float64))
        cos = dots.astype(np.float64) / (denom[:, None] * denom[None, :])
        cos = _half_up(cos * 1e4) / 1e4
        ia, ib = np.nonzero(sub_ids[:, None] < sub_ids[None, :])
        for x, y in zip(ia, ib):
            if cos[x, y] >= threshold:
                union(int(sub_ids[x]), int(sub_ids[y]))

    cluster = {int(v): find(int(v)) for v in ids}
    groups: dict[int, list[int]] = {}
    for v in ids:
        groups.setdefault(cluster[int(v)], []).append(int(v))
    kept = {}
    for members in groups.values():
        if keep == "centroid_far":
            best = min(members, key=lambda v: (cos_cent[v], v))
        else:
            best = min(members)
        for v in members:
            kept[v] = v == best
    return {
        int(v): (
            int(cells[r]),
            cluster[int(v)],
            cos_cent[int(v)],
            kept[int(v)],
        )
        for r, v in enumerate(ids)
    }


@pytest.mark.parametrize("keep", ["centroid_far", "min_id"])
def test_semantic_dedup_embeddings_parity(spark, keep):
    df = spark.read.parquet(f"{SF_T2}/embeddings.parquet")
    got = {
        r["vec_id"]: (r["cell"], r["cluster_id"], r["cos_centroid"], r["keep"])
        for r in semantic_dedup(
            df, "vec_id", "embedding", k_cells=8, iters=2, threshold=0.9,
            keep=keep,
        ).collect()
    }
    release_caches()
    rows = df.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float32)
    want = _ref_semantic_dedup(ids, vecs, 8, 2, 0.9, keep)
    assert got == want
    assert len(got) == len(rows)  # exactly one row per input vector


def test_semantic_dedup_planted_groups(spark):
    """Planted near-identical groups are pruned to one keeper each; the
    spread-out singletons all keep."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(40)]
    # groups 100-102/200-203: tiny perturbations of one vector each
    g1 = base[3] * 1.0
    g2 = base[7] * 1.0
    nid = 100
    for j in range(3):
        rows.append((nid + j, (g1 * (1 + 1e-4 * j)).tolist()))
    for j in range(4):
        rows.append((200 + j, (g2 * (1 + 1e-4 * j)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(
        df, "vec_id", "embedding", k_cells=4, iters=1, threshold=0.999
    ).collect()
    release_caches()
    by_id = {r["vec_id"]: r for r in out}
    # scaling a vector keeps cosine 1.0 → each planted group + its base
    # collapses to one cluster with exactly one keeper
    grp1 = [3, 100, 101, 102]
    grp2 = [7, 200, 201, 202, 203]
    for grp in (grp1, grp2):
        labels = {by_id[v]["cluster_id"] for v in grp}
        assert len(labels) == 1
        assert sum(by_id[v]["keep"] for v in grp) == 1
    # everything else is a singleton that keeps itself
    others = [r for r in out if r["vec_id"] not in grp1 + grp2]
    assert all(r["keep"] for r in others)
    assert all(r["cluster_id"] == r["vec_id"] for r in others)


def test_kmeans_fit_partition_invariant(spark):
    """The fitted centroids are identical under repartitioning (the
    pq_fit determinism discipline: integer sums, bounded collects)."""
    df = spark.read.parquet(f"{SF_T2}/embeddings.parquet")
    ids1, mat1 = kmeans_fit(df, "vec_id", "embedding", k_cells=8, iters=2)
    ids2, mat2 = kmeans_fit(
        df.repartition(17), "vec_id", "embedding", k_cells=8, iters=2
    )
    assert (ids1 == ids2).all()
    assert (mat1 == mat2).all()


# ---------------------------------------------------------------------------
# Incremental semantic dedup (op 118, round 7)
# ---------------------------------------------------------------------------


def _mk_vecs(rng, n, dim=16):
    return np.array(
        [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n)]
    )


def _ref_incremental_pairs(
    hist_ids, hist_vecs, batch_ids, batch_vecs, cent_ids, cent_mat, threshold
):
    """Independent reference: assign history ∪ batch to the FROZEN
    centroids, score every within-cell pair, keep pairs touching the
    batch; cross pairs oriented (hist, batch), batch pairs (min, max)."""
    mh, mb = _scale(hist_vecs), _scale(batch_vecs)
    ch = _assign(mh, cent_ids, cent_mat)
    cb = _assign(mb, cent_ids, cent_mat)
    out = {}
    for c in np.unique(np.concatenate([ch, cb])):
        hsel, bsel = ch == c, cb == c
        ids = np.concatenate([hist_ids[hsel], batch_ids[bsel]])
        m = np.concatenate([mh[hsel], mb[bsel]])
        is_b = np.concatenate(
            [np.zeros(hsel.sum(), bool), np.ones(bsel.sum(), bool)]
        )
        sd = np.sqrt(np.einsum("ij,ij->i", m, m).astype(np.float64))
        cos = (m @ m.T).astype(np.float64) / (sd[:, None] * sd[None, :])
        cos = _half_up(cos * 1e4) / 1e4
        n = len(ids)
        for x in range(n):
            for y in range(x + 1, n):
                if not (is_b[x] or is_b[y]):
                    continue  # history×history: not this operator's job
                if cos[x, y] < threshold:
                    continue
                if is_b[x] != is_b[y]:  # cross: (hist, batch)
                    a, b = (ids[y], ids[x]) if is_b[x] else (ids[x], ids[y])
                else:  # batch-internal: (min, max)
                    a, b = min(ids[x], ids[y]), max(ids[x], ids[y])
                out[(int(a), int(b))] = float(cos[x, y])
    return out


def test_semdedup_incremental_equals_frozen_reference(spark):
    import random

    from dwca_parquet_spark.operators.semdedup import (
        semantic_dedup_incremental,
        semdedup_state,
    )

    rng = random.Random(20260815)
    hv = _mk_vecs(rng, 80)
    # batch: fresh vectors + planted near-dups of history AND of each other
    bv = _mk_vecs(rng, 20)
    bv = np.concatenate(
        [
            bv,
            hv[[3]] * 1.0005 + 0.0004,   # near-dup of hist 3
            hv[[17]] * 0.9995,           # near-dup of hist 17
            bv[[5]] * 1.0003 + 0.0002,   # near-dup of batch 105
        ]
    )
    hist_ids = np.arange(0, 80, dtype=np.int64)
    batch_ids = np.arange(100, 100 + len(bv), dtype=np.int64)
    hist = spark.createDataFrame(
        [(int(i), [float(x) for x in hv[r]]) for r, i in enumerate(hist_ids)],
        "id long, vec array<float>",
    )
    batch = spark.createDataFrame(
        [(int(i), [float(x) for x in bv[r]]) for r, i in enumerate(batch_ids)],
        "id long, vec array<float>",
    )
    t = 0.95
    cents, assigned = semdedup_state(hist, "id", "vec", k_cells=8, iters=2)
    pairs, batch_assigned = semantic_dedup_incremental(
        batch, cents, assigned, "id", "vec", threshold=t
    )
    got = {
        (r.id_a, r.id_b): r.cosine for r in pairs.collect()
    }
    crows = sorted(cents.collect(), key=lambda r: r["cell"])
    cent_ids = np.array([r["cell"] for r in crows], dtype=np.int64)
    cent_mat = np.stack(
        [np.asarray(r["csvec"], dtype=np.int64) for r in crows]
    )
    want = _ref_incremental_pairs(
        hist_ids, hv, batch_ids, bv, cent_ids, cent_mat, t
    )
    assert got == want
    assert len(got) >= 3  # every planted near-dup found
    # no history×history pair ever emitted
    assert all(b >= 100 for _, b in got)
    # batch_assigned is the state-advancement payload: one row per batch
    # vector, same schema as the stored assigned table
    assert batch_assigned.count() == len(batch_ids)
    assert batch_assigned.columns == assigned.columns
    release_caches()


def test_semdedup_incremental_state_advance_and_plan_pin(spark, tmp_path):
    import random

    from dwca_parquet_spark.operators.semdedup import (
        semantic_dedup_incremental,
        semdedup_state,
    )

    rng = random.Random(7)
    hv = _mk_vecs(rng, 60)
    b1 = _mk_vecs(rng, 15)
    b2 = np.concatenate([_mk_vecs(rng, 10), b1[[2]] * 1.0004])  # dup of b1#2
    hist_ids = np.arange(0, 60, dtype=np.int64)
    b1_ids = np.arange(100, 115, dtype=np.int64)
    b2_ids = np.arange(200, 211, dtype=np.int64)

    def to_df(ids, vecs):
        return spark.createDataFrame(
            [(int(i), [float(x) for x in vecs[r]]) for r, i in enumerate(ids)],
            "id long, vec array<float>",
        )

    t = 0.95
    cents, assigned = semdedup_state(to_df(hist_ids, hv), "id", "vec", 8, 2)
    # the documented contract: the state LIVES as parquet partitioned on
    # cell — write it out, probe against the read-back (this is also what
    # makes the plan pin honest: a stored state has no UDF lineage)
    spath = str(tmp_path / "assigned")
    assigned.write.partitionBy("cell").parquet(spath)
    stored = spark.read.parquet(spath)
    p1, adv1 = semantic_dedup_incremental(
        to_df(b1_ids, b1), cents, stored, "id", "vec", t
    )
    # ADVANCE: append batch1's assigned rows (the op-78 contract)
    adv1.write.partitionBy("cell").mode("append").parquet(spath)
    state2 = spark.read.parquet(spath)
    p2, _ = semantic_dedup_incremental(
        to_df(b2_ids, b2), cents, state2, "id", "vec", t
    )
    got2 = {(r.id_a, r.id_b): r.cosine for r in p2.collect()}
    crows = sorted(cents.collect(), key=lambda r: r["cell"])
    cent_ids = np.array([r["cell"] for r in crows], dtype=np.int64)
    cent_mat = np.stack(
        [np.asarray(r["csvec"], dtype=np.int64) for r in crows]
    )
    want2 = _ref_incremental_pairs(
        np.concatenate([hist_ids, b1_ids]),
        np.concatenate([hv, b1]),
        b2_ids, b2, cent_ids, cent_mat, t,
    )
    assert got2 == want2
    assert (200, 210) not in got2  # orientation sanity
    assert any(a == 102 and b == 210 for a, b in got2)  # cross-state dup found

    # PLAN PIN: history vectors are never re-clustered — the executed
    # plan contains exactly ONE DISTINCT assignment expression (the
    # batch's svec; the printed tree repeats that node wherever the
    # persisted batch feeds, so count distinct column ids, not lines);
    # the state side reaches the pair stage through a join, untouched.
    import re as _re

    plan = p2._jdf.queryExecution().executedPlan().toString()
    assigned_cols = set(_re.findall(r"cells_of\(svec#(\d+)", plan))
    assert len(assigned_cols) == 1, plan
    release_caches()
