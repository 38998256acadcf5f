"""Gate for leakage_safe_split (SURVEY §2 op 113) — the dedup-aware
train/val/test fence.

The eval-leakage failure mode this operator exists to prevent: two
NEAR-DUPLICATE documents land on opposite sides of the train/test fence
under plain per-id hash_split, silently inflating eval scores. The gate
plants near-dup groups whose member ids *provably straddle splits under
plain hash_split* (the fixture search asserts this, so the test has
teeth), then proves:

1. zero clusters straddle splits (the headline property),
2. every planted near-dup group shares one split,
3. singleton documents get EXACTLY the plain hash_split(id) label
   (the operator is a conservative refinement, not a different split),
4. one output row per input id (no loss, no duplication).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.sampling import (
    hash_split,
    leakage_safe_split,
    split_label,
)


def _word(i: int) -> str:
    # deterministic pseudo-word: base-26 digits of a mixed integer
    x = (i * 2654435761 + 97) % (1 << 31)
    s = []
    for _ in range(7):
        s.append(chr(ord("a") + x % 26))
        x //= 26
    return "".join(s)


def _doc_text(seed: int, n_words: int = 40) -> str:
    return " ".join(_word(seed * 1000 + j) for j in range(n_words))


@pytest.fixture(scope="module")
def planted(spark):
    """120 singleton docs + 12 planted near-dup groups of 3 whose member
    ids are searched so that plain hash_split puts them in ≥2 distinct
    splits — i.e. every planted group is a leak under naive splitting."""
    rows = []
    for i in range(120):
        rows.append((f"solo-{i:04d}", _doc_text(i)))

    groups = []
    next_id = 0
    made = 0
    while made < 12:
        base = _doc_text(10_000 + made)
        words = base.split()
        # three variants differing by one word each — Jaccard >> 0.5
        texts = [
            base,
            " ".join(words[:-1] + ["variantx"]),
            " ".join(["varianty"] + words[1:]),
        ]
        # search ids until the trio straddles ≥2 splits under hash_split
        while True:
            ids = [f"grp-{made:02d}-{next_id + j:05d}" for j in range(3)]
            next_id += 3
            labels = {_py_split_label(i) for i in ids}
            if len(labels) >= 2:
                break
        groups.append((ids, set(ids)))
        rows.extend(zip(ids, texts))
        made += 1
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return df, groups


def _py_split_label(key: str) -> str:
    """Driver-side mirror of split_label for the fixture search."""
    h = 0
    for ch in key:
        h = (h * 31 + ord(ch)) % 1_000_000_007
    b = h % 100
    if b < 80:
        return "train"
    if b < 90:
        return "val"
    return "test"


def test_py_mirror_matches_spark(spark):
    ids = [f"grp-{i:02d}-{j:05d}" for i in range(3) for j in range(9)] + [
        f"solo-{i:04d}" for i in range(20)
    ]
    df = spark.createDataFrame([(i,) for i in ids], ["k"]).select(
        "k", split_label(F.col("k")).alias("s")
    )
    for r in df.collect():
        assert r["s"] == _py_split_label(r["k"])


def test_no_cluster_straddles_splits(spark, planted):
    df, _ = planted
    out = leakage_safe_split(df, "doc_id", "text").persist()
    straddle = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert straddle == 0
    out.unpersist()


def test_planted_groups_share_split_and_naive_split_leaks(spark, planted):
    df, groups = planted
    out = leakage_safe_split(df, "doc_id", "text")
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    naive = {
        r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()
    }
    leaked_naive = 0
    for ids, idset in groups:
        assert {got[i] for i in ids} and len({got[i] for i in ids}) == 1, (
            f"planted group {ids} straddles: {[got[i] for i in ids]}"
        )
        if len({naive[i] for i in ids}) > 1:
            leaked_naive += 1
    # the fixture search GUARANTEES every group leaks under naive split —
    # this is what makes the straddle assertions non-vacuous
    assert leaked_naive == len(groups) == 12


def test_singletons_match_plain_hash_split(spark, planted):
    df, groups = planted
    grouped_ids = set().union(*(s for _, s in groups))
    out = leakage_safe_split(df, "doc_id", "text")
    naive = {
        r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()
    }
    rows = out.collect()
    # singleton = its own cluster (cluster_id == id)
    singles = [r for r in rows if r["cluster_id"] == r["doc_id"]]
    solo_seen = 0
    for r in singles:
        if r["doc_id"] not in grouped_ids:
            assert r["split"] == naive[r["doc_id"]]
            solo_seen += 1
    assert solo_seen == 120  # every solo doc really was a singleton cluster


def test_one_row_per_input_id(spark, planted):
    df, _ = planted
    out = leakage_safe_split(df, "doc_id", "text")
    assert out.count() == df.count()
    assert out.select("doc_id").distinct().count() == df.count()
    assert set(out.columns) == {"doc_id", "cluster_id", "split"}
