"""Training-shard export sink (sinks/shards.py): reproducibility,
completeness/disjointness, manifest verification, and tamper detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.sinks.shards import (
    verify_shards,
    write_training_shards,
)
from tests.conftest import SF_T2


def test_write_training_shards_roundtrip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    out = tmp_path / "shards"
    manifest = write_training_shards(
        docs, out, "doc_id", "text", n_shards=4, seed="r5"
    ).collect()

    assert [r["shard"] for r in manifest] == [0, 1, 2, 3]
    assert sum(r["n_docs"] for r in manifest) == docs.count()

    data = spark.read.parquet(str(out / "data"))
    # complete and disjoint: every doc appears exactly once
    ids = [r["doc_id"] for r in data.select("doc_id").collect()]
    src = [r["doc_id"] for r in docs.select("doc_id").collect()]
    assert sorted(ids) == sorted(src)
    # shards are balanced-ish (hash sharding)
    n = len(src)
    for r in manifest:
        assert abs(r["n_docs"] - n / 4) < n * 0.15

    # loader-side verification: empty mismatch set
    assert verify_shards(spark, out, "doc_id").count() == 0

    # per-shard files carry the global shuffled order (shuffle_key asc)
    one = (
        data.filter(F.col("shard") == 0)
        .select("shuffle_key")
        .collect()
    )
    keys = [r["shuffle_key"] for r in one]
    assert keys == sorted(keys) and len(keys) > 0


def test_write_training_shards_deterministic(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    m1 = write_training_shards(
        docs, tmp_path / "a", "doc_id", "text", 4, seed="s"
    ).collect()
    m2 = write_training_shards(
        docs.repartition(9), tmp_path / "b", "doc_id", "text", 4, seed="s"
    ).collect()
    assert [tuple(r) for r in m1] == [tuple(r) for r in m2]
    a = spark.read.parquet(str(tmp_path / "a" / "data"))
    b = spark.read.parquet(str(tmp_path / "b" / "data"))
    rows_a = sorted(
        (r["shard"], r["shuffle_key"], r["doc_id"])
        for r in a.select("shard", "shuffle_key", "doc_id").collect()
    )
    rows_b = sorted(
        (r["shard"], r["shuffle_key"], r["doc_id"])
        for r in b.select("shard", "shuffle_key", "doc_id").collect()
    )
    assert rows_a == rows_b
    # different seed -> different assignment
    m3 = write_training_shards(
        docs, tmp_path / "c", "doc_id", "text", 4, seed="other"
    ).collect()
    assert [tuple(r) for r in m3] != [tuple(r) for r in m1]


def test_verify_shards_detects_tampering(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    out = tmp_path / "shards"
    write_training_shards(docs, out, "doc_id", "text", 4, seed="s")
    # drop one row from shard 1 and rewrite its directory
    data = spark.read.parquet(str(out / "data"))
    victim = data.filter(F.col("shard") == 1).limit(1).collect()[0]["doc_id"]
    tampered_rows = data.filter(
        (F.col("shard") == 1) & (F.col("doc_id") != victim)
    ).drop("shard")
    # materialize BEFORE overwriting the directory being read
    frozen = spark.createDataFrame(
        tampered_rows.collect(), tampered_rows.schema
    )
    frozen.write.mode("overwrite").parquet(str(out / "data" / "shard=1"))
    bad = verify_shards(spark, out, "doc_id").collect()
    assert [r["shard"] for r in bad] == [1]
