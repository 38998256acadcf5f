"""Streaming incremental ingestion (SURVEY §2 round-4): the foreachBatch
lift produces exactly the batch pipeline's store — content-new rows only
— and replaying the same source is a no-op (idempotency on restart)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwca_parquet_spark.functions import hashing as H
from dwca_parquet_spark.streaming.ingest import stream_ingest_dedup
from tests.conftest import SF_T2


def test_stream_ingest_dedups_and_is_idempotent(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet").select(
        "doc_id", "text"
    )
    seed = docs.filter(F.col("doc_id") % 3 == 0)
    incoming = docs.filter(F.col("doc_id") % 3 != 0)
    # the stream also re-sends a third of the seed docs under new ids
    resent = seed.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "text"
    )

    store = str(tmp_path / "store")
    seed.write.option("compression", "zstd").parquet(store)

    src = str(tmp_path / "src")
    incoming.unionByName(resent).coalesce(2).write.parquet(src)

    q = stream_ingest_dedup(
        spark.readStream.schema(docs.schema).format("parquet").load(src),
        store,
        "doc_id",
        "text",
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    final = spark.read.parquet(store)
    # every content-distinct doc present exactly once per content
    def hashes(df):
        return (
            df.select(H.poly_hash(H.normalize_text(F.col("text"))).alias("h"))
            .groupBy("h")
            .count()
        )

    want_hashes = {
        r["h"] for r in hashes(docs).select("h").distinct().collect()
    }
    got = {r["h"]: r["count"] for r in hashes(final).collect()}
    assert set(got) == want_hashes
    # nothing re-sent survived twice UNLESS the source corpus itself
    # carries that content twice (planted exact dups stay as-is: within
    # one batch both copies arrive together → one survives; across
    # batches the second drops — either way ≤ the source multiplicity)
    src_mult = {r["h"]: r["count"] for r in hashes(docs).collect()}
    assert all(got[h] <= src_mult[h] for h in got)
    assert not any(r["doc_id"] >= 5_000_000 for r in final.collect())

    # replay: a fresh stream over the SAME source (new checkpoint, as
    # after a checkpoint loss — the worst case) appends NOTHING
    n_before = final.count()
    q2 = stream_ingest_dedup(
        spark.readStream.schema(docs.schema).format("parquet").load(src),
        store,
        "doc_id",
        "text",
        checkpoint=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(180)
    assert spark.read.parquet(store).count() == n_before


def test_stream_paragraph_dedup_and_replay(spark, tmp_path):
    """Streaming paragraph dedup: the doc store carries each distinct
    paragraph once (first arrival wins), and a full replay over the same
    source — fresh checkpoint, the post-checkpoint-loss worst case —
    changes neither store."""
    from dwca_parquet_spark.operators.dedup import paragraph_state
    from dwca_parquet_spark.streaming.ingest import (
        stream_ingest_paragraph_dedup,
    )

    rows = [
        (1, "boiler\n\nalpha"),
        (2, "boiler\n\nbeta\n\nboiler"),   # cross-doc + within-doc dup
        (3, "alpha"),                       # fully duplicated -> dropped
        (4, "gamma\n\ndelta"),
    ]
    seed = [(100, "seeded\n\ngamma")]       # 'gamma' already in history

    schema = "doc_id long, text string"
    doc_store = str(tmp_path / "docs")
    state_store = str(tmp_path / "state")
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).coalesce(2).write.parquet(src)
    paragraph_state(
        spark.createDataFrame(seed, schema), "doc_id", "text"
    ).write.parquet(state_store)

    def run(ckpt):
        q = stream_ingest_paragraph_dedup(
            spark.readStream.schema(
                spark.createDataFrame(rows, schema).schema
            ).format("parquet").load(src),
            doc_store, state_store, "doc_id", "text",
            checkpoint=str(tmp_path / ckpt),
        )
        q.awaitTermination(180)

    run("ckpt1")
    got = {r["doc_id"]: r["text"] for r in
           spark.read.parquet(doc_store).collect()}
    # every surviving paragraph appears exactly once corpus-wide
    all_paras = [p for t in got.values() for p in t.split("\n\n")]
    assert sorted(all_paras) == sorted(set(all_paras))
    assert "gamma" not in all_paras  # seeded history suppressed it
    assert 3 not in got              # fully-duplicated doc dropped
    assert got[1] == "boiler\n\nalpha"
    n_docs = spark.read.parquet(doc_store).count()
    n_state = spark.read.parquet(state_store).count()

    run("ckpt2")  # full replay, fresh checkpoint
    assert spark.read.parquet(doc_store).count() == n_docs
    assert spark.read.parquet(state_store).count() == n_state


def test_stream_semantic_dedup_and_replay(spark, tmp_path):
    """Streaming semantic dedup (op 118's streaming leg): a batch vector
    near a SEEDED history vector is dropped, mutual batch near-dups keep
    their minimum id, novel vectors land in the store and extend the
    state, and a full replay over the same source — fresh checkpoint,
    the post-checkpoint-loss worst case — changes neither store."""
    import random

    from dwca_parquet_spark.operators.semdedup import semdedup_state
    from dwca_parquet_spark.streaming.ingest import (
        stream_ingest_semantic_dedup,
    )

    rng = random.Random(20260815)
    dim = 16

    def vec():
        return [rng.uniform(-1, 1) for _ in range(dim)]

    seed_rows = [(int(i), vec()) for i in range(30)]
    schema = "vid long, v array<float>"
    seed = spark.createDataFrame(seed_rows, schema)
    cents_path = str(tmp_path / "cents")
    assigned_path = str(tmp_path / "assigned")
    cents, assigned = semdedup_state(seed, "vid", "v", k_cells=8)
    cents.write.parquet(cents_path)
    assigned.write.partitionBy("cell").parquet(assigned_path)

    novel = [(100 + i, vec()) for i in range(6)]
    batch_rows = (
        novel
        + [(200, [0.999 * x for x in seed_rows[5][1]])]   # ~history 5 → drop
        + [(201, [1.001 * x for x in novel[2][1]])]       # ~batch 102 → drop
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(batch_rows, schema).coalesce(1).write.parquet(src)
    vec_store = str(tmp_path / "vecs")

    def run(ckpt):
        q = stream_ingest_semantic_dedup(
            spark.readStream.schema(
                spark.createDataFrame(batch_rows, schema).schema
            ).format("parquet").load(src),
            vec_store, cents_path, assigned_path, "vid", "v",
            checkpoint=str(tmp_path / ckpt), threshold=0.95,
        )
        q.awaitTermination(180)

    run("ckpt1")
    kept = sorted(
        r["vid"] for r in spark.read.parquet(vec_store).collect()
    )
    assert kept == sorted(v[0] for v in novel)  # 200 and 201 dropped
    n_state = spark.read.parquet(assigned_path).count()
    assert n_state == 30 + len(novel)  # state extended by kept only

    run("ckpt2")  # full replay, fresh checkpoint
    assert sorted(
        r["vid"] for r in spark.read.parquet(vec_store).collect()
    ) == kept
    assert spark.read.parquet(assigned_path).count() == n_state
