"""Differential + property tests for the training-shard packing, source
mixing and unigram-LM scoring operators (SURVEY §2 round-4 extensions) —
DuckDB computes the identical semantics, same discipline as the driver's
oracle gate (pytest-hosted because the 50-entry registry is full).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.operators import text as T
from dwca_parquet_spark.operators.packing import (
    mix_plan,
    mix_sources,
    pack_documents,
    sql_pack_documents,
)
from dwca_parquet_spark.operators.sampling import sql_hash_sample_pred
from tests.conftest import SF_T2

BUDGET = 5_000


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# pack_documents
# ---------------------------------------------------------------------------


def test_pack_documents_parity(spark, duck):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    got = _rows(pack_documents(docs, "doc_id", "text", BUDGET))
    want = sorted(
        tuple(r)
        for r in duck.execute(
            sql_pack_documents("doc_id", "text", BUDGET)
        ).fetchall()
    )
    assert got == want


def test_pack_documents_partitioning_invariant(spark):
    """The two-level prefix sum must not depend on input partition layout."""
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    a = _rows(pack_documents(docs, "doc_id", "text", BUDGET))
    b = _rows(
        pack_documents(docs.repartition(7, "lang"), "doc_id", "text", BUDGET)
    )
    assert a == b


def test_pack_documents_budget_property(spark):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    packed = pack_documents(docs, "doc_id", "text", BUDGET)
    shards = (
        packed.groupBy("shard_id")
        .agg(F.sum("doc_tokens").alias("toks"), F.max("doc_tokens").alias("mx"))
        .collect()
    )
    last = max(r["shard_id"] for r in shards)
    global_mx = max(r["mx"] for r in shards)
    assert sorted(r["shard_id"] for r in shards) == list(range(last + 1))
    for r in shards:
        # a doc is placed in the shard where its first token lands, so a
        # shard overflows by less than its largest doc and underfills by
        # less than the previous shard's overflow carry
        assert r["toks"] < BUDGET + r["mx"]
        if r["shard_id"] != last:
            assert r["toks"] > BUDGET - global_mx
    # every doc assigned exactly once
    assert packed.count() == docs.count()


def test_pack_documents_empty_doc(spark, duck):
    rows = [(1, "three words here"), (2, ""), (3, "  "), (4, "one"),
            (5, "a b c d e f")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _rows(pack_documents(df, "doc_id", "text", 4))
    duck.execute("CREATE OR REPLACE TABLE pk_rows (doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO pk_rows VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in duck.execute(
            sql_pack_documents("doc_id", "text", 4, source="pk_rows")
        ).fetchall()
    )
    assert got == want
    toks = {r[0]: r[1] for r in got}
    assert toks[2] == 0 and toks[3] == 0  # empty/whitespace docs: zero tokens


# ---------------------------------------------------------------------------
# mix_sources
# ---------------------------------------------------------------------------

MIX_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}


def test_mix_plan_math(spark):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    plan = mix_plan(docs, "source", "text", MIX_WEIGHTS)
    totals = {
        r["source"]: r["toks"]
        for r in docs.groupBy("source")
        .agg(F.sum(T.token_count(F.col("text"))).alias("toks"))
        .collect()
    }
    k = min(totals[s] / w for s, w in MIX_WEIGHTS.items())
    assert set(plan) == set(MIX_WEIGHTS)
    binding = min(MIX_WEIGHTS, key=lambda s: totals[s] / MIX_WEIGHTS[s])
    assert plan[binding] == 1.0  # the binding source is kept whole
    for s, w in MIX_WEIGHTS.items():
        assert plan[s] == pytest.approx(min(1.0, w * k / totals[s]), abs=1e-6)


def test_mix_sources_parity_and_mix(spark, duck):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    plan = mix_plan(docs, "source", "text", MIX_WEIGHTS)
    out = mix_sources(docs, "source", "doc_id", "text", MIX_WEIGHTS)
    got = sorted(r["doc_id"] for r in out.select("doc_id").collect())

    # oracle: identical per-source hash thresholds compiled from the plan
    preds = " OR ".join(
        f"(source = '{s}' AND {sql_hash_sample_pred('CAST(doc_id AS VARCHAR)', f)})"
        for s, f in sorted(plan.items())
    )
    want = sorted(
        r[0]
        for r in duck.execute(
            f"SELECT doc_id FROM documents WHERE {preds}"
        ).fetchall()
    )
    assert got == want

    # achieved token mix lands near the target (doc-level sampling noise)
    mixed = {
        r["source"]: r["toks"]
        for r in out.groupBy("source")
        .agg(F.sum(T.token_count(F.col("text"))).alias("toks"))
        .collect()
    }
    tot = sum(mixed.values())
    for s, w in MIX_WEIGHTS.items():
        assert mixed[s] / tot == pytest.approx(w, rel=0.15)
    # unweighted sources are dropped entirely
    assert set(mixed) == set(MIX_WEIGHTS)


def test_mix_sources_missing_source_raises(spark):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    with pytest.raises(ValueError, match="absent"):
        mix_plan(docs, "source", "text", {"no_such_source": 1.0})


# ---------------------------------------------------------------------------
# unigram-LM scoring
# ---------------------------------------------------------------------------


def test_lm_logprob_parity(spark, duck):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    vocab, total = T.lm_fit_vocab(docs, "text", vocab_size=24)
    assert len(vocab) == 24 and total > 0
    got = _rows(T.lm_logprob_score(docs, "doc_id", "text", vocab, total))
    want = sorted(
        tuple(r)
        for r in duck.execute(
            T.sql_lm_logprob_score("doc_id", "text", vocab, total)
        ).fetchall()
    )
    assert got == want


def test_lm_logprob_oov_and_empty(spark, duck):
    rows = [(1, "the the the"), (2, "zzyzx qwfp"), (3, ""), (4, "the zzyzx")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab, total = [("the", 9)], 10  # p(the)=0.9, oov floor 0.1
    got = {r[0]: r for r in _rows(T.lm_logprob_score(df, "doc_id", "text", vocab, total))}
    duck.execute("CREATE OR REPLACE TABLE lm_rows (doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO lm_rows VALUES (?, ?)", rows)
    want = {
        r[0]: tuple(r)
        for r in duck.execute(
            T.sql_lm_logprob_score("doc_id", "text", vocab, total, source="lm_rows")
        ).fetchall()
    }
    assert got == want
    assert got[3][2] is None  # empty doc scores NULL
    assert got[1][2] > got[2][2]  # in-vocab text scores above pure OOV
    # rarity ordering: mixing one OOV token lowers the all-'the' score
    assert got[1][2] > got[4][2] > got[2][2]


def test_pack_sequences_budget_and_determinism(spark):
    from dwca_parquet_spark.operators.packing import (
        pack_sequences,
        sequence_stats,
    )
    from dwca_parquet_spark.operators.text import chunk_documents

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    SEQ = 64
    packed = pack_sequences(docs, "doc_id", "text", SEQ)
    stats = sequence_stats(packed, SEQ)

    # hard budget: NO sequence exceeds seq_len
    assert stats.filter(F.col("n_tokens") > SEQ).count() == 0

    # every chunk appears exactly once
    n_chunks = chunk_documents(docs, "doc_id", "text", SEQ, 0).count()
    assert packed.count() == n_chunks
    assert (
        packed.select("doc_id", "chunk_idx").distinct().count() == n_chunks
    )

    # seq_pos is consistent: positions within a sequence tile without gaps
    bad = (
        packed.groupBy("seq_id")
        .agg(
            F.sum("n_chunk_tokens").alias("tot"),
            F.max(F.col("seq_pos") + F.col("n_chunk_tokens")).alias("end"),
        )
        .filter(F.col("tot") != F.col("end"))
        .count()
    )
    assert bad == 0

    # next-fit guarantee: mean utilization comfortably above 1/2
    util = stats.agg(F.avg("utilization")).first()[0]
    assert util > 0.6, util

    # identical output under repartitioning (the determinism claim)
    again = pack_sequences(docs.repartition(17), "doc_id", "text", SEQ)
    assert sorted(map(tuple, packed.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_pack_sequences_string_ids(spark):
    """ADVICE r4: the output schema hard-coded the id column as bigint —
    string document ids (common in corpora; the dedup/LSH family accepts
    them) must round-trip with their input type and identical packing."""
    from dwca_parquet_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet").limit(200)
    SEQ = 64
    as_str = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("doc_id"),
        "text",
    )
    packed = pack_sequences(as_str, "doc_id", "text", SEQ)
    assert dict(packed.dtypes)["doc_id"] == "string"
    rows = packed.collect()
    assert rows and all(r["doc_id"].startswith("doc-") for r in rows)
    # hard budget still holds
    from dwca_parquet_spark.operators.packing import sequence_stats

    assert (
        sequence_stats(packed, SEQ).filter(F.col("n_tokens") > SEQ).count()
        == 0
    )
