"""End-to-end INCREMENTAL ingestion composition (round 4): the corpus is
a stored parquet table advanced per batch —

    batch → Bloom dedup vs history → CDC merge into the store →
    rollup state advance → compaction when shattered

— two simulated days of ingestion, then the invariants: the stored table
equals the from-scratch build (dedup exactness + merge semantics), the
rollup state equals the from-scratch aggregate over the final table, and
compaction changed files but not rows. Each operator has its own
differential gate; this pins that the INCREMENTAL path reproduces the
batch-rebuild answer, which is the entire point of the family.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.bloom import dedup_incremental
from dwca_parquet_spark.operators.cdc import apply_cdc
from dwca_parquet_spark.operators.rollup import (
    rollup_merge,
    rollup_partial,
    rollup_read,
)
from dwca_parquet_spark.sinks.compact import compact_parquet
from tests.conftest import SF_T2

KEYS = ["source"]
VALS = ["n_chars"]


def _store(df, path):
    df.write.mode("overwrite").option("compression", "zstd").parquet(path)


def test_incremental_ingestion_equals_rebuild(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet").select(
        "doc_id", "text", "source", "n_chars"
    )
    day0 = docs.filter(F.col("doc_id") % 3 == 0)
    day1 = docs.filter(F.col("doc_id") % 3 == 1)
    # day2 re-sends some of day1 (feed overlap) plus the rest
    day2 = docs.filter(
        (F.col("doc_id") % 3 == 2) | (F.col("doc_id") % 7 == 1)
    )

    store = str(tmp_path / "corpus")
    _store(day0.repartition(16), store)  # deliberately shattered
    state = rollup_partial(day0, KEYS, VALS)

    for i, batch in enumerate((day1, day2)):
        history = spark.read.parquet(store)
        # materialize the batch's dedup result before the store is
        # overwritten — a lazy `fresh` would re-read replaced files
        fresh_path = str(tmp_path / f"fresh_day{i + 1}")
        _store(dedup_incremental(batch, history, "doc_id", "text"), fresh_path)
        fresh = spark.read.parquet(fresh_path)
        changes = fresh.select(
            "*", F.lit(1).alias("seq"), F.lit("I").alias("op")
        )
        merged = apply_cdc(history, changes, ["doc_id"], "seq", "op")
        tmp_out = str(tmp_path / "corpus.next")
        _store(merged.repartition(16), tmp_out)
        spark.read.parquet(tmp_out).write.mode("overwrite").option(
            "compression", "zstd"
        ).parquet(store)
        state = rollup_merge(state, rollup_partial(fresh, KEYS, VALS), KEYS, VALS)

    result = compact_parquet(spark, store, target_bytes=1 << 22)
    final = spark.read.parquet(store)

    # 1. the incremental store equals the from-scratch content dedup in
    #    arrival order, computed here with PLAIN anti-joins (no bloom, no
    #    CDC — the independently-gated equivalents): later re-sends AND
    #    cross-day planted duplicate texts drop, first arrival stays
    from dwca_parquet_spark.functions import hashing as H

    def keyed(df):
        return df.select(
            "*", H.normalize_text(F.col("text")).alias("_n")
        ).select("*", H.poly_hash(F.col("_n")).alias("_chash")).drop("_n")

    cols = ["doc_id", "text", "source", "n_chars"]
    rebuild = day0
    for batch in (day1, day2):
        prior = keyed(rebuild).select("_chash").distinct()
        fresh_plain = (
            keyed(batch).join(prior, "_chash", "left_anti").select(*cols)
        )
        rebuild = rebuild.unionByName(fresh_plain)
    got = Counter(map(tuple, final.collect()))
    want = Counter(map(tuple, rebuild.collect()))
    assert got == want

    # 2. rollup state equals the from-scratch aggregate over the store
    got_state = {
        r["source"]: (r["cnt"], r["mean_n_chars"])
        for r in rollup_read(state, VALS).collect()
    }
    want_state = {
        r["source"]: (r["cnt"], r["mean_n_chars"])
        for r in rollup_read(
            rollup_partial(final, KEYS, VALS), VALS
        ).collect()
    }
    assert got_state == want_state

    # 3. compaction acted on the shattered store without changing rows
    assert result["acted"] is True
    assert result["n_files_after"] < result["n_files"]
