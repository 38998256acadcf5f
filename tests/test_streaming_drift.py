"""Streaming drift state (SURVEY §2 op 135): per-batch folds of the
four drift panels yield EXACTLY the one-shot corpus_drift over the
batch unions (every metric — the components' folds are all exact),
replayed batches are no-ops, and the real stream wiring converges to
the same report."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.drift import corpus_drift
from dwca_parquet_spark.streaming.drift import (
    apply_drift_batch,
    drift_state_report,
    read_drift_state,
    stream_drift_maintain,
)
from tests.conftest import SF_T2


def _docs(spark):
    return spark.read.parquet(f"{SF_T2}/documents.parquet").select(
        "doc_id", "text", "source"
    )


def _old_new(spark):
    """Old = two thirds of the corpus; new = the last third plus a
    planted fresh source with duplicated content — every panel moves."""
    docs = _docs(spark)
    old = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) != 0)
    # carried-over content: a subset of OLD's own rows (same texts), so
    # retention is genuinely between 0 and 1
    carried = old.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    fresh = docs.sparkSession.createDataFrame(
        [(10_000 + i, "a fresh duplicated page", "newsrc") for i in range(30)]
        + [(11_000 + i, f"fresh unique page {i} " * 20, "newsrc")
           for i in range(20)],
        "doc_id long, text string, source string",
    )
    return old, carried.unionByName(fresh)


def _fold(spark, state, df, n_batches, start_id=0):
    parts = df.randomSplit([1.0] * n_batches, seed=11)
    for i, b in enumerate(parts):
        assert apply_drift_batch(
            spark, state, b, start_id + i, "doc_id", "text", "source"
        )


def test_fold_equals_one_shot_corpus_drift_exactly(spark, tmp_path):
    old, new = _old_new(spark)
    st_old, st_new = str(tmp_path / "old"), str(tmp_path / "new")
    _fold(spark, st_old, old, 3)
    _fold(spark, st_new, new, 2)
    got_report, got = drift_state_report(spark, st_old, st_new, "c")
    want_report, want = corpus_drift(
        old, new, "doc_id", "text", source_col="source", name="c"
    )
    assert got == want  # EXACT: every panel's fold is exact
    assert got_report == want_report
    # and the panels genuinely moved on this construction
    assert got["docs_new"] > 0 and got["source_deltas"]["newsrc"] > 0
    assert got["dup_rate_new"] > got["dup_rate_old"]
    assert got["retention"] is not None and 0.0 < got["retention"] < 1.0


def test_replay_is_noop(spark, tmp_path):
    d = _docs(spark).limit(150)
    state = str(tmp_path / "st")
    assert apply_drift_batch(spark, state, d, 0, "doc_id", "text", "source")

    def snapshot():
        _, panels = read_drift_state(spark, state)
        return {
            name: sorted(tuple(r) for r in df.collect())
            for name, df in panels.items()
        }

    before = snapshot()
    assert not apply_drift_batch(
        spark, state, d, 0, "doc_id", "text", "source"
    )
    assert snapshot() == before
    # a crashed .tmp residue is ignored by reads and replaced by the
    # next successful attempt for that id (the op-132 gate pattern)
    import pathlib

    residue = pathlib.Path(state) / "v1.tmp"
    residue.mkdir(parents=True)
    (residue / "junk").write_text("partial")
    assert snapshot() == before  # watermark still 0, panels unchanged
    assert apply_drift_batch(
        spark, state, d.limit(40), 1, "doc_id", "text", "source"
    )
    _, panels = read_drift_state(spark, state)
    assert panels is not None  # v1 committed over the residue


def test_stream_wiring_converges(spark, tmp_path):
    old, new = _old_new(spark)
    src = str(tmp_path / "src")
    new.repartition(3).write.parquet(src)
    st_old, st_new = str(tmp_path / "stold"), str(tmp_path / "stnew")
    _fold(spark, st_old, old, 2)
    q = stream_drift_maintain(
        spark.readStream.schema(new.schema).format("parquet").load(src),
        st_new,
        "doc_id",
        "text",
        str(tmp_path / "ckpt"),
        source_col="source",
    )
    q.awaitTermination(120)
    _, got = drift_state_report(spark, st_old, st_new)
    _, want = corpus_drift(old, new, "doc_id", "text", source_col="source")
    assert got == want
