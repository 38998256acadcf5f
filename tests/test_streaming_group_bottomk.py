"""Streaming per-group bottom-k (SURVEY §2 op 137): the per-batch fold
is the op-117 lattice merge, so state ≡ one-shot bottomk_by_group over
the union ROW-FOR-ROW; replayed batches are no-ops; the overlap panel
from state equals op 131 over the one-shot state; the real stream
wiring converges."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.sketch import (
    bottomk_by_group,
    group_overlap_estimates,
)
from dwca_parquet_spark.streaming.sketches import (
    apply_group_bottomk_batch,
    group_overlap_from_state,
    read_group_bottomk_state,
    stream_group_bottomk_maintain,
)
from tests.conftest import SF_T2

K = 64


def _pairs(spark):
    """(source, token-ish key) with real per-group overlap structure."""
    return spark.read.parquet(f"{SF_T2}/documents.parquet").select(
        F.col("source").alias("grp"),
        (F.col("doc_id") % 500).cast("string").alias("key"),
    ).filter(F.col("grp").isNotNull())


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _cast(df):
    return df.select(
        F.col("grp").cast("string").alias("grp"),
        F.col("key").cast("string").alias("key"),
    )


def test_fold_equals_one_shot_row_for_row(spark, tmp_path):
    d = _pairs(spark)
    state = str(tmp_path / "st")
    for i, b in enumerate(d.randomSplit([1.0, 1.0, 1.0], seed=5)):
        assert apply_group_bottomk_batch(
            spark, state, b, i, "grp", "key", K
        )
    _, got = read_group_bottomk_state(spark, state)
    want = bottomk_by_group(_cast(d), "grp", "key", K)
    assert _rows(got) == _rows(want) and got.count() > 0
    # and the overlap panel from state ≡ op 131 over the one-shot state
    ov_got = _rows(group_overlap_from_state(spark, state, K))
    ov_want = _rows(group_overlap_estimates(want, K))
    assert ov_got == ov_want and len(ov_got) > 0


def test_replay_is_noop(spark, tmp_path):
    d = _pairs(spark).limit(300)
    state = str(tmp_path / "st2")
    assert apply_group_bottomk_batch(spark, state, d, 0, "grp", "key", K)
    before = _rows(read_group_bottomk_state(spark, state)[1])
    assert not apply_group_bottomk_batch(
        spark, state, d, 0, "grp", "key", K
    )
    assert _rows(read_group_bottomk_state(spark, state)[1]) == before


def test_stream_wiring_converges(spark, tmp_path):
    d = _pairs(spark)
    src = str(tmp_path / "src")
    d.repartition(3).write.parquet(src)
    state = str(tmp_path / "state")
    q = stream_group_bottomk_maintain(
        spark.readStream.schema(d.schema).format("parquet").load(src),
        state,
        "grp",
        "key",
        str(tmp_path / "ckpt"),
        k=K,
    )
    q.awaitTermination(120)
    _, got = read_group_bottomk_state(spark, state)
    want = bottomk_by_group(_cast(d), "grp", "key", K)
    assert _rows(got) == _rows(want)
