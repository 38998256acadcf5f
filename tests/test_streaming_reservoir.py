"""Streaming weighted-reservoir state (SURVEY §2.G op 163). The op-155
gate pattern: report(state) ≡ weighted_sample_k(distinct union) after
any batch split, replay is a transactional no-op, duplicate deliveries
collapse, the state never exceeds n rows, and the foreachBatch wiring
converges.
"""

from __future__ import annotations

from dwca_parquet_spark.operators.sampling import weighted_sample_k
from dwca_parquet_spark.streaming.reservoir import (
    apply_reservoir_batch,
    read_reservoir_state,
    reservoir_report,
    stream_reservoir_maintain,
)

N = 12
SALT = "r"


def _rows(i0, i1):
    return [(i, float(1 + (i * 7) % 20)) for i in range(i0, i1)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, w double")


def _want(spark, rows):
    return sorted(
        (r["id"], r["es_key"])
        for r in weighted_sample_k(
            _df(spark, sorted(set(rows))), "id", "w", N, SALT
        ).collect()
    )


def _got(spark, path):
    _, state = read_reservoir_state(spark, path)
    rep = reservoir_report(state)
    return sorted((r["id"], r["es_key"]) for r in rep.collect())


def test_fold_law_and_replay(spark, tmp_path):
    path = str(tmp_path / "resv")
    all_rows: list = []
    for bid, (lo, hi) in enumerate([(0, 40), (40, 55), (55, 120)]):
        rows = _rows(lo, hi)
        all_rows += rows
        assert apply_reservoir_batch(
            spark, path, _df(spark, rows), bid, "id", "w", N, SALT
        )
        assert _got(spark, path) == _want(spark, all_rows), bid
        # state is bounded by n
        _, st = read_reservoir_state(spark, path)
        assert st.count() <= N
    # replay of the last batch: transactional no-op
    before = _got(spark, path)
    assert (
        apply_reservoir_batch(
            spark, path, _df(spark, _rows(55, 120)), 2, "id", "w", N, SALT
        )
        is False
    )
    assert _got(spark, path) == before


def test_duplicates_domain_and_empty_batches(spark, tmp_path):
    path = str(tmp_path / "resv")
    rows = _rows(0, 30)
    apply_reservoir_batch(spark, path, _df(spark, rows), 0, "id", "w", N, SALT)
    # re-delivering the same rows (plus junk outside the domain) in a
    # NEW batch changes nothing: identical keys collapse in distinct,
    # NULL keys / non-positive weights never enter the race
    junk = [(None, 5.0), (500, 0.0), (501, -2.0)]
    dup = spark.createDataFrame(rows + junk, "id long, w double")
    apply_reservoir_batch(spark, path, dup, 1, "id", "w", N, SALT)
    assert _got(spark, path) == _want(spark, rows)
    # an empty batch advances the watermark, state unchanged
    apply_reservoir_batch(
        spark, path, _df(spark, []), 2, "id", "w", N, SALT
    )
    assert _got(spark, path) == _want(spark, rows)


def test_stream_wiring_converges(spark, tmp_path):
    rows = _rows(0, 100)
    src = str(tmp_path / "src")
    _df(spark, rows).repartition(4).write.parquet(src)
    path = str(tmp_path / "resv")
    q = stream_reservoir_maintain(
        spark.readStream.schema("id long, w double").format("parquet").load(src),
        path,
        str(tmp_path / "ckpt"),
        "id",
        "w",
        N,
        SALT,
    )
    q.awaitTermination(120)
    assert _got(spark, path) == _want(spark, rows)


def test_group_reservoir_fold_law(spark, tmp_path):
    """Op 164: per-group state ≡ group_weighted_sample_k(distinct
    union) for every group, including a group first seen in batch 2;
    replay no-op; ≤ k rows per group."""
    from dwca_parquet_spark.operators.sampling import (
        group_weighted_sample_k,
    )
    from dwca_parquet_spark.streaming.reservoir import (
        apply_group_reservoir_batch,
    )

    K = 4
    rows = [
        (g, i, float(1 + ((g * 31 + i) * 7) % 20))
        for g in (0, 1)
        for i in range(30)
    ]
    late_group = [
        (2, i, float(1 + ((2 * 31 + i) * 7) % 20)) for i in range(15)
    ]
    schema = "g long, id long, w double"
    path = str(tmp_path / "gres")
    apply_group_reservoir_batch(
        spark, path, spark.createDataFrame(rows[:25], schema), 0,
        "g", "id", "w", K, "gz",
    )
    apply_group_reservoir_batch(
        spark, path,
        spark.createDataFrame(rows[25:] + late_group, schema), 1,
        "g", "id", "w", K, "gz",
    )
    _, st = read_reservoir_state(spark, path)
    rep = reservoir_report(st)
    want = group_weighted_sample_k(
        spark.createDataFrame(rows + late_group, schema),
        "g", "id", "w", K, "gz",
    )
    got_s = sorted((r["g"], r["id"], r["es_key"]) for r in rep.collect())
    want_s = sorted((r["g"], r["id"], r["es_key"]) for r in want.collect())
    assert got_s == want_s
    per_g: dict = {}
    for g, _i, _e in got_s:
        per_g[g] = per_g.get(g, 0) + 1
    assert per_g == {0: K, 1: K, 2: K}
    # replay → transactional no-op
    assert (
        apply_group_reservoir_batch(
            spark, path,
            spark.createDataFrame(late_group, schema), 1,
            "g", "id", "w", K, "gz",
        )
        is False
    )
