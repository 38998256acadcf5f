"""Gates for the per-file bloom/minmax sidecar (SURVEY §2 op 128):
exact parity with the full-scan filter, measured file skipping, the
no-false-negative law under adversarial fpp, NULL keys, and the
key-column guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.sinks.fileindex import (
    read_pruned,
    write_with_file_index,
)
from tests.conftest import SF_T2

N_FILES = 20


@pytest.fixture(scope="module")
def indexed_orders(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fidx") / "orders")
    orders = spark.read.parquet(f"{SF_T2}/orders.parquet")
    info = write_with_file_index(
        orders, path, "o_orderkey", files=N_FILES, fpp=0.01
    )
    return path, info


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pruned_read_equals_full_scan_filter(spark, indexed_orders):
    path, info = indexed_orders
    assert info["files"] == N_FILES
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{path}/data").limit(7).collect()]
    probe = keys + [-1, 10**15]  # present + definitely-absent values
    got, report = read_pruned(spark, path, "o_orderkey", probe)
    want = spark.read.parquet(f"{path}/data").filter(
        F.col("o_orderkey").isin(probe)
    )
    assert _sorted_rows(got) == _sorted_rows(want)
    assert len(_sorted_rows(got)) >= 7
    assert report["files_total"] == N_FILES


def test_point_probe_skips_most_files(spark, indexed_orders):
    path, _ = indexed_orders
    key = spark.read.parquet(f"{path}/data").limit(1).collect()[0][
        "o_orderkey"
    ]
    got, report = read_pruned(spark, path, "o_orderkey", [key])
    assert got.count() >= 1
    # one key lives in one file; fpp=0.01 over 20 files adds ~0.2
    # expected false-positive files — ≤ 5 is a generous ceiling
    assert report["files_read"] <= 5, report
    # absent key: expect (almost) everything skipped, and zero rows
    got2, report2 = read_pruned(spark, path, "o_orderkey", [-12345])
    assert got2.count() == 0 and report2["files_read"] <= 5


def test_no_false_negatives_even_at_adversarial_fpp(spark, tmp_path):
    df = spark.range(0, 5_000).select(F.col("id").alias("k"))
    p = str(tmp_path / "adv")
    write_with_file_index(df, p, "k", files=16, fpp=0.5)
    probe = list(range(0, 5_000, 97))
    got, report = read_pruned(spark, p, "k", probe)
    assert sorted(r["k"] for r in got.collect()) == probe
    assert report["files_total"] == 16


def test_null_keys_indexed_and_never_matched(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "k long, v string"
    ).select(F.col("v").alias("key"), "k")
    p = str(tmp_path / "nulls")
    write_with_file_index(df, p, "key", files=2)
    got, _ = read_pruned(spark, p, "key", ["a", "c", "zz"])
    assert sorted(r["k"] for r in got.collect()) == [1, 3]


def test_non_indexable_key_type_rejected_at_build(spark, tmp_path):
    """ADVICE r8: double/date/decimal keys are outside the portable-
    hash contract — the build must refuse them instead of silently
    breaking the no-false-negative law at probe time."""
    orders = spark.read.parquet(f"{SF_T2}/orders.parquet")
    dbl = orders.select(F.col("o_totalprice").alias("price"), "o_orderkey")
    with pytest.raises(ValueError, match="integral or string"):
        write_with_file_index(dbl, str(tmp_path / "bad"), "price", files=4)


def test_probe_values_coerced_to_key_type(spark, indexed_orders):
    """ADVICE r8: a string-typed probe value against a long key must
    hash and range-compare exactly as the build did — the probe
    coerces, so '<int>' and int return identical rows."""
    path, _ = indexed_orders
    keys = [19, 101, 999999999]
    as_int, rep_i = read_pruned(spark, path, "o_orderkey", keys)
    as_str, rep_s = read_pruned(
        spark, path, "o_orderkey", [str(v) for v in keys]
    )
    assert _sorted_rows(as_int) == _sorted_rows(as_str)
    assert rep_i == rep_s and rep_i["files_read"] >= 1


def test_probe_wrong_column_raises(spark, indexed_orders):
    path, _ = indexed_orders
    with pytest.raises(ValueError, match="index is on"):
        read_pruned(spark, path, "o_custkey", [1])


def test_append_extends_index_without_touching_old_rows(spark, tmp_path):
    """op 129: pruned reads stay ≡ full-scan filter across appends, the
    pre-existing sidecar rows are byte-identical, and only the new
    files gain rows."""
    p = str(tmp_path / "appendable")
    base = spark.range(0, 3_000).select(F.col("id").alias("k"))
    write_with_file_index(base, p, "k", files=8)
    before = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{p}/_fileindex/stats").collect()
    )
    from dwca_parquet_spark.sinks.fileindex import file_index_append

    batch = spark.range(50_000, 52_000).select(F.col("id").alias("k"))
    rep = file_index_append(batch.repartition(4), p)
    assert rep["files_new"] == 4 and rep["files_total"] == 12
    after = {
        tuple(r)
        for r in spark.read.parquet(f"{p}/_fileindex/stats").collect()
    }
    assert set(before) <= after and len(after) == 12
    # probes across old keys, new keys, and absent keys stay exact
    probe = [5, 2999, 50_000, 51_999, 4_000, 99_999]
    got, rep2 = read_pruned(spark, p, "k", probe)
    want = spark.read.parquet(f"{p}/data").filter(F.col("k").isin(probe))
    assert _sorted_rows(got) == _sorted_rows(want)
    assert sorted(r["k"] for r in got.collect()) == [5, 2999, 50_000, 51_999]
    assert rep2["files_total"] == 12 and rep2["files_read"] < 12


def test_loaded_index_probe_equals_read_pruned(spark, indexed_orders):
    """FileIndex.load + probe ≡ the one-shot read_pruned (same rows,
    same report), and repeated probes reuse the driver-held sidecar."""
    from dwca_parquet_spark.sinks.fileindex import FileIndex

    path, _ = indexed_orders
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{path}/data").limit(3).collect()]
    idx = FileIndex.load(spark, path)
    a, ra = idx.probe("o_orderkey", keys)
    b, rb = read_pruned(spark, path, "o_orderkey", keys)
    assert _sorted_rows(a) == _sorted_rows(b) and ra == rb
    # a second probe with different values needs no reload
    c, rc = idx.probe("o_orderkey", [-5])
    assert c.count() == 0 and rc["files_total"] == ra["files_total"]
    with pytest.raises(ValueError, match="index is on"):
        idx.probe("o_custkey", [1])
