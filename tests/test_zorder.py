"""Z-order clustered writes (SURVEY §2 round-4): content preservation,
and the measurable skipping claim — under a z-order layout a narrow
predicate on EITHER clustered column overlaps far fewer files than under
a single-column range layout."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from dwca_parquet_spark.sinks.zorder import (
    file_pruning_profile,
    write_zordered,
    zorder_value,
)


def _files_overlapping(profile, lo, hi) -> int:
    return profile.filter(
        (F.col("min_v") <= hi) & (F.col("max_v") >= lo)
    ).count()


def test_zorder_preserves_rows_and_skips_both_dims(spark, tmp_path):
    # two independent uniform dims — the worst case for 1-D clustering
    df = (
        spark.range(40_000)
        .select(
            F.col("id"),
            (F.col("id") * 2654435761 % 97_213).alias("x"),
            (F.col("id") * 40503 % 89_041).alias("y"),
        )
    )
    zpath = tmp_path / "zordered"
    xpath = tmp_path / "xranged"
    write_zordered(df, zpath, ["x", "y"], bits=6, num_files=32)
    (
        df.repartitionByRange(32, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(str(xpath))
    )

    # content identical
    got = Counter(map(tuple, spark.read.parquet(str(zpath)).collect()))
    want = Counter(map(tuple, df.collect()))
    assert got == want

    # narrow window on y (~2% of the domain)
    y_prof_z = file_pruning_profile(spark, zpath, "y")
    y_prof_x = file_pruning_profile(spark, xpath, "y")
    z_hits = _files_overlapping(y_prof_z, 10_000, 11_800)
    x_hits = _files_overlapping(y_prof_x, 10_000, 11_800)
    # the x-ranged layout cannot skip on y at all (every file spans ~all y)
    assert x_hits >= 30
    assert z_hits <= x_hits // 2

    # and x-pruning still works under z-order (both dims prune)
    x_prof_z = file_pruning_profile(spark, zpath, "x")
    zx_hits = _files_overlapping(x_prof_z, 10_000, 12_000)
    assert zx_hits <= 16


def test_zorder_value_deterministic_and_null_safe(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 5.0), (2, None, 7.0), (3, 99.0, None)],
        "id long, x double, y double",
    )
    a = {r["id"]: r["_zval"] for r in zorder_value(df, ["x", "y"], bits=4).collect()}
    b = {r["id"]: r["_zval"] for r in zorder_value(df, ["x", "y"], bits=4).collect()}
    assert a == b
    assert all(v is not None and v >= 0 for v in a.values())
