"""Small-file compaction (SURVEY §2 round-4): file count shrinks to the
byte-sized plan, content is preserved exactly, the swap leaves no
staging residue, and an already-compact table is a no-op."""

from __future__ import annotations

from collections import Counter

from dwca_parquet_spark.sinks.compact import compact_parquet, compaction_plan


def test_compact_shrinks_and_preserves(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    path = str(tmp_path / "shattered")
    # the degraded state (zstd like every sink in this repo — a codec
    # CHANGE during compaction shifts the byte total and costs one extra
    # converging pass, see compact_parquet docstring)
    src.repartition(64).write.option("compression", "zstd").parquet(path)

    plan0 = compaction_plan(spark, path, target_bytes=1 << 40)
    assert plan0["n_files"] == 64

    before = Counter(map(tuple, spark.read.parquet(path).collect()))
    target = max(1, plan0["total_bytes"] // 4)  # aim for ~4-5 files
    result = compact_parquet(spark, path, target_bytes=target)
    assert result["acted"] is True
    assert result["n_files_after"] < 64
    assert result["n_files_after"] <= result["n_out"] + 1

    after = Counter(map(tuple, spark.read.parquet(path).collect()))
    assert after == before

    # no staging residue
    leftovers = [p.name for p in tmp_path.iterdir()]
    assert leftovers == ["shattered"]

    # idempotent: second run is a no-op
    again = compact_parquet(spark, path, target_bytes=target)
    assert again["acted"] is False
    assert again["n_files"] == result["n_files_after"]
