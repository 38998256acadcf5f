"""Parquet sinks with the reference's output contract, fixed for scale.

Reference behavior (``/root/reference/src/dwca_parquet/libs/parquet.py:24-51``):
- zstd compression, overwrite mode;
- two outputs per conversion: versioned ``…/{id}/v{ver}.parquet`` and a
  mutable "latest" ``…/{id}.parquet`` alias;
- (anti-pattern) the query EXECUTES TWICE, once per output.

Here: write once, then filesystem-copy to the latest alias — the documented
fix from SURVEY §4.1. ``single_file=True`` reproduces the reference's
one-file layout (coalesce(1) + commit-rename) for small/medium outputs;
directory layout is the default and the only sane choice at 100 TB, where
output partitioning (``partition_by``) replaces the single-file contract.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str | Path,
    single_file: bool = False,
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> Path:
    """Write df as zstd parquet. Returns the final path.

    single_file: coalesce to one task and rename the part file to ``path``
    (reference writes one .parquet object). Incompatible with partition_by.
    """
    path = Path(path)
    if single_file:
        if partition_by:
            raise ValueError("single_file and partition_by are exclusive")
        tmp = path.with_suffix(path.suffix + ".tmp.dir")
        (
            df.coalesce(1)
            .write.mode("overwrite")
            .option("compression", compression)
            .parquet(str(tmp))
        )
        part = next(tmp.glob("part-*.parquet"))
        path.parent.mkdir(parents=True, exist_ok=True)
        if path.exists():
            path.unlink()
        shutil.move(str(part), str(path))
        shutil.rmtree(tmp)
        return path
    writer = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(path))
    return path


def write_versioned(
    df: DataFrame,
    base_dir: str | Path,
    dataset_id: str,
    version: str | int,
    single_file: bool = True,
) -> tuple[Path, Path] | None:
    """Versioned + latest outputs, computing the plan ONCE.

    Mirrors the reference's path scheme (``libs/parquet.py:24-29``) and its
    idempotency guard (``:33``: skip when the versioned output exists;
    returns None in that case), but replaces the double execution
    (``:48-51``) with write-once + copy.
    """
    base = Path(base_dir)
    versioned = base / dataset_id / f"v{version}.parquet"
    latest = base / f"{dataset_id}.parquet"
    if versioned.exists():
        return None
    write_parquet(df, versioned, single_file=single_file)
    if single_file:
        latest.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(versioned, latest)
    else:
        if latest.exists():
            shutil.rmtree(latest)
        shutil.copytree(versioned, latest)
    return versioned, latest
