"""CSV sink (SURVEY §2.G op 12 closure; round-trip-tested).

The reference never writes CSV — it only *reads* DwC-A CSVs
(``/root/reference/src/dwca_parquet/templates/query.sql:2,4``) — but the
engine's sink surface mirrors its source surface so datasets can round-trip.
Defaults chosen for lossless round-trips: header row, explicit null marker,
quoting handled by Spark's writer, optional zstd-less plain text (CSV codecs
gzip/bzip2 available via ``compression``).

Scale note: like every Spark file sink this writes a directory of part
files — one per partition, written in parallel by executors.
``single_file=True`` is the driver-coalesced convenience for small outputs.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

CSV_OPTIONS = {
    "header": "true",
    "nullValue": "\\N",
    "emptyValue": "",
    "timestampFormat": "yyyy-MM-dd HH:mm:ss",
    "escape": '"',
}


def write_csv(
    df: DataFrame,
    path: str | Path,
    single_file: bool = False,
    compression: str | None = None,
    sep: str = ",",
) -> Path:
    """Write df as CSV. Returns the final path.

    ``single_file=True`` coalesces to one task and renames the part file to
    ``path`` (same commit-rename contract as sinks.parquet.write_parquet).
    """
    path = Path(path)
    opts = dict(CSV_OPTIONS, sep=sep)
    if compression:
        opts["compression"] = compression
    if single_file:
        tmp = path.with_suffix(path.suffix + ".tmp.dir")
        df.coalesce(1).write.mode("overwrite").options(**opts).csv(str(tmp))
        part = next(p for p in tmp.glob("part-*") if p.suffix != ".crc")
        path.parent.mkdir(parents=True, exist_ok=True)
        if path.exists():
            path.unlink()
        shutil.move(str(part), str(path))
        shutil.rmtree(tmp)
        return path
    df.write.mode("overwrite").options(**opts).csv(str(path))
    return path


def read_csv(
    spark: SparkSession,
    path: str | Path,
    schema: StructType | str,
    sep: str = ",",
) -> DataFrame:
    """Read back a write_csv output with an explicit schema.

    Schema-first (no inference) is the determinism rule from SURVEY §1.2:
    sniffer differences between engines are the #1 round-trip hazard.
    """
    return (
        spark.read.options(**dict(CSV_OPTIONS, sep=sep))
        .schema(schema)
        .csv(str(path))
    )
