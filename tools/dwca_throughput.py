#!/usr/bin/env python
"""The BASELINE.md protocol's DwC-A conversion-throughput run: a
synthetic archive of ~600k core rows (+1:1 extension) converted
end-to-end — zip staging → meta.xml discovery → star flatten (fid+geom)
→ zstd parquet — by BOTH engines:

- Spark: this repo's pipeline (sources/dwca.py → plans/flatten.py →
  sinks/parquet.py write_parquet), the same call path the service runs.
- DuckDB: the reference's query semantics
  (/root/reference/src/dwca_parquet/templates/query.sql:1-5 — star join
  + fid + geom, sample_size=-1 inference) over the same staged CSVs,
  COPY TO zstd parquet. Run ONCE, like the reference worker does (its
  execute-twice versioned+latest inefficiency is deliberately not
  charged to it).

Reports rows/s for each (core rows ÷ wall time, conversion only — the
synthetic-archive build is excluded for both). Writes the markdown row
for SCALE.md with --md.

Run: python tools/dwca_throughput.py [--md] [--rows N]
"""

from __future__ import annotations

import csv
import io
import shutil
import sys
import tempfile
import time
import zipfile
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

N_ROWS = 600_000


def build_big_archive(tmp: Path, n: int) -> Path:
    """~n-core-row DwC-A: occurrence core + 1:1 measurementorfact
    extension, streamed straight into the zip (no per-row dicts)."""
    import dwca_fixtures as FX

    core_headers = [
        "id", "occurrenceID", "scientificName", "eventDate",
        "decimalLatitude", "decimalLongitude", "individualCount",
    ]
    ext_headers = ["coreid", "measurementType", "measurementValue"]

    def core_csv() -> str:
        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow(core_headers)
        for i in range(n):
            w.writerow([
                i, f"occ-{i}", f"Species {i % 997}",
                f"2026-{(i % 12) + 1:02d}-{(i % 28) + 1:02d}",
                round(-90 + (i * 17 % 18000) / 100.0, 2),
                round(-180 + (i * 31 % 36000) / 100.0, 2),
                i % 50,
            ])
        return buf.getvalue()

    def ext_csv() -> str:
        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow(ext_headers)
        for i in range(n):
            w.writerow([i, "count" if i % 2 else "mass", i % 1000])
        return buf.getvalue()

    meta = FX._meta_xml(
        "occurrence.txt", ",", "UTF-8",
        [("measurementorfact.txt", ",", "UTF-8")],
    )
    zpath = tmp / "big.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.xml", meta)
        z.writestr("occurrence.txt", core_csv())
        z.writestr("measurementorfact.txt", ext_csv())
    return zpath


def main() -> None:
    import duckdb

    from dwca_parquet_spark.plans.flatten import dwca_flatten
    from dwca_parquet_spark.session import get_spark
    from dwca_parquet_spark.sinks.parquet import write_parquet
    from dwca_parquet_spark.sources.dwca import read_dwca

    n = N_ROWS
    if "--rows" in sys.argv:
        n = int(sys.argv[sys.argv.index("--rows") + 1])

    tmp = Path(tempfile.mkdtemp(prefix="dwca_tp"))
    try:
        zpath = build_big_archive(tmp, n)
        spark = get_spark("dwca-throughput")
        spark.sparkContext.setLogLevel("ERROR")
        # protocol: warm SparkSession (BASELINE.md) — JVM/codegen warm-up
        # is session cost, not conversion cost
        spark.range(1000).count()
        # ingestion-session knob: a single big CSV must split across the
        # executor threads (default 128 MB puts a 34 MB file in ONE task)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 << 20))

        t0 = time.perf_counter()
        archive, core_df, ext_dfs = read_dwca(spark, zpath, tmp / "staging")
        flat = dwca_flatten(archive, core_df, ext_dfs)
        write_parquet(flat, tmp / "out_spark.parquet")
        t_spark = time.perf_counter() - t0

        # the 100 TB mode (SURVEY §1.2): schema-first — no inference scan
        t0 = time.perf_counter()
        archive2, core2, exts2 = read_dwca(
            spark, zpath, tmp / "staging2", infer_schema=False
        )
        flat2 = dwca_flatten(archive2, core2, exts2)
        write_parquet(flat2, tmp / "out_spark2.parquet")
        t_spark2 = time.perf_counter() - t0

        core_csvf = archive.root / archive.core.location
        ext = archive.extensions[0]
        ext_csvf = archive.root / ext.location
        con = duckdb.connect()
        t0 = time.perf_counter()
        con.execute(
            f"""COPY (
              SELECT core."{archive.core.id_col}" AS fid,
                CASE WHEN decimalLatitude IS NOT NULL AND decimalLongitude IS NOT NULL
                     THEN 'POINT (' || CAST(decimalLatitude AS VARCHAR) || ' ' ||
                          CAST(decimalLongitude AS VARCHAR) || ')' END AS geom, *
              FROM read_csv('{core_csvf}', header=true, delim=',', sample_size=-1) AS core
              JOIN read_csv('{ext_csvf}', header=true, delim=',', sample_size=-1) AS mof
                ON mof."{ext.id_col}" = core."{archive.core.id_col}"
            ) TO '{tmp / "out_duck.parquet"}' (FORMAT PARQUET, COMPRESSION ZSTD)"""
        )
        t_duck = time.perf_counter() - t0

        n_out2 = spark.read.parquet(str(tmp / "out_spark2.parquet")).count()
        assert n_out2 == n
        n_out = spark.read.parquet(str(tmp / "out_spark.parquet")).count()
        n_duck = con.execute(
            f"SELECT count(*) FROM read_parquet('{tmp / 'out_duck.parquet'}')"
        ).fetchone()[0]
        assert n_out == n_duck == n, (n_out, n_duck)

        rs_spark = round(n / t_spark)
        rs_spark2 = round(n / t_spark2)
        rs_duck = round(n / t_duck)
        print(
            f"rows={n}: spark {t_spark:.2f}s ({rs_spark:,} rows/s), "
            f"spark schema-first {t_spark2:.2f}s ({rs_spark2:,} rows/s), "
            f"duckdb {t_duck:.2f}s ({rs_duck:,} rows/s)",
            file=sys.stderr,
        )
        if "--md" in sys.argv:
            print("| engine | wall | rows/s |")
            print("|---|---|---|")
            print(f"| Spark pipeline (inference parity mode) | {t_spark:.2f} s | {rs_spark:,} |")
            print(f"| Spark pipeline (schema-first, the 100 TB mode) | {t_spark2:.2f} s | {rs_spark2:,} |")
            print(f"| DuckDB (reference query.sql semantics, COPY) | {t_duck:.2f} s | {rs_duck:,} |")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
