"""Mimic the driver's correctness gate locally.

Runs every ``queries()`` entry under a PLAIN SparkSession (no repo-side
session config, like the driver does) at sf0.01 and compares row count,
column names, and a sorted value hash against the DuckDB ``oracle_sql()``.
"""
from __future__ import annotations

import hashlib
import json
import math
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry  # noqa: E402
from dwca_parquet_spark.cache import release_caches  # noqa: E402

import os

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 6))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    # --json=PATH writes the per-query result dict as a committed
    # artifact (DRIVER_CHECK_r{N}.json — VERDICT r9 ask #5: the
    # driver's own CORRECTNESS file caps at 50 rows, so the full
    # registry needs a durable record the judge can read without a
    # live re-run)
    json_path = None
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            json_path = a.split("=", 1)[1]
        else:
            args.append(a)
    only = set(args)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("driver-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {}
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            rec["spark_rows"] = len(rows)
            if name in oracles:
                cur = con.execute(oracles[name])
                ocols = [d[0] for d in cur.description]
                orows = cur.fetchall()
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(rows) == len(orows)
                rec["schema_match"] = sorted(cols) == sorted(ocols)
                rec["hash_match"] = value_hash(cols, rows) == value_hash(ocols, orows)
            else:
                rec["oracle_rows"] = None
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:400]
        # operators persist() tracked intermediates; release them so 60+
        # queries in one session don't accumulate cached tables, and flag
        # any cache the registry missed.
        release_caches()
        leaked = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        if leaked:
            rec["leaked_caches"] = leaked
            spark.catalog.clearCache()
        results[name] = rec
        bad = rec.get("err") or (
            name in oracles
            and not (rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"))
        )
        print(("FAIL " if bad else "ok   ") + name, flush=True)
        if bad:
            print("     " + json.dumps(rec)[:500], flush=True)
    n_bad = sum(
        1
        for n, r in results.items()
        if r.get("err")
        or (n in oracles and not (r.get("rows_match") and r.get("schema_match") and r.get("hash_match")))
    )
    print(f"\n{len(results) - n_bad}/{len(results)} green")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    spark.stop()
    if n_bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
