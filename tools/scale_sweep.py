"""Empirical scale sweep: does the Spark-vs-DuckDB ratio converge as data
grows?  (VERDICT r2 item 5: the sub-2-second queries whose ratio is >2x at
sf0.1 are claimed to be dominated by Spark's fixed per-job overhead, not by
plan defects.  This tool tests that claim by scaling the data 10x.)

Builds a ~sf1 fixture by stacking the sf0.1 tables 10x with per-copy KEY
REMAPPING (every key column is offset by copy_index * (max_key + 1)), so
join fan-outs scale linearly like real data would — naive duplication
would square the join multiplicities and measure a different workload.
Dimension tables (nation, region) keep one copy, like TPC-H scaling does.

Embedding/ANN queries are deliberately excluded: duplicating vectors puts
10 identical copies in every LSH bucket, growing the candidate set
quadratically on BOTH engines — an artifact of cloning, not a scale
measurement.

Usage:
    python tools/scale_sweep.py            # build fixture + run sweep
    python tools/scale_sweep.py --md       # also print the SCALE.md table
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, "/root/repo")

SF_SRC = "/root/testdata/sf0.1"
SF_DST = "/tmp/sfscale/sf1"
COPIES = 10
SWEEP = ["q01_pricing_summary", "q03_star_join_revenue", "q13_topk",
         "q57_tfidf_top_terms", "q59_interval_join"]

# table -> key columns to remap per copy (offset = copy * (max+1))
KEYED = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
}
DIMS = ["nation", "region"]


def build_fixture() -> None:
    dst = Path(SF_DST)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEYED.items():
        src = f"{SF_SRC}/{table}.parquet"
        offs = {
            k: con.execute(
                f"SELECT max({k}) + 1 FROM read_parquet('{src}')"
            ).fetchone()[0]
            for k in keys
        }
        replace = ", ".join(f"{k} + i * {offs[k]} AS {k}" for k in keys)
        con.execute(
            f"""
            COPY (
                SELECT * REPLACE ({replace})
                FROM read_parquet('{src}')
                CROSS JOIN (SELECT unnest(range({COPIES})) AS i)
            ) TO '{dst}/{table}.parquet' (FORMAT parquet)
            """
        )
        print(f"  built {table} x{COPIES}", file=sys.stderr, flush=True)
    for table in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SF_SRC}/{table}.parquet'))"
            f" TO '{dst}/{table}.parquet' (FORMAT parquet)"
        )


def sweep(sf_dir: str, runs: int = 3) -> tuple[dict, dict]:
    from pyspark.sql import functions as F

    from dwca_parquet_spark import queries as Q
    from dwca_parquet_spark.cache import release_caches
    from dwca_parquet_spark.session import get_spark

    spark = get_spark("scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm

    spark_t: dict[str, float] = {}
    for name in SWEEP:
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = Q.QUERIES[name](spark, sf_dir)
            df.agg(F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()
            times.append(time.perf_counter() - t0)
            release_caches()
            spark.catalog.clearCache()
        spark_t[name] = round(statistics.median(times), 3)
        print(f"  spark {name} @ {sf_dir}: {spark_t[name]}s",
              file=sys.stderr, flush=True)
    spark.stop()

    con = duckdb.connect()
    for t in list(KEYED) + DIMS:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists() or sf_dir.startswith("/root"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    duck_t: dict[str, float] = {}
    for name in SWEEP:
        t0 = time.perf_counter()
        con.execute(Q.ORACLES[name]).fetchall()
        duck_t[name] = round(time.perf_counter() - t0, 3)
        print(f"  duckdb {name} @ {sf_dir}: {duck_t[name]}s",
              file=sys.stderr, flush=True)
    return spark_t, duck_t


def main() -> None:
    if not Path(f"{SF_DST}/lineitem.parquet").exists():
        print("building scaled fixture...", file=sys.stderr, flush=True)
        build_fixture()
    out = {}
    for label, sf_dir in [("sf0.1", SF_SRC), ("sf1", SF_DST)]:
        s, d = sweep(sf_dir)
        out[label] = {
            "spark": s,
            "duckdb": d,
            "ratio": {q: round(s[q] / d[q], 2) if d[q] else None for q in SWEEP},
        }
    print(json.dumps(out, indent=2))
    if "--md" in sys.argv:
        print("\n| query | Spark sf0.1 | DuckDB sf0.1 | ratio | "
              "Spark sf1 | DuckDB sf1 | ratio |")
        print("|---|---|---|---|---|---|---|")
        for q in SWEEP:
            a, b = out["sf0.1"], out["sf1"]
            print(f"| {q} | {a['spark'][q]} | {a['duckdb'][q]} | "
                  f"{a['ratio'][q]} | {b['spark'][q]} | {b['duckdb'][q]} | "
                  f"{b['ratio'][q]} |")


if __name__ == "__main__":
    main()
