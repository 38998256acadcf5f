#!/usr/bin/env python
"""Planted-hub append sweep for the incremental triangle census (op 154,
VERDICT r9 ask #4): at growing base-graph sizes with a fixed-size batch,
measure triangle_state_append (the incremental leg) against the full
op-142 recount of the union — the cost a consumer paid before op 154.
The planted 50k-degree hub keeps the sweep on the power-law shape a
co-occurrence graph actually has.

Graph construction (all in Spark, nothing driver-side): N = m/5 nodes,
m random edges from hashed index pairs, plus a hub (node 0) wired to its
first H neighbors. Batch = 1% of m random edges over the same node space
(seeded differently), appended as batch 1.

Usage: python tools/triangle_incr_sweep.py [m ...]   (default 4e5 2e6 8e6)
"""
from __future__ import annotations

import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from dwca_parquet_spark.operators.graph import (
    _canon_edges,
    triangle_count,
    triangle_state_append,
    triangle_state_build,
)
from dwca_parquet_spark.session import get_spark

HUB = 50_000


def edges_df(spark, m: int, n_nodes: int, seed: int):
    base = spark.range(m).select(
        (F.abs(F.xxhash64(F.col("id"), F.lit(seed))) % n_nodes).alias("u"),
        (F.abs(F.xxhash64(F.col("id"), F.lit(seed + 1))) % n_nodes).alias(
            "v"
        ),
    )
    hub = spark.range(1, HUB + 1).select(
        F.lit(0).cast("long").alias("u"), F.col("id").alias("v")
    )
    return base.unionAll(hub)


def main() -> None:
    ms = [int(float(a)) for a in sys.argv[1:]] or [400_000, 2_000_000, 8_000_000]
    spark = get_spark("triangle-incr-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    for m in ms:
        n_nodes = max(m // 5, HUB * 2)
        a = edges_df(spark, m, n_nodes, seed=11)
        b = edges_df(spark, m // 100, n_nodes, seed=97).filter(
            F.col("u") != 0
        )
        path = f"/tmp/tri_sweep_{m}"
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.perf_counter()
        triangle_state_build(a, path)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = triangle_state_append(spark, path, b, 1)
        t_app = time.perf_counter() - t0
        t0 = time.perf_counter()
        # canonicalize first: triangle_count's contract is (u < v) pairs
        full = triangle_count(_canon_edges(a.unionAll(b))).first()
        t_full = time.perf_counter() - t0
        match = (
            out["n_edges"] == full["n_edges"]
            and out["n_wedges"] == full["n_wedges"]
            and out["n_triangles"] == full["n_triangles"]
        )
        print(
            f"m={m:>9,}  batch={m // 100:>7,}  build={t_build:6.1f}s  "
            f"append={t_app:6.1f}s  full_recount={t_full:6.1f}s  "
            f"speedup={t_full / t_app:5.2f}x  tri={out['n_triangles']:,}  "
            f"match={match}",
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
