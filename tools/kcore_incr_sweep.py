#!/usr/bin/env python
"""Planted-cascade append sweep for incremental k-core (op 161, VERDICT
r10 #3): at growing base-graph sizes, measure kcore_state_append (the
incremental leg) against the full op-158 re-peel of the union — the
cost a consumer paid before op 161.

Graph construction (all in Spark, nothing driver-side): N = m/5 nodes,
m random edges from hashed index pairs (avg degree 10 → a large 3-core,
peeling depth ~a few rounds). Two batch shapes per m:
  * cascade: a cycle of C brand-new nodes, each also stubbed to one
    hashed background node — every batch node needs the WHOLE cycle to
    qualify at k=3, so the candidate region is the full C-node chain
    (region ∝ batch, the bounded-repair shape the op promises);
  * tiny: a 4-clique of new nodes (the floor — a near-empty region).
The sequential-cascade worst case (a pre-planted chain that peels one
node per round) is pinned for CORRECTNESS in
tests/test_kcore_incremental.py::test_cycle_closing_cascade; it is not
a fair THROUGHPUT fixture because round-synchronous peeling pays the
chain depth in rounds for ANY engine, drowning the m-dependence this
sweep isolates.

Usage: python tools/kcore_incr_sweep.py [m ...]   (default 4e5 2e6 8e6)
"""
from __future__ import annotations

import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from dwca_parquet_spark.cache import release_caches
from dwca_parquet_spark.operators.graph import (
    kcore,
    kcore_state_append,
    kcore_state_build,
    kcore_state_report,
)
from dwca_parquet_spark.session import get_spark

K = 3
CASCADE = 400  # cycle length of the cascade batch


def base_edges(spark, m: int, n_nodes: int, seed: int):
    return spark.range(m).select(
        (F.abs(F.xxhash64(F.col("id"), F.lit(seed))) % n_nodes).alias("u"),
        (F.abs(F.xxhash64(F.col("id"), F.lit(seed + 1))) % n_nodes).alias(
            "v"
        ),
    )


def cascade_batch(spark, n_nodes: int):
    """Cycle c_0-...-c_{C-1}-c_0 over NEW nodes + one background stub
    each: intact degree 3 everywhere, so the whole cycle enters the
    3-core together — and its qualification is decided by the peel over
    the full C-node region."""
    ids = spark.range(CASCADE)
    cyc = ids.select(
        (F.lit(n_nodes) + F.col("id")).alias("u"),
        (F.lit(n_nodes) + (F.col("id") + 1) % CASCADE).alias("v"),
    )
    stubs = ids.select(
        (F.lit(n_nodes) + F.col("id")).alias("u"),
        (F.abs(F.xxhash64(F.col("id"), F.lit(23))) % n_nodes).alias("v"),
    )
    return cyc.unionAll(stubs)


def tiny_batch(spark, n_nodes: int):
    far = n_nodes + CASCADE + 10
    nodes = [far, far + 1, far + 2, far + 3]
    pairs = [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]]
    return spark.createDataFrame(pairs, "u long, v long")


def main() -> None:
    ms = [int(float(a)) for a in sys.argv[1:]] or [
        400_000,
        2_000_000,
        8_000_000,
    ]
    spark = get_spark("kcore-incr-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    for m in ms:
        n_nodes = m // 5
        a = base_edges(spark, m, n_nodes, seed=11)
        path = f"/tmp/kcore_sweep_{m}"
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.perf_counter()
        built = kcore_state_build(a, path, K)
        t_build = time.perf_counter() - t0
        b1 = cascade_batch(spark, n_nodes)
        t0 = time.perf_counter()
        out1 = kcore_state_append(spark, path, b1, 1)
        t_casc = time.perf_counter() - t0
        b2 = tiny_batch(spark, n_nodes)
        t0 = time.perf_counter()
        out2 = kcore_state_append(spark, path, b2, 2)
        t_tiny = time.perf_counter() - t0
        t0 = time.perf_counter()
        full = kcore(a.unionAll(b1).unionAll(b2), K).count()
        t_full = time.perf_counter() - t0
        stored = kcore_state_report(spark, path).count()
        print(
            f"m={m:>9,}  build={t_build:6.1f}s  "
            f"append_cascade={t_casc:6.1f}s  append_tiny={t_tiny:6.1f}s  "
            f"full_repeel={t_full:6.1f}s  "
            f"speedup={t_full / t_casc:5.2f}x  "
            f"core_edges={out2['n_core_edges']:,}  "
            f"cascade_added={out1['n_core_edges'] - built['n_core_edges']:,}  "
            f"match={stored == full == out2['n_core_edges']}",
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)
        release_caches()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
