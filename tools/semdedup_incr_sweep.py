#!/usr/bin/env python
"""Measure op 118: incremental semantic dedup probe vs one-shot
re-cluster, on the generated embeddings fixture.

Scenario: a corpus of N vectors holds history; a batch of N·frac new
vectors arrives. Compare:
  (a) one-shot `semantic_dedup` over history ∪ batch — what a
      state-less pipeline must do per batch (re-fit, re-assign, re-pair
      EVERYTHING);
  (b) `semdedup_state` ONCE (amortized across batches; timed
      separately) + `semantic_dedup_incremental` per batch.

The honest comparison for a continuously-ingested corpus is (a) vs the
probe alone: the state build is paid once per re-fit policy window, the
probe per batch. Prints one JSON line.

Usage: python tools/semdedup_incr_sweep.py [--sf-dir DIR] [--mult M]
  --mult M replicates the embeddings table M× (key-remapped) to scale
  the corpus beyond the fixture.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=1)
    ap.add_argument("--frac", type=int, default=10, help="batch = 1/frac")
    ap.add_argument("--k-cells", type=int, default=64)
    ap.add_argument("--threshold", type=float, default=0.95)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dwca_parquet_spark.operators.semdedup import (
        semantic_dedup,
        semantic_dedup_incremental,
        semdedup_state,
    )
    from dwca_parquet_spark.session import get_spark

    spark = get_spark("semdedup-incr-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    n_base = emb.count()
    if args.mult > 1:
        parts = [
            emb.select(
                (F.col("vec_id") + F.lit(i * n_base)).alias("vec_id"),
                "embedding",
            )
            for i in range(args.mult)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        emb = u
    emb = emb.select("vec_id", "embedding").persist()
    n = emb.count()

    is_batch = F.pmod(F.xxhash64("vec_id"), F.lit(args.frac)) == 0
    hist = emb.filter(~is_batch).persist()
    batch = emb.filter(is_batch).persist()
    nh, nb = hist.count(), batch.count()

    # (a) one-shot over history ∪ batch (the state-less per-batch cost)
    t0 = time.perf_counter()
    semantic_dedup(
        emb, "vec_id", "embedding", k_cells=args.k_cells,
        threshold=args.threshold,
    ).count()
    oneshot_sec = time.perf_counter() - t0

    # (b) state build (once per re-fit window) …
    t0 = time.perf_counter()
    cents, assigned = semdedup_state(
        hist, "vec_id", "embedding", k_cells=args.k_cells
    )
    assigned = assigned.persist()
    assigned.count()
    build_sec = time.perf_counter() - t0

    # … then the per-batch probe
    t0 = time.perf_counter()
    pairs, _ = semantic_dedup_incremental(
        batch, cents, assigned, "vec_id", "embedding", args.threshold
    )
    n_pairs = pairs.count()
    probe_sec = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "semdedup_incremental_sweep",
                "corpus": n,
                "history": nh,
                "batch": nb,
                "k_cells": args.k_cells,
                "oneshot_sec": round(oneshot_sec, 2),
                "state_build_sec": round(build_sec, 2),
                "probe_sec": round(probe_sec, 2),
                "probe_speedup_vs_oneshot": round(
                    oneshot_sec / max(probe_sec, 1e-9), 2
                ),
                "batch_pairs": n_pairs,
            }
        ),
        flush=True,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
