#!/usr/bin/env python
"""Streaming-tier throughput sweep (VERDICT r11 #5).

The streaming states (ops 89/104/107/118/135/137/143/146/155/160/163/164)
carry fold-law correctness gates (fold(batches) ≡ one-shot) but, before
round 12, no recorded throughput. This sweep measures, for four
representative stored states, the per-micro-batch fold cost as history
accumulates, plus the state's size trajectory:

- **activity** (op 143, ``apply_activity_batch``): per-(key, hour-bucket)
  count/sum panel. Fold = state ∪ batch-partial → groupBy; per-batch cost
  is O(batch + |state|) with |state| bounded by panel cardinality
  (keys × buckets), NOT by event history — the sweep's state-rows column
  is the evidence that the panel saturates while events keep flowing.
- **paragraph hashes** (ops 104/107, ``dedup_paragraphs_incremental`` +
  ``paragraph_state`` append): probe = anti-join on the 16-byte hash
  pair; state grows with DISTINCT paragraphs ever seen. Per-batch cost is
  O(batch + state-probe); the sweep shows the fold staying near-flat
  while state rows grow ~linearly (the probe is an equi-join the planner
  shuffles by hash — at 100 TB the stored state is bucketed on ``_k`` so
  the probe co-locates, sinks/parquet.py:102).
- **reservoir** (ops 162/163, ``apply_reservoir_batch``): bounded state
  (≤ n rows) — fold cost must be flat and state size constant.
- **drift** (ops 133/135, ``apply_drift_batch``): four bounded panels
  (mixture, log2 length histogram, dup-rate, KMV sketch) — fold cost
  near-flat, state bounded by panel cardinality.

Inputs derive from the driver fixtures (documents/events at
$SPARK_GRAFT_SF_DIR, default sf0.1), replicated with per-batch markers so
batch content is fresh-but-realistic; a 20% unmarked slice keeps the
dedup drop path exercised.

Run: python tools/streaming_sweep.py [--md] [--batches N]
Each row: batch rows in, fold seconds, krows/s, state rows, state MB.
A canary (bench.canary_sec) brackets the run — numbers from a
contaminated window are flagged.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _du(path: str) -> float:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total / 1e6


def _fmt_row(name, b, rows_in, sec, state_rows, state_mb):
    krs = rows_in / sec / 1e3 if sec > 0 else float("inf")
    return (
        f"| {name} | {b} | {rows_in:,} | {sec:.2f} | {krs:,.0f} | "
        f"{state_rows:,} | {state_mb:.1f} |"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--md", action="store_true")
    ap.add_argument("--batches", type=int, default=8)
    args = ap.parse_args()

    from bench import canary_sec
    from dwca_parquet_spark.operators.dedup import (
        dedup_paragraphs_incremental,
        paragraph_state,
    )
    from dwca_parquet_spark.session import get_spark
    from dwca_parquet_spark.streaming.activity import (
        apply_activity_batch,
        read_activity_state,
    )
    from dwca_parquet_spark.streaming.drift import (
        apply_drift_batch,
        read_drift_state,
    )
    from dwca_parquet_spark.streaming.reservoir import (
        apply_reservoir_batch,
        read_reservoir_state,
    )

    pre = canary_sec()
    spark = get_spark("streaming-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    tmp = tempfile.mkdtemp(prefix="stream_sweep_")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    rows = []
    B = args.batches

    # ---- activity: synthetic event batches, 200k rows each, 20k keys ----
    act_path = f"{tmp}/activity"
    for b in range(1, B + 1):
        batch = spark.range(200_000).select(
            F.pmod(F.col("id") * 2654435761, F.lit(20_000)).alias("user_id"),
            # epoch-NANOS bigint (the events-fixture convention ts_micros
            # expects) marching forward one hour-bucket per batch
            (
                F.lit(b * 3_600_000_000_000) + F.col("id")
            ).alias("ts"),
            (F.col("id") % 1000).cast("double").alias("value"),
        )
        t0 = time.perf_counter()
        assert apply_activity_batch(
            spark, act_path, batch, b, ts_col="ts", key_col="user_id",
            value_col="value",
        )
        sec = time.perf_counter() - t0
        _, state = read_activity_state(spark, act_path)
        rows.append(
            ("activity", b, 200_000, sec, state.count(), _du(act_path))
        )
        print(rows[-1], file=sys.stderr, flush=True)

    # ---- paragraph hashes: fixture docs, per-batch marker, 20% dups ----
    par_state_path = f"{tmp}/par_state"

    def doc_batch(b: int):
        return docs.select(
            F.concat(F.lit(f"b{b}:"), F.col("doc_id")).alias("doc_id"),
            F.when(
                F.pmod(F.xxhash64("doc_id"), F.lit(5)) == 0, F.col("text")
            )
            .otherwise(F.concat(F.lit(f"[batch {b}] "), F.col("text")))
            .alias("text"),
        )

    paragraph_state(doc_batch(0), "doc_id", "text").write.mode(
        "overwrite"
    ).parquet(par_state_path)
    for b in range(1, B + 1):
        batch = doc_batch(b)
        state = spark.read.parquet(par_state_path)
        t0 = time.perf_counter()
        clean = dedup_paragraphs_incremental(batch, state, "doc_id", "text")
        n_out = clean.count()
        paragraph_state(batch, "doc_id", "text").join(
            state, ["_k", "_k2"], "left_anti"
        ).write.mode("append").parquet(par_state_path)
        sec = time.perf_counter() - t0
        srows = spark.read.parquet(par_state_path).count()
        rows.append(
            ("paragraph", b, n_docs, sec, srows, _du(par_state_path))
        )
        print(rows[-1], "kept", n_out, file=sys.stderr, flush=True)

    # ---- reservoir: bounded state, n = 10k over 500k-row batches ----
    res_path = f"{tmp}/reservoir"
    for b in range(1, B + 1):
        batch = spark.range(500_000).select(
            F.concat(F.lit(f"b{b}:"), F.col("id").cast("string")).alias(
                "key"
            ),
            (1.0 + (F.col("id") % 100).cast("double")).alias("w"),
        )
        t0 = time.perf_counter()
        assert apply_reservoir_batch(
            spark, res_path, batch, b, key_col="key", weight_col="w",
            n=10_000, salt="sweep",
        )
        sec = time.perf_counter() - t0
        _, state = read_reservoir_state(spark, res_path)
        rows.append(
            ("reservoir", b, 500_000, sec, state.count(), _du(res_path))
        )
        print(rows[-1], file=sys.stderr, flush=True)

    # ---- drift: fixture docs with per-batch marker ----
    drift_path = f"{tmp}/drift"
    for b in range(1, B + 1):
        batch = doc_batch(b).withColumn(
            "source", F.lit(f"crawl{b % 3}")
        )
        t0 = time.perf_counter()
        assert apply_drift_batch(
            spark, drift_path, batch, b, id_col="doc_id", text_col="text",
            source_col="source",
        )
        sec = time.perf_counter() - t0
        _wm, st = read_drift_state(spark, drift_path)
        srows = sum(f.count() for f in st.values()) if st else 0
        rows.append(("drift", b, n_docs, sec, srows, _du(drift_path)))
        print(rows[-1], file=sys.stderr, flush=True)

    post = canary_sec()
    hdr = (
        "| state | batch | rows in | fold s | krows/s | state rows | "
        "state MB |"
    )
    sep = "|---|---|---|---|---|---|---|"
    lines = [hdr, sep] + [_fmt_row(*r) for r in rows]
    lines.append(
        f"\ncanary pre {pre} post {post} (healthy ~0.32-0.45 s alloc / "
        "~0.32-0.39 s cpu; see bench.canary_sec)"
    )
    print("\n".join(lines))
    spark.stop()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
