#!/usr/bin/env python
"""Measured evidence for the Bloom incremental-dedup claim (SCALE.md).

Claim: deduplicating a fixed-size batch against a growing history costs
O(|history|) per batch with a plain anti-join (history shuffles every
time), but stays ~flat with the Bloom path (build once; per batch the
probe streams with zero shuffle and the verify only ever STREAMS history
against a broadcast candidate set).

Method: synthetic history of N short documents (N swept), batch of
B = 500k docs (20% true dups of history, 80% new). Both paths run under
autoBroadcastJoinThreshold = 4 MB so the BATCH is never broadcastable —
at 100 TB a batch is GBs; letting a toy batch broadcast would fake away
exactly the shuffle being measured. The candidate sets the Bloom verify
broadcasts stay well under the threshold (that asymmetry IS the design).
The history CONTENT-KEY table (hash per stored doc) is precomputed and
STORED AS PARQUET for BOTH paths — it is incremental state any
production dedup keeps (re-hashing 100 TB of text per batch is not a
strategy either path would use); per batch, each path reads that stored
state as a cluster would. Reported per history size: plain anti-join
wall time, Bloom per-batch wall time (probe + verify), one-time bitmap
build time, an output-equality check between the two paths, and the
STRUCTURAL evidence — shuffle-Exchange counts in each path's physical
plan (wall time on local[32] undersells the Bloom side: an in-memory
"shuffle" costs microseconds here but is the network-bound term on a
real cluster, while the bitmap broadcast the Bloom path pays is
priced realistically in both settings).

Run: python tools/bloom_sweep.py [--md] [--runs N] [--sizes a,b,...]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dwca_parquet_spark.functions import hashing as H
from dwca_parquet_spark.operators.bloom import (
    bloom_build,
    bloom_params,
    dedup_incremental,
)
from dwca_parquet_spark.session import get_spark

BATCH = 500_000
HISTORY_SIZES = [1_000_000, 2_000_000, 5_000_000, 10_000_000]
RUNS = 5  # default; --runs overrides (use fewer at the 10^8 decade)


def synth_docs(spark, n, offset=0, tag="h"):
    return spark.range(n).select(
        (F.col("id") + offset).alias("doc_id"),
        F.concat(
            F.lit(f"{tag} document body number "),
            F.col("id") + offset,
            F.lit(" with some shared filler words for realism"),
        ).alias("text"),
    )


def keyed(df):
    return df.select(
        "doc_id", H.normalize_text(F.col("text")).alias("_n")
    ).select("doc_id", H.poly_hash(F.col("_n")).alias("_chash"))


def bench(fn, runs=RUNS):
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--md", action="store_true")
    ap.add_argument("--runs", type=int, default=RUNS)
    ap.add_argument(
        "--sizes", default=",".join(str(s) for s in HISTORY_SIZES),
        help="comma-separated history sizes (e.g. 100000000 for the"
        " 10^8 decade, where the bitmap broadcast is ~120 MB and the"
        " sharded-filter regime note in operators/bloom.py applies)",
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",") if s]

    spark = get_spark("bloom-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(4 << 20))

    rows = []
    for n in sizes:
        history = synth_docs(spark, n, tag="h")
        # batch: 20% dups (ids inside history), 80% new (disjoint tag)
        dups = synth_docs(spark, BATCH // 5, tag="h").select(
            (F.col("doc_id") + 50_000_000).alias("doc_id"), "text"
        )
        fresh = synth_docs(spark, BATCH - BATCH // 5, offset=60_000_000, tag="b")
        batch = fresh.unionByName(dups)

        import tempfile

        keydir = tempfile.mkdtemp(prefix="bloomsweep") + "/hist_keys"
        keyed(history).select("_chash").write.mode("overwrite").parquet(keydir)
        hist_keys = spark.read.parquet(keydir)  # the stored state
        anti_df = keyed(batch).join(hist_keys.distinct(), "_chash", "left_anti")
        anti_exchanges = (
            anti_df._jdf.queryExecution().executedPlan().toString()
        ).count("Exchange hashpartitioning")
        t_anti = bench(
            lambda: keyed(batch)
            .join(hist_keys.distinct(), "_chash", "left_anti")
            .count(),
            args.runs,
        )

        m, k = bloom_params(n, 0.01)
        bmdir = keydir + ".bitmap"
        t0 = time.perf_counter()
        bloom_build(hist_keys, "_chash", m, k).write.mode(
            "overwrite"
        ).parquet(bmdir)
        t_build = round(time.perf_counter() - t0, 3)
        bitmap = spark.read.parquet(bmdir)  # steady state: stored filter

        # per-batch incremental cost with the PREBUILT bitmap: probe +
        # two broadcast verify joins (this is what every batch pays)
        from dwca_parquet_spark.operators.bloom import bloom_probe

        def incremental():
            probed = bloom_probe(keyed(batch), "_chash", bitmap, m, k).persist()
            probed.count()
            definite = probed.filter(~F.col("might_contain"))
            cands = probed.filter(F.col("might_contain"))
            hits = hist_keys.join(
                F.broadcast(cands.select("_chash").distinct()),
                "_chash",
                "left_semi",
            ).distinct()
            verified = cands.join(F.broadcast(hits), "_chash", "left_anti")
            n_out = definite.select("doc_id").unionByName(
                verified.select("doc_id")
            ).count()
            probed.unpersist()
            return n_out

        t_bloom = bench(incremental, args.runs)
        probe_plan = (
            bloom_probe(keyed(batch), "_chash", bitmap, m, k)
            ._jdf.queryExecution().executedPlan().toString()
        )
        probe_exchanges = probe_plan.count("Exchange hashpartitioning")

        # exactness cross-check via the packaged operator
        got = (
            dedup_incremental(batch, history, "doc_id", "text", expected_items=n)
            .count()
        )
        want = (
            keyed(batch)
            .join(hist_keys.distinct(), "_chash", "left_anti")
            .count()
        )
        rows.append(
            (n, t_anti, t_build, t_bloom, got == want, anti_exchanges,
             probe_exchanges)
        )
        print(
            f"history={n}: anti_join={t_anti}s bloom_build={t_build}s "
            f"bloom_batch={t_bloom}s equal={got == want} "
            f"anti_shuffles={anti_exchanges} probe_shuffles={probe_exchanges}",
            file=sys.stderr,
            flush=True,
        )

    if args.md:
        print("| history rows | anti-join / batch | bloom build (once) | bloom / batch | outputs equal | anti shuffles | probe shuffles |")
        print("|---|---|---|---|---|---|---|")
        for n, ta, tb, tp, eq, ax, px in rows:
            print(f"| {n:,} | {ta} s | {tb} s | {tp} s | {eq} | {ax} | {px} |")


if __name__ == "__main__":
    main()
