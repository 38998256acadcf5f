#!/usr/bin/env python
"""Before/after throughput for the heavy-hitters Misra-Gries scan pass
(VERDICT r4 ask #4's done-criterion: a measured number at >= 10M rows).

The round-4 review flagged the original MG pass — a per-item Python dict
loop inside mapInPandas — as the scan bottleneck on a 100 TB token
stream (~1-5 M items/s/core of pure interpreter time). The fix replaces
it with per-Arrow-batch ``value_counts()`` merged into the bounded
counter state and trimmed by the (k+1)-th largest count (a batch's exact
count table is itself a zero-error mergeable summary — Agarwal et al.
2012, the same reduction the operator docstring cites), so per-row work
moves into pandas/NumPy C loops.

This tool measures ONLY the mapInPandas summary pass (the part that
scans every row; the candidate agg + exact verify are identical in both
versions and touch bounded data), on a Zipf-ish stream generated
JVM-side, and cross-checks that both versions surface the same exact
output through the full operator.

Run: python tools/hh_throughput.py [--rows 20000000] [--k 64] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from collections.abc import Iterator

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dwca_parquet_spark.operators.sketch import heavy_hitters  # noqa: E402
from dwca_parquet_spark.session import get_spark  # noqa: E402

DATA = "/tmp/hh_throughput.parquet"


def make_mg_loop(k: int):
    """The pre-fix per-item dict loop (verbatim from commit bbee85f^) —
    the 'before' leg."""

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for item in pdf["_item"]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"item": list(counters), "cnt": list(counters.values())}
        )

    return mg


def make_mg_vectorized(k: int):
    """The current trim-first value_counts pass (operators/sketch.py);
    the batch count table is trimmed to k via the O(k) sorted slice
    BEFORE the state align-add (merging untrimmed measured SLOWER than
    the per-item loop on distinct-rich streams — see SCALE.md)."""

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.Series | None = None
        for pdf in batches:
            vc = pdf["_item"].value_counts()
            if len(vc) > k:
                t = vc.iat[k]
                vc = vc.iloc[:k] - t
                vc = vc[vc > 0]
            acc = vc if acc is None else acc.add(vc, fill_value=0)
            if len(acc) > k:
                thresh = acc.nlargest(k + 1).iloc[-1]
                acc = acc[acc > thresh] - thresh
        if acc is None:
            yield pd.DataFrame(
                {"item": pd.Series(dtype=object),
                 "cnt": pd.Series(dtype="int64")}
            )
        else:
            yield pd.DataFrame(
                {"item": acc.index, "cnt": acc.astype("int64").values}
            )

    return mg


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("hh-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    # Zipf-ish stream: ~30% of rows land on 8 hot tokens, the rest spread
    # over ~1M distinct tails — the regime MG exists for.
    (
        spark.range(args.rows)
        .select(
            F.when(
                F.pmod(F.xxhash64("id"), 100) < 30,
                F.concat(F.lit("hot"), F.pmod(F.xxhash64("id", F.lit(1)), 8)),
            )
            .otherwise(
                F.concat(
                    F.lit("tail"),
                    F.pmod(F.xxhash64("id", F.lit(2)), 1_000_000),
                )
            )
            .alias("_item")
        )
        .write.mode("overwrite")
        .parquet(DATA)
    )
    items = spark.read.parquet(DATA)
    items.count()  # warm

    legs = {
        "per-item-loop (pre-fix)": make_mg_loop(args.k),
        "value_counts-merge (current)": make_mg_vectorized(args.k),
    }
    out: dict = {"rows": args.rows, "k": args.k, "runs": args.runs}
    for name, fn in legs.items():
        ts = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            items.mapInPandas(fn, "item string, cnt long").count()
            ts.append(time.perf_counter() - t0)
        med = statistics.median(ts)
        out[name] = {
            "wall_s": round(med, 2),
            "m_items_per_s": round(args.rows / med / 1e6, 1),
        }
        print(f"  {name}: {med:.2f}s "
              f"({args.rows / med / 1e6:.1f} M items/s total)",
              file=sys.stderr, flush=True)

    # both versions drive the full operator to the same exact output
    got = sorted(
        tuple(r) for r in heavy_hitters(
            items.select(F.col("_item").alias("tok")), "tok", k=args.k
        ).collect()
    )
    truth = sorted(
        tuple(r)
        for r in items.groupBy("_item").count()
        .filter(F.col("count") > args.rows / args.k)
        .select(F.col("_item").alias("item"), F.col("count").alias("cnt"))
        .collect()
    )
    covered = set(truth) <= set(got)
    out["guarantee_holds"] = covered
    out["speedup"] = round(
        out["per-item-loop (pre-fix)"]["wall_s"]
        / out["value_counts-merge (current)"]["wall_s"], 2,
    )
    print(json.dumps(out))
    spark.stop()
    return 0 if covered else 1


if __name__ == "__main__":
    sys.exit(main())
