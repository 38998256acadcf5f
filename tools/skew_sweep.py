"""Skew-join end-to-end proof (VERDICT r3 item 8).

SCALE.md's skew story so far is a plan-shape argument: salted_join
(operators/relational.py) restores parallelism by spreading a hot key over
num_salts reducers, and AQE's OptimizeSkewedJoin does the same at runtime.
This tool MEASURES it: a fact table with one planted hot key carrying 35%
of all rows is joined to a non-broadcastable dim table three ways —

  plain+aqe-skew : stock plan, AQE skew-join splitting ON (the default)
  plain-noskew   : AQE skew splitting OFF — the straggler baseline, one
                   reducer sorts/joins 35% of the fact table alone
  salted-noskew  : salted_join(num_salts=32), AQE skew splitting OFF —
                   proves the manual lever works where AQE isn't available
                   (e.g. a skewed join feeding an aggregation AQE can't
                   split, or engines/configs without AQE)

Broadcast is disabled for all legs (at 100 TB the dim side of a skewed
join does not fit in an executor; broadcasting would dodge the shuffle
this experiment is about).  All three legs must produce checksum-identical
join results; wall-times are medians of N runs.

Usage: python tools/skew_sweep.py [--rows 100000000] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from dwca_parquet_spark.operators.relational import salted_join  # noqa: E402
from dwca_parquet_spark.session import get_spark  # noqa: E402

HOT_FRAC = 0.35
N_KEYS = 100_000
DATA_DIR = "/tmp/skewdata"


def build(spark, n_rows: int) -> None:
    """Deterministic skewed fact + dim parquet (hot key 0 gets 35% of rows)."""
    fact = (
        spark.range(n_rows)
        .select(
            F.when(
                F.pmod(F.xxhash64(F.col("id")), 100) < int(HOT_FRAC * 100),
                F.lit(0),
            )
            .otherwise(F.pmod(F.xxhash64(F.col("id") + 1), N_KEYS))
            .alias("key"),
            (F.col("id") % 997).alias("value"),
        )
    )
    fact.write.mode("overwrite").parquet(f"{DATA_DIR}/fact.parquet")
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("key"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    dim.write.mode("overwrite").parquet(f"{DATA_DIR}/dim.parquet")


def checksum(df: DataFrame) -> tuple:
    cols = [F.col(c) for c in sorted(df.columns)]
    return tuple(
        df.agg(
            F.count(F.lit(1)),
            F.bit_xor(F.xxhash64(*cols)),
            # bit_xor cancels duplicate PAIRS; a summed 32-bit hash doesn't
            # (100M rows * 2^32 stays far under the int64 ANSI limit)
            F.sum(F.crc32(F.concat_ws("|", *cols))),
        ).collect()[0]
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("skew-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    # the 100 TB premise: dim does not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    build(spark, args.rows)
    fact = spark.read.parquet(f"{DATA_DIR}/fact.parquet")
    dim = spark.read.parquet(f"{DATA_DIR}/dim.parquet")
    hot = fact.filter(F.col("key") == 0).count()
    print(f"  rows={args.rows} hot-key share={hot / args.rows:.3f}",
          file=sys.stderr, flush=True)

    def plain() -> DataFrame:
        return fact.join(dim, "key")

    def salted() -> DataFrame:
        return salted_join(fact, dim, "key", num_salts=32)

    legs = {
        "plain+aqe-skew": ("true", plain),
        "plain-noskew": ("false", plain),
        "salted-noskew": ("false", salted),
    }
    # one untimed warmup so whole-stage codegen compilation of the join
    # shape doesn't land in the first leg's first run (observed: +6 s)
    checksum(plain())
    times: dict[str, float] = {}
    sums: dict[str, tuple] = {}
    for name, (skew_flag, make) in legs.items():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_flag)
        ts = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            sums[name] = checksum(make())
            ts.append(round(time.perf_counter() - t0, 2))
        times[name] = round(statistics.median(ts), 2)
        print(f"  {name}: {times[name]}s runs={ts} checksum={sums[name]}",
              file=sys.stderr, flush=True)

    identical = len(set(sums.values())) == 1
    out = {
        "rows": args.rows, "hot_frac": round(hot / args.rows, 4),
        "n_keys": N_KEYS, "runs": args.runs, "times": times,
        "results_identical": identical,
        "salted_speedup_vs_plain_noskew": round(
            times["plain-noskew"] / times["salted-noskew"], 2),
        "aqe_speedup_vs_plain_noskew": round(
            times["plain-noskew"] / times["plain+aqe-skew"], 2),
    }
    print(json.dumps(out))
    spark.stop()
    return 0 if identical else 1


if __name__ == "__main__":
    sys.exit(main())
