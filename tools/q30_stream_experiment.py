"""Round-6 experiment (VERDICT ask #4): attack the q30 sf1 verify-join
serialization volume.

The sf1 sweep (SCALE.md) identified q30's residual as shuffle
serialization of the ~10^9-row shared-shingle stream (a, b, h) — three
longs per row through the (b, h)-keyed exchange. Levers measured here,
each against the unmodified operator on the SAME generated fixture:

  base    — current pair_jaccard (stream rows: a, b, h = 3 long fields)
  int32   — cast the shingle hash to int (VERDICT's 32-bit lever).
            Expectation to TEST, not assume: UnsafeRow gives fixed-width
            fields 8-byte slots, so the serialized row should NOT
            shrink; only shuffle compression could differ.
  packed  — pack (b, h) into ONE long: h < HASH_MOD < 2^30, so
            pbh = (b << 30) | h is injective while b < 2^33. Stream
            rows become (a, pbh) = 2 fields; the exchange key is one
            long instead of two. Exact semantics (injective packing),
            recover b = pbh >> 30 for the final (a, b) aggregate.

Usage: python tools/q30_stream_experiment.py [sf0.3|sf1] [--runs N]
Prints one JSON line per variant: {"variant", "sec", "rows", "checksum"}.
Checksums must be identical across variants (asserted).
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scale_sweep_dedup import build_fixture  # noqa: E402


def pair_jaccard_variant(mode: str):
    """Build a pair_jaccard twin with the stream encoding under test.
    Mirrors operators/dedup.pair_jaccard exactly except for the marked
    stream/join-key lines."""

    def pj(cand, sh, id_col, a="id_a", b="id_b", threshold=None):
        ex = sh.select(
            F.col(id_col).alias("_jid"), F.explode("hashes").alias("_jh")
        )
        if mode == "int32":
            ex = ex.select("_jid", F.col("_jh").cast("int").alias("_jh"))
        sizes = sh.select(
            F.col(id_col).alias("_jid"), F.size("hashes").alias("_jn")
        )
        na = sizes.select(F.col("_jid").alias(a), F.col("_jn").alias("_jna"))
        nb = sizes.select(F.col("_jid").alias(b), F.col("_jn").alias("_jnb"))
        cand = cand.join(na, a).join(nb, b)
        if threshold is not None:
            cand = cand.filter(
                F.least(F.col("_jna"), F.col("_jnb")).cast("double")
                / F.greatest(F.col("_jna"), F.col("_jnb")).cast("double")
                >= F.lit(float(threshold) - 1e-6)
            )
        if mode == "packed":
            # (b, h) -> one long; b bounded (asserted by caller's data)
            ex_a = ex.select(F.col("_jid").alias(a), F.col("_jh"))
            ex_pb = ex.select(
                (F.shiftleft(F.col("_jid"), 30) + F.col("_jh")).alias("_pbh")
            )
            inter = (
                cand.select(a, b)
                .join(ex_a, a)
                .select(
                    F.col(a),
                    (F.shiftleft(F.col(b), 30) + F.col("_jh")).alias("_pbh"),
                )
                .join(ex_pb, "_pbh")
                .groupBy(
                    F.col(a), F.shiftright(F.col("_pbh"), 30).alias(b)
                )
                .agg(F.count(F.lit(1)).alias("_ji"))
            )
        else:
            ex_a = ex.select(F.col("_jid").alias(a), F.col("_jh"))
            ex_b = ex.select(F.col("_jid").alias(b), F.col("_jh"))
            inter = (
                cand.select(a, b)
                .join(ex_a, a)
                .join(ex_b, [b, "_jh"])
                .groupBy(a, b)
                .agg(F.count(F.lit(1)).alias("_ji"))
            )
        return (
            cand.join(inter, [a, b], "left")
            .withColumn("_ji", F.coalesce(F.col("_ji"), F.lit(0)))
            .withColumn(
                "jaccard",
                F.col("_ji").cast("double")
                / (
                    F.col("_jna").cast("double")
                    + F.col("_jnb").cast("double")
                    - F.col("_ji").cast("double")
                ),
            )
            .drop("_ji", "_jna", "_jnb")
        )

    return pj


def checksum(df: DataFrame) -> tuple:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("x"),
    ).collect()[0]
    return int(row["n"]), int(row["x"])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("scale", nargs="?", default="sf0.3")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--variants", default="base,int32,packed")
    args = ap.parse_args()

    sf_dir = str(build_fixture(args.scale))

    from dwca_parquet_spark import queries as Q
    from dwca_parquet_spark.cache import release_caches
    from dwca_parquet_spark.operators import dedup as D
    from dwca_parquet_spark.session import get_spark

    spark = get_spark(f"q30-stream-{args.scale}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    original = D.pair_jaccard
    sums = {}
    for mode in args.variants.split(","):
        D.pair_jaccard = (
            original if mode == "base" else pair_jaccard_variant(mode)
        )
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            sums[mode] = checksum(
                Q.QUERIES["q30_minhash_lsh_pairs"](spark, sf_dir)
            )
            times.append(time.perf_counter() - t0)
            release_caches()
            spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "variant": mode,
                    "scale": args.scale,
                    "sec": round(statistics.median(times), 2),
                    "rows": sums[mode][0],
                    "checksum": sums[mode][1],
                }
            ),
            flush=True,
        )
    D.pair_jaccard = original
    assert len({v for v in sums.values()}) == 1, f"variants disagree: {sums}"
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
