"""Round-6 harness (VERDICT ask #6): BPE numbers behind the scale claims.

Two measurements:

1. **Encode throughput** — tokens/s/core for bpe_encode (the Arrow-
   batched, per-batch-memoized greedy apply) over a generated corpus
   whose word-repeat distribution resembles web text (Zipf-ish draws
   from a fixed vocabulary), with a learned merge list of realistic
   size. The claim under test: memoization makes the Python loop run
   per DISTINCT word per batch, so throughput is a function of the
   distinct-word rate, not the token rate.

2. **Distributed-fit per-merge cost** — wall seconds per merge round of
   bpe_fit(distributed=True) at a ~100k-distinct-word table (the
   "corpus stage is ONE shuffle; per-round cost is word-table-sized"
   claim). Measured at two word-table sizes so the per-round scaling
   with vocabulary is visible.

Usage: python tools/bpe_throughput.py [--docs 20000] [--merges 20]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _corpus(spark, n_docs: int, vocab_size: int, seed: int = 11):
    rng = np.random.default_rng(seed)
    vocab = np.array(
        [
            "".join(chr(ord("a") + c) for c in rng.integers(0, 26, size=ln))
            for ln in rng.integers(3, 10, size=vocab_size)
        ]
    )
    # Zipf-ish: rank-weighted sampling so words repeat like web text
    w = 1.0 / np.arange(1, vocab_size + 1) ** 1.1
    w /= w.sum()
    rows = []
    for i in range(n_docs):
        n = int(rng.integers(80, 240))
        rows.append((i, " ".join(rng.choice(vocab, size=n, p=w).tolist())))
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20_000)
    ap.add_argument("--merges", type=int, default=20)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dwca_parquet_spark.operators.bpe import bpe_encode, bpe_fit, word_counts
    from dwca_parquet_spark.session import get_spark

    spark = get_spark("bpe-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    # ---- encode throughput ------------------------------------------------
    docs = _corpus(spark, args.docs, vocab_size=30_000).persist()
    n_tokens = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n")
    ).collect()[0]["n"]
    model = bpe_fit(docs, "text", n_merges=500, max_words=30_000)
    enc = bpe_encode(docs, "doc_id", "text", model)
    # warm (codegen + Arrow path), then timed
    enc.agg(F.sum("n_bpe_tokens")).collect()
    t0 = time.perf_counter()
    out_tokens = enc.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    sec = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "bpe_encode_throughput",
                "docs": args.docs,
                "in_tokens": int(n_tokens),
                "out_subwords": int(out_tokens),
                "n_merges": 500,
                "sec": round(sec, 2),
                "tokens_per_sec": round(n_tokens / sec),
                "tokens_per_sec_per_core": round(n_tokens / sec / cores),
                "cores": cores,
            }
        ),
        flush=True,
    )

    # ---- distributed fit per-merge cost -----------------------------------
    for vocab_size in (30_000, 100_000):
        big = _corpus(
            spark, max(args.docs, vocab_size // 2), vocab_size, seed=23
        ).persist()
        n_words = word_counts(big, "text").count()
        t0 = time.perf_counter()
        bpe_fit(big, "text", n_merges=args.merges, distributed=True)
        sec = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": "bpe_distributed_fit",
                    "distinct_words": int(n_words),
                    "n_merges": args.merges,
                    "sec": round(sec, 2),
                    "sec_per_merge": round(sec / args.merges, 3),
                }
            ),
            flush=True,
        )
        big.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
