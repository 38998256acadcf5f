#!/usr/bin/env python
"""PCA one-pass moment throughput at increasing corpus sizes (op 125).

The claim under test: the fit is ONE pass whose per-row cost is flat in
corpus size (the moment state is d(d+3)/2+1 numbers regardless of n),
so scaling is linear — the property a 100 TB fit needs. Synthetic
deterministic vectors (hash-derived, dim 64) built IN SPARK (nothing
driver-side), n swept 20k → 2M. Also times the Arrow-batched transform
at the top size and cross-checks the fit at the smallest size against
the collected-NumPy reference (same check as test_pca.py, here as a
sweep invariant). Exits non-zero on any check failure.

Results recorded in SCALE.md (round 8).
"""

from __future__ import annotations

import sys
import time

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from dwca_parquet_spark.operators.pca import (  # noqa: E402
    _model_from_moments,
    pca_fit,
    pca_transform,
)
from dwca_parquet_spark.session import get_spark  # noqa: E402

DIM = 64


def vectors(spark, n: int):
    return spark.range(0, n).select(
        F.col("id"),
        F.expr(
            f"transform(sequence(1, {DIM}), "
            "j -> (pmod(xxhash64(id, j), 1000) / 1000.0 - 0.5))"
        ).alias("v"),
    )


def main() -> int:
    spark = get_spark("pca-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n in (20_000, 200_000, 2_000_000):
        df = vectors(spark, n)
        t0 = time.perf_counter()
        model = pca_fit(df, "id", "v", DIM, 8)
        dt = time.perf_counter() - t0
        rows.append((n, dt, n / dt))
        print(f"fit n={n:>9,}: {dt:7.2f} s  ({n / dt:,.0f} rows/s)")
        assert model.n == n
    # linearity: per-row cost at 2M within 3x of per-row cost at 200k
    # (generous — startup amortization makes big runs CHEAPER per row)
    r200k, r2m = rows[1][2], rows[2][2]
    assert r2m > r200k / 3, (r200k, r2m)
    # reference check at the smallest size
    small = vectors(spark, 5_000)
    svecs = np.array(
        [
            list(r["sv"])
            for r in small.select(
                F.expr(
                    "transform(v, x -> cast(round(x * 1000000, 0) as long))"
                ).alias("sv")
            ).collect()
        ],
        dtype=np.int64,
    )
    want = _model_from_moments(
        len(svecs),
        [int(x) for x in svecs.sum(axis=0)],
        [int(x) for x in (svecs.T @ svecs)[np.triu_indices(DIM)]],
        DIM,
        8,
    )
    got = pca_fit(small, "id", "v", DIM, 8)
    assert np.array_equal(got.components, want.components)
    print("reference check: bit-identical at n=5k")
    big = vectors(spark, 2_000_000)
    model = pca_fit(big, "id", "v", DIM, 8)
    t0 = time.perf_counter()
    # numeric full-computation materializer: every projected element
    # feeds the sum (a string-cast hash would time the cast, not the op)
    pca_transform(big, "id", "v", model).agg(
        F.sum(F.aggregate("pca", F.lit(0.0), lambda a, x: a + x))
    ).collect()
    dt = time.perf_counter() - t0
    print(f"transform n=2,000,000: {dt:7.2f} s  ({2_000_000 / dt:,.0f} rows/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
