"""Differential correctness gate, mirroring the driver's t2 protocol:

for every (queries()[name], oracle_sql()[name]) pair, run both at sf0.01,
compare row count, column-name set, and an order-insensitive canonical value
hash (columns sorted by name, rows sorted by stringified tuple, doubles
rendered at fixed precision).
"""

from __future__ import annotations

import hashlib
import math

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_T2


def _canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}" if v == v and abs(v) < 1e15 else repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_canon_value(r[i]) for i in order) for r in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    qfn = QUERIES[name]
    sdf = qfn(spark, SF_T2)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    # dedup/similarity operators persist() intermediates per call; drop them
    # so the 60+-query session doesn't accumulate dead cached tables.
    spark.catalog.clearCache()

    if name not in ORACLES:
        # rows-only contract (non-SQL-expressible op): schema stable, runs.
        assert len(srows) >= 0
        return

    orel = duck.sql(ORACLES[name])
    ocols = list(orel.columns)
    orows = orel.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), (
        f"{name}: row count {len(srows)} (spark) != {len(orows)} (duckdb)"
    )
    shash = _canon_rows(scols, srows)
    ohash = _canon_rows(ocols, orows)
    if shash != ohash:
        # surface a small diff for debugging
        sset = {
            "|".join(
                _canon_value(r[i])
                for i in sorted(range(len(scols)), key=lambda i: scols[i])
            )
            for r in srows
        }
        oset = {
            "|".join(
                _canon_value(r[i])
                for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
            )
            for r in orows
        }
        only_s = list(sset - oset)[:5]
        only_o = list(oset - sset)[:5]
        pytest.fail(
            f"{name}: value hash mismatch\n spark-only: {only_s}\n duck-only: {only_o}"
        )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_approx_percentiles_tolerance_sf01(spark):
    """Tolerance-gated (not hash-gated) differential for the approximate-
    percentile leg beside q50's exact one: percentile_approx with
    accuracy=10000 vs DuckDB's exact quantile_cont at sf0.1.

    percentile_approx guarantees RANK error <= 1/accuracy and returns an
    actual data value (no interpolation), so equality is the wrong gate;
    instead assert relative value error per (group, quantile). Max observed
    error at sf0.1 (lineitem ~600k rows, accuracy=10000): 2.8e-4 relative
    (measured 2026-08-14); gate ~18x above at 5e-3 to stay robust to
    fixture regeneration."""
    import duckdb

    from dwca_parquet_spark.operators.relational import approx_percentiles

    sf_dir = "/root/testdata/sf0.1"
    qs = {"p25": 0.25, "p50": 0.5, "p90": 0.9, "p99": 0.99}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        r["l_returnflag"]: {k: r[k] for k in qs}
        for r in approx_percentiles(
            li, "l_returnflag", "l_extendedprice", qs
        ).collect()
    }
    con = duckdb.connect()
    exact = {
        row[0]: dict(zip(qs, row[1:]))
        for row in con.sql(
            "SELECT l_returnflag, "
            + ", ".join(
                f"quantile_cont(CAST(l_extendedprice AS DOUBLE), {q})"
                for q in qs.values()
            )
            + f" FROM read_parquet('{sf_dir}/lineitem.parquet')"
            " GROUP BY l_returnflag"
        ).fetchall()
    }
    assert set(got) == set(exact)
    max_rel = 0.0
    for g in got:
        for k in qs:
            rel = abs(got[g][k] - exact[g][k]) / abs(exact[g][k])
            max_rel = max(max_rel, rel)
    assert max_rel < 5e-3, f"max relative error {max_rel:.2e} exceeds gate"
