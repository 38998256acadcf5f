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
