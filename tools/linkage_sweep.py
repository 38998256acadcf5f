#!/usr/bin/env python
"""Measured evidence for the edit-distance join (op 110; SCALE.md):
PassJoin segment blocking vs DuckDB's brute-force cross join on
generated name corpora with planted typos, with full pair-set equality
asserted at every size the oracle can still compute.

Run: python tools/linkage_sweep.py [--quick]
"""

from __future__ import annotations

import random
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from dwca_parquet_spark.operators.linkage import edit_distance_pairs
from dwca_parquet_spark.session import get_spark

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def make_names(path: str, n: int) -> None:
    rng = random.Random(5)
    rows_id, rows_s = [], []
    rid = 0
    while rid < n:
        s = "".join(rng.choice(ALPHA) for _ in range(rng.randrange(6, 20)))
        rows_id.append(rid); rows_s.append(s); rid += 1
        for _ in range(rng.randrange(0, 3)):
            if rid >= n:
                break
            i = rng.randrange(len(s))
            t = s[:i] + rng.choice(ALPHA) + s[i + 1:]
            rows_id.append(rid); rows_s.append(t); rid += 1
    pq.write_table(
        pa.table({"id": pa.array(rows_id, pa.int64()),
                  "s": pa.array(rows_s, pa.string())}),
        path,
    )


def main() -> None:
    quick = "--quick" in sys.argv
    spark = get_spark("linkage-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    d = 2
    for n in ([2_000] if quick else [5_000, 20_000, 100_000]):
        with tempfile.TemporaryDirectory() as td:
            path = f"{td}/names.parquet"
            make_names(path, n)
            df = spark.read.parquet(path).repartition(32)
            t0 = time.time()
            got = edit_distance_pairs(df, "id", "s", d)
            n_pairs = got.count()
            t_s = time.time() - t0
            line = (
                f"edit_distance_pairs n={n} d={d}: {n_pairs} pairs, "
                f"spark {t_s:.1f} s"
            )
            if n <= 20_000:  # oracle cross join feasible
                con = duckdb.connect()
                con.sql(f"CREATE VIEW r AS SELECT * FROM read_parquet('{path}')")
                t0 = time.time()
                want = {
                    (a, b, dist)
                    for a, b, dist in con.execute(
                        "SELECT x.id, y.id, levenshtein(x.s, y.s) "
                        "FROM r x, r y WHERE x.id < y.id "
                        f"AND levenshtein(x.s, y.s) <= {d}"
                    ).fetchall()
                }
                t_d = time.time() - t0
                got_set = {
                    (r["id_a"], r["id_b"], r["dist"]) for r in got.collect()
                }
                assert got_set == want, "pair sets diverged"
                line += f", duckdb brute force {t_d:.1f} s, sets EQUAL"
            print(line)


if __name__ == "__main__":
    main()
