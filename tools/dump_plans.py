"""Dump .explain("formatted") for declared queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> <suffix> <query> [<query> ...]
Writes plans/<tag>/<query>_<suffix>.txt for each query (built at sf0.1,
the bench volume, so AQE-relevant estimates match the benched plans).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from dwca_parquet_spark.cache import release_caches  # noqa: E402
from dwca_parquet_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    from dwca_parquet_spark import queries as Q

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join("/root/repo/plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = Q.QUERIES[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(path)
        release_caches()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
