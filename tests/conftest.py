"""Shared fixtures: one session-scoped SparkSession + DuckDB with the
fixture tables registered as views (mirroring the driver's oracle setup)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import SparkSession

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    # Deliberately a PLAIN session (not this repo's get_spark): the driver's
    # correctness gate builds its own SparkSession, so every query must work
    # without our builder's conf. Round 1's q16/q23/q24 crash was masked by
    # testing under get_spark() — never again.
    s = (
        SparkSession.builder.master("local[*]")
        .appName("dwca-parquet-spark-tests")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def duck():
    return duck_con(SF_T2)
