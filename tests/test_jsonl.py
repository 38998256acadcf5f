"""JSONL source/sink (SURVEY §2 round-4): round-trip losslessness
(unicode, nulls, nested), corrupt-line policies, and DuckDB agreeing on
what the written files contain."""

from __future__ import annotations

import json

import duckdb
from pyspark.sql import functions as F

from dwca_parquet_spark.sources.jsonl import (
    CORRUPT_COL,
    read_jsonl,
    write_jsonl,
)
from tests.conftest import SF_T2

SCHEMA = "doc_id bigint, text string, lang string, n_chars bigint"


def test_jsonl_round_trip_and_duckdb_agrees(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet").select(
        "doc_id", "text", "lang", "n_chars"
    )
    out = str(tmp_path / "corpus_jsonl")
    write_jsonl(docs, out)

    back = read_jsonl(spark, out, SCHEMA, corrupt="fail")
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b

    # an independent reader agrees with what we wrote
    con = duckdb.connect()
    n, n_chars_sum = con.execute(
        f"SELECT count(*), sum(n_chars) FROM read_json_auto('{out}/*.json.gz', format='newline_delimited')"
    ).fetchone()
    assert n == docs.count()
    assert n_chars_sum == docs.agg(F.sum("n_chars")).first()[0]


def test_jsonl_corrupt_policies(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "ok", "lang": "en", "n_chars": 2}),
        "{this is not json",
        json.dumps({"doc_id": 2, "text": "fine", "lang": "de", "n_chars": 4}),
    ]
    p.write_text("\n".join(lines))

    kept = read_jsonl(spark, p, SCHEMA, corrupt="keep")
    rows = kept.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(bad) == 1 and bad[0][CORRUPT_COL].startswith("{this")
    assert {r["doc_id"] for r in rows if r[CORRUPT_COL] is None} == {1, 2}

    dropped = read_jsonl(spark, p, SCHEMA, corrupt="drop")
    assert sorted(r["doc_id"] for r in dropped.collect()) == [1, 2]

    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Py4JJavaError):
        read_jsonl(spark, p, SCHEMA, corrupt="fail").collect()
