"""Gates for the statistical quality signals (SURVEY §2 op 116):
word entropy vs its DuckDB twin (exact, rounded-6 both sides) and vs
closed-form values; zlib compression ratio vs an independent reference
with the separation property the signal exists for."""

from __future__ import annotations

import math
import zlib

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.text import (
    compression_ratio,
    sql_word_entropy,
    word_entropy,
)
from tests.conftest import SF_T2

ROWS = [
    (0, "a a a a a a"),                      # H = 0
    (1, "a b a b a b a b"),                  # H = ln 2
    (2, "one two three four five six"),      # H = ln 6
    (3, "single"),                           # 1 word -> 0
    (4, ""),                                 # empty -> 0 words
    (5, "  spaced\t words \n here  "),       # whitespace trim/split
    (6, None),
]


def test_word_entropy_duckdb_twin_and_closed_form(spark, duck):
    df = spark.createDataFrame(ROWS, "id long, t string")
    got = sorted(
        (r["id"], r["n_words"], r["word_entropy"])
        for r in word_entropy(df, "id", "t").collect()
    )
    duck.execute("CREATE OR REPLACE TABLE wesrc (id BIGINT, t VARCHAR)")
    duck.executemany("INSERT INTO wesrc VALUES (?, ?)", ROWS)
    want = sorted(
        tuple(r)
        for r in duck.execute(sql_word_entropy("wesrc", "id", "t")).fetchall()
    )
    assert got == want
    by_id = {i: (n, h) for i, n, h in got}
    assert by_id[0] == (6, 0.0)
    assert by_id[1] == (8, round(math.log(2), 6))
    assert by_id[2] == (6, round(math.log(6), 6))
    assert by_id[3] == (1, 0.0)
    assert by_id[4][0] == 0
    assert by_id[5][0] == 3


def test_word_entropy_corpus_parity(spark, duck):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    got = sorted(
        tuple(r) for r in word_entropy(docs, "doc_id", "text").collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            sql_word_entropy("documents", "doc_id", "text")
        ).fetchall()
    )
    assert got == want


def test_compression_ratio_reference_and_separation(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog " * 3),
        (1, "spam " * 200),                      # pathological repetition
        (2, "x"),
        (3, ""),
        (4, None),
        (5, "Natural prose varies its vocabulary, so the deflate "
            "dictionary keeps missing and the stream stays close to "
            "the entropy of English text itself."),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r["id"]: (r["utf8_len"], r["zlib_len"], r["zlib_ratio"])
        for r in compression_ratio(df, "id", "t").collect()
    }
    for i, t in rows:
        if t is None:
            assert got[i] == (None, None, None)
            continue
        raw = len(t.encode("utf-8"))
        zl = len(zlib.compress(t.encode("utf-8"), 6))
        ratio = round(zl / raw, 6) if raw else None
        assert got[i] == (raw, zl, ratio), (i, got[i])
    # the separation the signal exists for: repetition compresses far
    # below natural prose
    assert got[1][2] < 0.1 < 0.3 < got[5][2]
    # determinism across a second run
    again = {
        r["id"]: (r["utf8_len"], r["zlib_len"], r["zlib_ratio"])
        for r in compression_ratio(df, "id", "t").collect()
    }
    assert again == got


def test_signals_zero_shuffle_plans(spark):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    for op in (word_entropy, compression_ratio):
        plan = (
            op(docs, "doc_id", "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, op.__name__
