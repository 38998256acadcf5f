"""Duplicated-span detection (token-window substring dedup, SURVEY §2
round-4): DuckDB-differential parity on synthetic planted spans and on the
documents fixture, plus semantic asserts on the planted cases."""

from __future__ import annotations

import duckdb
import pytest

from dwca_parquet_spark.operators.dedup import (
    duplicated_spans,
    span_hash_table,
    sql_duplicated_spans,
)
from tests.conftest import SF_T2

BOILER = "this license text is repeated verbatim across many documents here"
ROWS = [
    (1, f"{BOILER} plus unique tail alpha beta gamma"),
    (2, f"prefix words differ here {BOILER} and more unique suffix delta"),
    (3, "a wholly unique document with no repeated window of any kind at all"),
    (4, f"{BOILER}"),
    (5, "short doc"),
    (6, ""),
    # intra-document repetition: same 8-token run twice in ONE doc
    (7, "one two three four five six seven eight one two three four five six seven eight"),
]


def _got(spark, df, w):
    return {
        r["id"]: (r["n_spans"], r["n_dup_spans"], r["dup_span_fraction"])
        for r in duplicated_spans(df, "id", "text", w=w).collect()
    }


def test_planted_spans_parity_and_semantics(spark):
    df = spark.createDataFrame(ROWS, "id long, text string")
    got = _got(spark, df, w=8)

    con = duckdb.connect()
    con.execute("CREATE TABLE rows_t (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO rows_t VALUES (?, ?)", ROWS)
    cur = con.execute(sql_duplicated_spans("rows_t", "id", "text", w=8))
    want = {r[0]: (r[1], r[2], r[3]) for r in cur.fetchall()}
    assert got == want

    # semantics: the boilerplate docs share every window inside BOILER
    assert got[4][1] == got[4][0] > 0          # doc 4 is pure boilerplate
    assert got[4][2] == 1.0
    assert got[3] == (got[3][0], 0, 0.0)       # unique doc: no dup spans
    assert got[5] == (0, 0, 0.0)               # < w tokens: no spans
    assert got[6] == (0, 0, 0.0)               # empty
    # intra-doc repeat: windows 1..8 == windows 9..16 pairwise
    assert got[7][1] > 0


def test_documents_fixture_parity(spark, duck):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_span_fraction"])
        for r in duplicated_spans(docs, "doc_id", "text", w=5).collect()
    }
    cur = duck.execute(sql_duplicated_spans("documents", "doc_id", "text", w=5))
    want = {r[0]: (r[1], r[2], r[3]) for r in cur.fetchall()}
    assert got == want
    assert len(got) == docs.count()


def test_span_table_positions(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d")], "id long, text string"
    )
    rows = span_hash_table(df, "id", "text", w=4).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append((r["span_idx"], r["span_hash"]))
    assert sorted(i for i, _ in by_doc[1]) == [0, 1]   # 5 tokens, w=4 → 2 spans
    assert sorted(i for i, _ in by_doc[2]) == [0]
    # doc2's only window 'a b c d' equals doc1's first window
    assert by_doc[2][0][1] == dict(by_doc[1])[0]


def _py_trim(rows, w=8):
    """Independent python reference for trim_duplicated_spans' spec."""
    import re

    def norm(s):
        s = re.sub(r"[^\x20-\x7e]", "", s.lower())
        return re.sub(r"\s+", " ", s).strip()

    MOD, BASE = 1_000_000_007, 31

    def th(tok):
        h = 0
        for ch in tok:
            h = (h * BASE + ord(ch)) % MOD
        return h

    docs = {i: (norm(t).split(" ") if norm(t) else []) for i, t in rows}
    occ: dict[int, list] = {}
    for i in sorted(docs):
        toks = docs[i]
        hs = [th(t) for t in toks]
        for s in range(len(toks) - w + 1):
            hv = 0
            for j in range(w):
                hv = (hv * BASE + hs[s + j]) % MOD
            occ.setdefault(hv, []).append((i, s))
    out = {}
    for i in sorted(docs):
        toks = docs[i]
        drop = set()
        hs = [th(t) for t in toks]
        for s in range(len(toks) - w + 1):
            hv = 0
            for j in range(w):
                hv = (hv * BASE + hs[s + j]) % MOD
            lst = occ[hv]
            if len(lst) > 1 and min(lst) != (i, s):
                drop.update(range(s, s + w))
        kept = [t for p, t in enumerate(toks) if p not in drop]
        out[i] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


def test_trim_duplicated_spans(spark):
    from dwca_parquet_spark.operators.dedup import trim_duplicated_spans

    df = spark.createDataFrame(ROWS, "id long, text string")
    got = {
        r["id"]: (r["text_trimmed"], r["n_tokens"], r["n_tokens_removed"])
        for r in trim_duplicated_spans(df, "id", "text", w=8).collect()
    }
    want = _py_trim(ROWS, w=8)
    assert got == want

    # semantics: the first boilerplate carrier (doc 1) keeps its text;
    # later pure-boilerplate doc 4 is emptied; unique doc 3 untouched
    assert got[1][2] == 0
    assert got[4][0] == "" and got[4][2] == got[4][1] > 0
    assert got[3][2] == 0
    # doc 2's boilerplate block is gone but its unique prefix/suffix stay
    assert "prefix words differ here" in got[2][0]
    assert "repeated verbatim" not in got[2][0]


def test_trim_on_fixture_matches_reference(spark):
    from dwca_parquet_spark.operators.dedup import trim_duplicated_spans

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet").filter(
        "doc_id % 10 < 3"
    )
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    got = {
        r["id"] if "id" in r else r["doc_id"]: (
            r["text_trimmed"], r["n_tokens"], r["n_tokens_removed"]
        )
        for r in trim_duplicated_spans(docs, "doc_id", "text", w=6).collect()
    }
    want = _py_trim(rows, w=6)
    assert got == want
