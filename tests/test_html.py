"""Differential tests for HTML → clean text extraction (operators/html.py)
against DuckDB running the IDENTICAL pass sequence (sql_html_extract_text)
— the driver-gate discipline, pytest-hosted (the 50-entry registry is full).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.html import (
    html_extract_text,
    sql_html_extract_text,
)
from tests.conftest import SF_T2

HTML_ROWS = [
    (
        1,
        "<html><head><title> My  Page </title><script>var x = '<p>';"
        "</script><style>p { color: red }</style></head><body>"
        "<nav><a href='/'>home</a><a href='/x'>x</a></nav>"
        "<h1>Header</h1><p>First para with <b>bold</b> &amp; "
        "<a href='http://e.com'>a link</a>.</p>"
        "<p>Second&nbsp;para &lt;tag-ish&gt; &quot;quoted&quot;</p>"
        "<!-- a comment with <p>fake tags</p> -->"
        "<footer>copyright &#39;26</footer></body></html>",
    ),
    (2, "plain text, no markup at all"),
    (3, ""),
    (4, "<p>unclosed paragraph <div>nested <span>span"),
    (5, "<SCRIPT>UPPER.case()</SCRIPT><P>Mixed <BR>Case</P>"),
    (6, "a &amp;lt; b"),  # must decode to 'a &lt; b', NOT 'a < b'
    (
        7,
        "<ul><li>one</li><li>two</li></ul>"
        "<table><tr><td>c1</td><td>c2</td></tr></table>",
    ),
    (8, "<a href='x'>1</a> <A HREF='y'>2</A> <abbr>not a link</abbr>"),
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE html_rows (id BIGINT, html VARCHAR)")
    con.executemany("INSERT INTO html_rows VALUES (?, ?)", HTML_ROWS)
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_T2}/documents.parquet')"
    )
    return con


def test_html_extract_synthetic_parity(spark, duck):
    df = spark.createDataFrame(HTML_ROWS, "id long, html string")
    got = {
        r["id"]: (r["text"], r["title"], r["n_links"])
        for r in html_extract_text(df, "id", "html").collect()
    }
    want = {
        row[0]: (row[1], row[2], row[3])
        for row in duck.execute(
            sql_html_extract_text("html_rows", "id", "html")
        ).fetchall()
    }
    assert got == want
    # semantics, not just parity
    text1, title1, links1 = got[1]
    assert "var x" not in text1 and "color: red" not in text1  # script/style
    assert "home" not in text1  # nav dropped wholesale
    assert "fake tags" not in text1  # comment dropped
    assert "copyright" not in text1  # footer dropped
    # inline tags become spaces, so '</a>.' renders as ' .' — documented
    assert "First para with bold & a link ." in text1
    assert '"quoted"' in text1 and "<tag-ish>" in text1  # entities decoded
    assert "Header\n" in text1  # block tag → line break
    assert title1 == "My Page"
    assert links1 == 3  # two nav links + body link (raw count, pre-strip)
    assert got[2] == ("plain text, no markup at all", "", 0)
    assert got[3] == ("", "", 0)
    assert got[4][0] == "unclosed paragraph\nnested span"
    assert got[5][0] == "Mixed\nCase"  # case-insensitive tags
    assert got[6][0] == "a &lt; b"  # &amp; decoded LAST — no double decode
    assert got[7][0] == "one\ntwo\nc1 c2"
    assert got[8] == ("1 2 not a link", "", 2)


def test_html_extract_documents_parity(spark, duck):
    """Wrap every sf-t2 document's text in markup (same construction in
    both engines) and check full-column parity at corpus scale."""
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>doc </title><script>skip()</script>"
                  "</head><body><nav><a href='/'>n</a></nav><p>"),
            F.col("text"),
            F.lit("</p><!-- c --></body></html>"),
        ).alias("html"),
    )
    got = sorted(
        tuple(r)
        for r in html_extract_text(wrapped, "doc_id", "html").collect()
    )
    want = sorted(
        duck.execute(
            sql_html_extract_text(
                "(SELECT doc_id, '<html><head><title>doc </title>"
                "<script>skip()</script></head><body>"
                "<nav><a href=''/''>n</a></nav><p>' || text || "
                "'</p><!-- c --></body></html>' AS html FROM documents)",
                "doc_id",
                "html",
            )
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0


def test_html_extract_plan_is_scan_stage(spark):
    """Zero shuffle: the extraction must be pure projections."""
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet").withColumn(
        "html", F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>"))
    )
    plan = html_extract_text(docs, "doc_id", "html")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
