"""WARC reader (SURVEY §2 round-4): synthetic archives with
newline-laden and header-lookalike payloads (the cases that break
line-based splitting), .warc and .warc.gz, record-type filtering, and a
pipeline smoke — WARC → text decode → the engine's own text operators."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from dwca_parquet_spark.sources.warc import read_warc


def _record(rtype: str, uri: str, payload: bytes, extra: str = "") -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2026-08-14T00:00:00Z\r\n"
        f"Content-Type: text/plain\r\n"
        f"{extra}"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


PAY_A = b"plain text body"
# payload that CONTAINS a fake record header and newlines — must not split
PAY_B = b"line one\r\nWARC/1.0\r\nWARC-Type: response\r\nnot a real record\n\nend"
PAY_C = b"third record body with unicode \xc3\xa9"


def _archive() -> bytes:
    return (
        _record("warcinfo", "urn:info", b"software: synthetic")
        + _record("response", "http://a.example.com/x", PAY_A)
        + _record("response", "http://b.example.org/y", PAY_B)
        + _record("request", "http://a.example.com/x", b"GET /x")
        + _record("response", "http://c.example.net/z", PAY_C)
    )


def test_warc_parse_plain_and_gz(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "one.warc").write_bytes(_archive())
    (d / "two.warc.gz").write_bytes(gzip.compress(_archive()))

    rows = read_warc(spark, d).collect()
    # responses only, from both files; payloads byte-exact despite the
    # embedded fake header in PAY_B
    assert len(rows) == 6
    by_uri = {}
    for r in rows:
        by_uri.setdefault(r["target_uri"], []).append(bytes(r["payload"]))
    assert sorted(by_uri) == [
        "http://a.example.com/x",
        "http://b.example.org/y",
        "http://c.example.net/z",
    ]
    assert by_uri["http://b.example.org/y"] == [PAY_B, PAY_B]
    assert by_uri["http://a.example.com/x"] == [PAY_A, PAY_A]
    assert all(r["record_type"] == "response" for r in rows)
    assert all(r["content_length"] == len(bytes(r["payload"])) for r in rows)

    # all types on request
    everything = read_warc(spark, d, record_types=()).collect()
    assert len(everything) == 10


def test_warc_feeds_text_pipeline(spark, tmp_path):
    from dwca_parquet_spark.operators.text import extract_urls

    d = tmp_path / "w2"
    d.mkdir()
    (d / "a.warc").write_bytes(
        _record(
            "response",
            "http://x.example.com/",
            b"see http://linked.example.org/page and http://other.test.co/",
        )
    )
    docs = (
        read_warc(spark, d)
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.decode(F.col("payload"), "utf-8").alias("text"),
        )
    )
    urls = extract_urls(docs, "doc_id", "text", collapse_suffix=True)
    got = sorted(r["registrable_domain"] for r in urls.collect())
    assert got == ["example.org", "test.co"]
