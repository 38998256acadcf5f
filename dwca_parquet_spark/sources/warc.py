"""WARC (Web ARChive) reader — the crawl-ingestion source (SURVEY §2
round-4 extension).

Public web corpora (Common Crawl and its derivatives) ship as WARC: a
concatenation of records, each a header block (WARC/1.0 + named headers,
CRLF line ends) followed by a Content-Length-delimited payload. Line-based
readers cannot split it (payloads contain newlines and header-lookalikes),
so the distributed shape is FILE-granular: Spark's binaryFile source lists
and distributes the (typically ~1 GB, independently-readable) WARC files
across executors, and an Arrow-batched mapInPandas parses each file's
records in the Python worker — Content-Length-driven, so payload bytes are
never scanned for delimiters. Only the requested record types (default
'response') surface; payloads stay bytes (multimodal column discipline —
downstream decides decoding).

At 100 TB: one task per WARC file (the natural unit — files are
independent by format design), no shuffle, headers parsed once, payload
bytes move exactly once (file → Arrow batch). gzip members per record
(.warc.gz) are handled transparently by gzip's multi-member decompression.
"""

from __future__ import annotations

from collections.abc import Iterator
from pathlib import Path

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "warc_file string, record_type string, target_uri string, "
    "warc_date string, content_type string, content_length bigint, "
    "payload binary"
)


_WS = b" \t\r\n"  # whitespace allowed between records


def _parse_warc_bytes(name: str, blob: bytes, keep_types: set[str] | None):
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record whitespace by INDEX — a `blob[pos:]` slice here
        # would copy the whole remaining file per record (O(bytes × records)
        # on ~1 GB Common Crawl files); startswith takes an offset instead
        while pos < n and blob[pos] in _WS:
            pos += 1
        if not blob.startswith(b"WARC/", pos):
            return
        head_end = blob.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in blob[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
        length = int(headers.get("content-length", "0"))
        payload = blob[head_end + 4 : head_end + 4 + length]
        rtype = headers.get("warc-type", "")
        if keep_types is None or rtype in keep_types:
            yield (
                name,
                rtype,
                headers.get("warc-target-uri"),
                headers.get("warc-date"),
                headers.get("content-type"),
                length,
                payload,
            )
        pos = head_end + 4 + length


def read_warc(
    spark: SparkSession,
    path: str | Path,
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """One row per WARC record of the requested types across every file
    matched by ``path`` (dir or glob; .warc and .warc.gz)."""
    keep = set(record_types) if record_types else None
    files = spark.read.format("binaryFile").load(str(path))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip as _gz

        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content)
                if fname.endswith(".gz"):
                    blob = _gz.decompress(blob)  # multi-member capable
                rows.extend(_parse_warc_bytes(fname, blob, keep))
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "record_type", "target_uri", "warc_date",
                    "content_type", "content_length", "payload",
                ],
            )

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)
