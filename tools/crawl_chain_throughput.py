"""Round-6 harness (VERDICT ask #5): ONE end-to-end number for the
crawl-to-training chain.

Generates a synthetic WARC archive set (default ~1 GB of uncompressed
HTML across N .warc.gz files — English-like text with Gopher stop words
and C4-survivable punctuation, plus cross-document boilerplate
paragraphs so the dedup stage has real work), then runs the full chain

    read_warc → html_extract_text → c4_clean(keep) → gopher_quality(keep)
    → dedup_paragraphs (drop emptied docs) → write_training_shards

forced end-to-end by the shard export (the manifest aggregate + data
write materialize everything upstream), and reports docs/s and MB/s of
input HTML — the single number a 100 TB adopter asks for first.

Usage: python tools/crawl_chain_throughput.py [--mb 1024] [--files 64]
       [--out /tmp/crawl_chain]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import gzip
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")

STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _vocab(rng) -> list[str]:
    base = [
        "".join(chr(ord("a") + c) for c in rng.integers(0, 26, size=ln))
        for ln in rng.integers(3, 9, size=4000)
    ]
    # salt stop words heavily so Gopher's stop-word gate passes
    return base + STOPS * 400


def _gen_warcs(dst: Path, total_mb: int, n_files: int, seed: int = 7):
    """Write n_files .warc.gz whose summed UNCOMPRESSED HTML ≈ total_mb.
    Returns (n_docs, html_bytes)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(rng))
    # shared paragraph pool: ~15% of each doc's paragraphs come from a
    # small boilerplate set repeated corpus-wide (the dedup stage's prey)
    boiler = [
        " ".join(rng.choice(vocab, size=30).tolist()).capitalize() + "."
        for _ in range(40)
    ]
    dst.mkdir(parents=True, exist_ok=True)
    target = total_mb * (1 << 20)
    per_file = target // n_files
    n_docs = 0
    html_bytes = 0
    for fi in range(n_files):
        chunks: list[bytes] = []
        written = 0
        while written < per_file:
            paras = []
            for _ in range(int(rng.integers(4, 12))):
                if rng.random() < 0.15:
                    paras.append(boiler[int(rng.integers(0, len(boiler)))])
                else:
                    words = rng.choice(vocab, size=int(rng.integers(20, 60)))
                    paras.append(" ".join(words.tolist()).capitalize() + ".")
            body = "".join(f"<p>{p}</p>\n" for p in paras)
            html = (
                "<html><head><title>doc</title>"
                "<script>var x = 1;</script></head>"
                f"<body>{body}</body></html>"
            )
            payload = html.encode()
            uri = f"http://synth.example/{fi}/{n_docs}"
            head = (
                f"WARC/1.0\r\n"
                f"WARC-Type: response\r\n"
                f"WARC-Target-URI: {uri}\r\n"
                f"WARC-Date: 2026-08-15T00:00:00Z\r\n"
                f"Content-Type: text/html\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode()
            chunks.append(head + payload + b"\r\n\r\n")
            written += len(payload)
            html_bytes += len(payload)
            n_docs += 1
        with gzip.open(dst / f"part-{fi:04d}.warc.gz", "wb",
                       compresslevel=1) as f:
            f.write(b"".join(chunks))
    return n_docs, html_bytes


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=1024)
    ap.add_argument(
        "--files", type=int, default=None,
        help="WARC file count (default: one per ~8 MB, min 32 — the file "
        "count caps the parse parallelism)",
    )
    ap.add_argument("--out", default="/tmp/crawl_chain")
    ap.add_argument("--keep-fixture", action="store_true")
    ap.add_argument(
        "--unicode", action="store_true",
        help="insert the op-115 hygiene stage (clean_controls + "
        "fix_mojibake + normalize_nfc) between extraction and C4",
    )
    ap.add_argument(
        "--split", action="store_true",
        help="op-113 final fence: leakage-safe train/val/test shard "
        "exports (near-dup clusters never straddle the fence), one "
        "verified manifest per split",
    )
    args = ap.parse_args()

    if args.files is None:
        args.files = max(32, args.mb // 8)
    out = Path(args.out)
    warc_dir = out / "warc"
    shard_dir = out / "shards"
    if not args.keep_fixture and warc_dir.exists():
        shutil.rmtree(warc_dir)
    t0 = time.perf_counter()
    if not warc_dir.exists():
        n_docs_in, html_bytes = _gen_warcs(warc_dir, args.mb, args.files)
        print(
            f"  generated {n_docs_in} docs / {html_bytes / 2**20:.0f} MB "
            f"in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr, flush=True,
        )
    else:
        n_docs_in = html_bytes = None

    from pyspark.sql import functions as F

    from dwca_parquet_spark.operators.dedup import dedup_paragraphs
    from dwca_parquet_spark.operators.html import html_extract_text
    from dwca_parquet_spark.operators.text import c4_clean, gopher_quality
    from dwca_parquet_spark.session import get_spark
    from dwca_parquet_spark.sinks.shards import (
        verify_shards,
        write_training_shards,
    )

    spark = get_spark("crawl-chain-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()  # warm

    t1 = time.perf_counter()
    from dwca_parquet_spark.sources.warc import read_warc

    recs = read_warc(spark, warc_dir)
    docs = recs.select(
        F.col("target_uri").alias("doc_id"),
        F.decode(F.col("payload"), "utf-8").alias("html"),
    )
    extracted = html_extract_text(docs, "doc_id", "html")
    if args.unicode:
        from dwca_parquet_spark.operators.unicode import (
            clean_controls,
            fix_mojibake,
            normalize_nfc,
        )

        extracted = clean_controls(extracted, "doc_id", "text")
        extracted = fix_mojibake(extracted, "doc_id", "text").select(
            "doc_id", "text"
        )
        extracted = normalize_nfc(extracted, "doc_id", "text")
    c4 = c4_clean(extracted, "doc_id", "text")
    # persist: consumed twice (the Gopher signal pass + the semi-join
    # left side) — unpersisted, the WARC parse + extraction chain runs
    # twice
    c4_kept = c4.filter(F.col("keep")).select("doc_id", "text").persist()
    gq = gopher_quality(c4_kept, "doc_id", "text")
    # STAGE BOUNDARY: everything above is a zero-shuffle projection
    # chain over the Python WARC parse, but the consumers below fan out
    # (dedup walks the corpus twice — hash table + per-doc reassembly —
    # and the shard sort adds a range-sampling pass). Unpersisted, the
    # parse+extract+filter chain re-executes per consumer: measured 5×
    # recompute, 212 s for 64 MB. Persisted once: the downstream graph
    # reads columnar cache. At 100 TB this boundary is a parquet
    # checkpoint between the filter fleet and the dedup job — exactly
    # how the operators' own docstrings say to compose them.
    kept = c4_kept.join(
        gq.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    ).persist()
    deduped = dedup_paragraphs(kept, "doc_id", "text").filter(
        F.col("n_paras_kept") > 0
    ).select("doc_id", "text").persist()
    manifest = write_training_shards(
        deduped, shard_dir, "doc_id", "text", n_shards=32
    )
    stats = manifest.agg(
        F.sum("n_docs").alias("docs"), F.sum("n_tokens").alias("toks")
    ).collect()[0]
    split_info = None
    if args.split:
        from dwca_parquet_spark.operators.sampling import leakage_safe_split

        assigned = leakage_safe_split(deduped, "doc_id", "text").persist()
        split_info = {}
        # one bounded aggregate over the persisted table answers all
        # three emptiness probes (an isEmpty per split would re-run the
        # semi-join once more than the shard write already does)
        split_counts = {
            r["split"]: r["count"]
            for r in assigned.groupBy("split").count().collect()
        }
        for split_name in ("train", "val", "test"):
            if not split_counts.get(split_name):
                # tiny corpora can leave a split empty
                split_info[split_name] = {"docs": 0, "verified": True}
                continue
            part = deduped.join(
                assigned.filter(F.col("split") == split_name)
                .select("doc_id"),
                "doc_id",
                "left_semi",
            )
            m = write_training_shards(
                part, shard_dir.parent / f"shards_{split_name}",
                "doc_id", "text", n_shards=8,
            )
            n = m.agg(F.sum("n_docs")).collect()[0][0] or 0
            v = verify_shards(
                spark, shard_dir.parent / f"shards_{split_name}", "doc_id"
            ).count() == 0
            split_info[split_name] = {"docs": int(n), "verified": bool(v)}
        assigned.unpersist()
    chain_sec = time.perf_counter() - t1
    ok = verify_shards(spark, shard_dir, "doc_id").count() == 0

    in_mb = (html_bytes or args.mb * (1 << 20)) / (1 << 20)
    result = {
        "metric": "crawl_chain_throughput",
        "input_mb_html": round(in_mb, 1),
        "input_docs": n_docs_in,
        "output_docs": int(stats["docs"]),
        "output_tokens": int(stats["toks"]),
        "chain_sec": round(chain_sec, 2),
        "docs_per_sec": round((n_docs_in or 0) / chain_sec, 1),
        "mb_per_sec": round(in_mb / chain_sec, 2),
        "shards_verified": bool(ok),
        "cpus": spark.sparkContext.defaultParallelism,
    }
    if split_info is not None:
        result["splits"] = split_info
        ok = ok and all(s["verified"] for s in split_info.values())
    print(json.dumps(result), flush=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
