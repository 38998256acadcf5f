"""Differential tests for BPE learning/encoding (operators/bpe.py):
an INDEPENDENT reference learner (Counter-based, its own merge-apply and
tie-breaks) must produce the identical merge list; the distributed
per-merge mode must equal the driver mode; encoding must reconstruct the
text and match a merge-order apply."""

from __future__ import annotations

from collections import Counter

import pytest

from dwca_parquet_spark.functions.hashing import normalize_text_py
from dwca_parquet_spark.operators.bpe import END, bpe_encode, bpe_fit
from tests.conftest import SF_T2

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cats sat on the mats"),
    (3, "a catalog of cats and more cats"),
    (4, "low lower lowest newer newest"),
    (5, "low low low low low lower lower newer newer newest"),
    (6, ""),
    (7, "the the the the"),
]


def _ref_fit(texts: list[str], n_merges: int, min_count: int):
    """Independent learner: same published algorithm, fresh code."""
    wc = Counter()
    for t in texts:
        for w in normalize_text_py(t).split():
            wc[w] += 1
    words = {w: tuple([*w] + [END]) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        # max count, then lexicographically smallest pair
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < min_count:
            break
        merges.append((a, b, n))
        new_words = {}
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


def _ref_encode_by_merge_order(text: str, merges) -> list[str]:
    """Apply merges IN LEARNED ORDER (the original paper's apply) —
    must equal the operator's greedy lowest-rank-first encode."""
    out = []
    for w in normalize_text_py(text).split():
        syms = [*w] + [END]
        for a, b, _n in merges:
            i, new = 0, []
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            syms = new
        out.extend(syms)
    return out


def test_bpe_fit_matches_independent_reference(spark):
    df = spark.createDataFrame(CORPUS, "id long, t string")
    model = bpe_fit(df, "t", n_merges=25, min_count=2)
    want = _ref_fit([t for _, t in CORPUS], 25, 2)
    assert model["merges"] == want
    assert len(want) > 5  # the fixture actually exercises merging


def test_bpe_fit_distributed_equals_driver(spark):
    df = spark.createDataFrame(CORPUS, "id long, t string")
    driver = bpe_fit(df, "t", n_merges=12, min_count=2)
    dist = bpe_fit(df, "t", n_merges=12, min_count=2, distributed=True)
    assert dist["merges"] == driver["merges"]


def test_bpe_fit_documents_reference_parity(spark):
    """Corpus-scale check on real testdata (t2 documents, bounded merges)."""
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    model = bpe_fit(docs, "text", n_merges=15, min_count=2)
    texts = [r["text"] for r in docs.select("text").collect()]
    assert model["merges"] == _ref_fit(texts, 15, 2)


def test_bpe_encode_reconstructs_and_matches_merge_order(spark):
    df = spark.createDataFrame(CORPUS, "id long, t string")
    model = bpe_fit(df, "t", n_merges=25, min_count=2)
    rows = {
        r["id"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"])
        for r in bpe_encode(df, "id", "t", model).collect()
    }
    for i, t in CORPUS:
        toks, n = rows[i]
        assert n == len(toks)
        # lossless: stitching subwords back yields the normalized words
        rebuilt = "".join(toks).replace(END, " ").strip()
        assert rebuilt == " ".join(normalize_text_py(t).split())
        # greedy rank-first == merge-order apply
        assert toks == _ref_encode_by_merge_order(t, model["merges"])


def test_bpe_fit_partition_invariant(spark):
    df = spark.createDataFrame(CORPUS, "id long, t string")
    m1 = bpe_fit(df, "t", n_merges=10)
    m2 = bpe_fit(df.repartition(7), "t", n_merges=10)
    assert m1["merges"] == m2["merges"]
