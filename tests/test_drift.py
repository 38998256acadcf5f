"""Gates for the corpus drift report (SURVEY §2 op 133): the identity
law (drift(X, X) is zero everywhere, exactly), planted drift moving
exactly the matching panels with EXACT retention in the under-full
regime, and the JS divergence unit laws."""

from __future__ import annotations

import pytest

from dwca_parquet_spark.operators.drift import (
    corpus_drift,
    js_divergence,
    kmv_retention,
)
from tests.conftest import SF_T2


def test_js_divergence_laws():
    assert js_divergence({1: 10, 2: 30}, {1: 10, 2: 30}) == 0.0
    assert js_divergence({1: 5, 2: 15}, {1: 10, 2: 30}) == 0.0  # scale-free
    assert js_divergence({1: 10}, {2: 10}) == pytest.approx(1.0)
    assert 0.0 < js_divergence({1: 10, 2: 10}, {1: 19, 2: 1}) < 1.0


def test_kmv_retention_degenerate_and_exactness_laws():
    """ADVICE r8: (1) when no new-side key lands in the union's
    bottom-k sample (tiny new snapshot vs huge old), retention is None
    — never a false 0/novelty-1; (2) exact requires the UNION to fit
    in k, not merely both states under-full."""
    k = 8
    # old fills the bottom-k with hashes 0..9; new's keys hash higher →
    # the union's bottom-8 holds no new key → degenerate, not 0.0
    old = {(f"o{i}", i) for i in range(10)}
    new = {(f"o{i}", i) for i in range(3)} | {(f"n{i}", 100 + i) for i in range(2)}
    big_new = {(f"n{i}", 100 + i) for i in range(5)}
    r, exact = kmv_retention(old, big_new, k)
    assert r is None and exact is False
    # sampled case: bottom-8 of the union includes new keys o0..o2 —
    # all retained → 1.0
    r, _ = kmv_retention(old, new, k)
    assert r == 1.0
    # both under-full but union of 5+5 disjoint keys > k=8 → not exact
    a = {(f"a{i}", i) for i in range(5)}
    b = {(f"b{i}", 50 + i) for i in range(5)}
    r, exact = kmv_retention(a, b, k)  # sampled new keys, none in old
    assert exact is False and r == 0.0
    # union fits in k → exact, true ratio
    c = {(f"a{i}", i) for i in range(3)} | {("c0", 90)}
    r, exact = kmv_retention(a, c, k)
    assert exact is True and r == pytest.approx(3 / 4)
    # empty new snapshot → no sample → None
    r, exact = kmv_retention(a, set(), k)
    assert r is None and exact is True


def test_identity_law_on_real_corpus(spark):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    report, m = corpus_drift(
        docs, docs, "doc_id", "text", source_col="source", name="x"
    )
    assert m["docs_old"] == m["docs_new"]
    assert m["length_js_divergence"] == 0.0
    assert m["dup_rate_delta"] == 0.0
    assert m["retention"] == 1.0 and m["novelty"] == 0.0
    assert m["overlap_exact"] is True  # 500 docs < k
    assert all(d == 0.0 for d in m["source_deltas"].values())
    assert "Drift report: x" in report


def test_planted_drift_moves_matching_panels(spark):
    old_rows = [(i, f"stable text number {i}", "A") for i in range(100)] + [
        (200 + i, f"source b text {i}", "B") for i in range(100)
    ]
    # new snapshot: keeps HALF of A's texts (same content), drops B,
    # adds source C, injects exact duplicates and much longer docs
    new_rows = (
        [(i, f"stable text number {i}", "A") for i in range(50)]
        + [(500 + i, "a fresh c document " + "pad " * 200, "C")
           for i in range(60)]
        + [(700 + i, "duplicated page", "C") for i in range(40)]
    )
    old = spark.createDataFrame(old_rows, "doc_id long, text string, source string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string, source string")
    report, m = corpus_drift(old, new, "doc_id", "text", source_col="source")
    # retention EXACT in the under-full regime: new distinct texts =
    # 50 (A) + 1 (c doc) + 1 (duplicated page) = 52, of which 50 are old
    assert m["overlap_exact"] is True
    assert m["retention"] == pytest.approx(50 / 52, abs=1e-6)  # 6-dp rounded
    # duplication jumped (40 copies of one text)
    assert m["dup_rate_delta"] > 0.2
    # sources: B vanished (negative delta), C appeared (positive)
    assert m["source_deltas"]["B"] < -0.3
    assert m["source_deltas"]["C"] > 0.3
    # long padded docs shifted the length distribution
    assert m["length_js_divergence"] > 0.1
    assert "⚠" in report  # the >5% share moves are flagged
