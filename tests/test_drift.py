"""Gates for the corpus drift report (SURVEY §2 op 133): the identity
law (drift(X, X) is zero everywhere, exactly), planted drift moving
exactly the matching panels with EXACT retention in the under-full
regime, and the JS divergence unit laws."""

from __future__ import annotations

import pytest

from dwca_parquet_spark.operators.drift import corpus_drift, js_divergence
from tests.conftest import SF_T2


def test_js_divergence_laws():
    assert js_divergence({1: 10, 2: 30}, {1: 10, 2: 30}) == 0.0
    assert js_divergence({1: 5, 2: 15}, {1: 10, 2: 30}) == 0.0  # scale-free
    assert js_divergence({1: 10}, {2: 10}) == pytest.approx(1.0)
    assert 0.0 < js_divergence({1: 10, 2: 10}, {1: 19, 2: 1}) < 1.0


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
