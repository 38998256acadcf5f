"""Gates for cross-group overlap estimates (SURVEY §2 op 131): exact
Jaccard/union/intersection when groups are under-full, KMV estimator
accuracy on over-full groups, disjointness/symmetry laws, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.sketch import (
    bottomk_by_group,
    group_overlap_estimates,
)

K = 256


def _state(spark, rows):
    df = spark.createDataFrame(rows, "grp string, key string")
    return bottomk_by_group(df, "grp", "key", K)


def test_underfull_groups_are_exact(spark):
    rows = (
        [("A", f"t{i}") for i in range(100)]
        + [("B", f"t{i}") for i in range(50, 150)]
        + [("C", f"t{i}") for i in range(200, 300)]
    )
    got = {
        (r["grp_a"], r["grp_b"]): r
        for r in group_overlap_estimates(_state(spark, rows), K).collect()
    }
    ab = got[("A", "B")]
    assert ab["exact"] is True
    assert ab["jaccard_est"] == pytest.approx(50 / 150, abs=1e-6)
    assert ab["union_est"] == 150.0
    assert ab["intersect_est"] == pytest.approx(50.0, abs=1e-6)
    for pair in (("A", "C"), ("B", "C")):
        assert got[pair]["jaccard_est"] == 0.0
        assert got[pair]["intersect_est"] == 0.0
    assert len(got) == 3  # each unordered pair exactly once, a < b


def test_two_underfull_groups_with_large_union_are_not_exact(spark):
    """ADVICE r8 regression: 200 + 200 DISJOINT keys at k=256 — both
    states under-full, but the 400-key union exceeds k, so the bottom-k
    truncates it and the numbers are KMV estimates, never exact=True.
    The estimates must still be sane (true J=0 here: x holds no shared
    key), and a pair whose union DOES fit in k stays exact."""
    rows = (
        [("A", f"a{i}") for i in range(200)]
        + [("B", f"b{i}") for i in range(200)]
        + [("C", f"a{i}") for i in range(40)]  # C ⊂ A, union(A,C)=200 ≤ k
    )
    got = {
        (r["grp_a"], r["grp_b"]): r
        for r in group_overlap_estimates(_state(spark, rows), K).collect()
    }
    ab = got[("A", "B")]
    assert ab["exact"] is False  # was True before the union-size fix
    assert ab["jaccard_est"] == 0.0  # disjoint: no shared key in x
    ac = got[("A", "C")]
    assert ac["exact"] is True
    assert ac["union_est"] == 200.0
    assert ac["jaccard_est"] == pytest.approx(40 / 200, abs=1e-6)


def test_estimator_accuracy_on_overfull_groups(spark):
    rows = [("A", f"k{i}") for i in range(10_000)] + [
        ("B", f"k{i}") for i in range(7_000, 17_000)
    ]
    got = group_overlap_estimates(_state(spark, rows), K).collect()[0]
    true_j = 3_000 / 17_000
    assert got["exact"] is False
    assert abs(got["jaccard_est"] - true_j) < 0.06  # ~2.5σ for k=256
    assert abs(got["union_est"] - 17_000) / 17_000 < 0.15
    assert abs(got["intersect_est"] - 3_000) / 3_000 < 0.45


def test_deterministic(spark):
    rows = [("A", f"x{i}") for i in range(500)] + [
        ("B", f"x{i}") for i in range(250, 750)
    ]
    a = [tuple(r) for r in
         group_overlap_estimates(_state(spark, rows), K).collect()]
    b = [tuple(r) for r in
         group_overlap_estimates(_state(spark, rows), K).collect()]
    assert a == b and len(a) == 1
