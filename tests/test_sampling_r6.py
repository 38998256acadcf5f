"""Round-6 sampling gates: quantile_bins_approx vs the exact ntile
operator (SURVEY §2 op 101's scale path), and the select_to_token_budget
NULL-score contract."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.sampling import (
    quantile_bins,
    quantile_bins_approx,
)

N = 5000
N_BINS = 10


def _score(i: int) -> float:
    # deterministic, collision-free pseudo-random scores in [0, 1)
    return ((i * 2654435761 + 12345) % 1_000_003) / 1_000_003 + i * 1e-12


@pytest.fixture(scope="module")
def distinct_scores(spark):
    return spark.createDataFrame(
        [(i, _score(i)) for i in range(N)], ["k", "s"]
    )


def test_approx_within_one_bin_of_exact(spark, distinct_scores):
    exact = {
        r["k"]: r["bin"]
        for r in quantile_bins(distinct_scores, "s", "k", N_BINS).collect()
    }
    approx = {
        r["k"]: r["bin"]
        for r in quantile_bins_approx(
            distinct_scores, "s", "k", N_BINS
        ).collect()
    }
    assert set(approx.values()) <= set(range(1, N_BINS + 1))
    worst = max(abs(approx[k] - exact[k]) for k in exact)
    assert worst <= 1, f"approx strayed {worst} bins from exact ntile"
    # populations: within the sketch's rank-error of equal shares
    sizes = Counter(approx.values())
    share = N / N_BINS
    for b in range(1, N_BINS + 1):
        assert abs(sizes.get(b, 0) - share) <= 0.05 * N, (b, sizes.get(b, 0))


def test_approx_monotone_in_score(spark, distinct_scores):
    rows = sorted(
        quantile_bins_approx(distinct_scores, "s", "k", N_BINS).collect(),
        key=lambda r: r["s"],
    )
    bins = [r["bin"] for r in rows]
    assert all(a <= b for a, b in zip(bins, bins[1:]))
    assert bins[0] == 1 and bins[-1] == N_BINS


def test_approx_ties_share_a_bin(spark):
    # 1000 rows over only 4 distinct scores: ntile would split ties,
    # the edge-based operator must NOT (every equal score → equal bin)
    df = spark.createDataFrame(
        [(i, float(i % 4)) for i in range(1000)], ["k", "s"]
    )
    out = quantile_bins_approx(df, "s", "k", N_BINS).collect()
    per_score = {}
    for r in out:
        per_score.setdefault(r["s"], set()).add(r["bin"])
    assert all(len(v) == 1 for v in per_score.values())
    got = {s: next(iter(v)) for s, v in per_score.items()}
    assert got[0.0] < got[1.0] < got[2.0] < got[3.0]


def test_approx_nbins_one_and_validation(spark, distinct_scores):
    out = quantile_bins_approx(distinct_scores, "s", "k", 1)
    assert out.select("bin").distinct().collect()[0]["bin"] == 1
    with pytest.raises(ValueError):
        quantile_bins_approx(distinct_scores, "s", "k", 0)


def test_token_budget_null_scores_kept_and_match_twin(spark, duck):
    """NULL-score rows were silently dropped pre-round-6 (the bucket
    expression went NULL and the equi-join discarded them) while the
    DuckDB twin kept them under NULLS LAST — a cross-engine divergence
    for an operator whose contract is one output row per input doc.
    Now: NULL scores land in the worst bucket, sort after every scored
    doc, and the full output matches the twin row-for-row."""
    from dwca_parquet_spark.operators.sampling import (
        select_to_token_budget,
        sql_select_to_token_budget,
    )

    rows = [(i, _score(i), 50 + i % 37) for i in range(400)] + [
        (1000 + i, None, 40 + i) for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, s double, t long")
    budget = 8_000
    got = sorted(
        (r["doc_id"], r["s"], r["doc_tokens"], r["cum_tokens"], r["selected"])
        for r in select_to_token_budget(
            df, "doc_id", "s", "t", budget
        ).collect()
    )
    assert len(got) == len(rows)  # no silent row loss
    duck.execute(
        "CREATE OR REPLACE TABLE nullsc (doc_id BIGINT, s DOUBLE, t BIGINT)"
    )
    duck.executemany("INSERT INTO nullsc VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in duck.execute(
            sql_select_to_token_budget("nullsc", "doc_id", "s", "t", budget)
        ).fetchall()
    )
    assert got == want
    # and with a budget larger than the scored mass, NULL-score docs DO
    # get selected from the leftover budget (kept ≠ always-rejected)
    big = sorted(
        (r["doc_id"], r["selected"])
        for r in select_to_token_budget(
            df, "doc_id", "s", "t", 10**9
        ).collect()
    )
    assert all(sel for _, sel in big)


def test_approx_plan_is_window_free_projection(spark, distinct_scores):
    """THE point of the operator: no unpartitioned window, no sort, no
    exchange — a pure projection over the scan (the edges aggregate is
    a separate bounded job, not part of this plan)."""
    out = quantile_bins_approx(distinct_scores, "s", "k", N_BINS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Exchange" not in plan
    assert "Sort" not in plan
    # and the exact operator IS the global window (the contrast pin)
    exact_plan = (
        quantile_bins(distinct_scores, "s", "k", N_BINS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in exact_plan


def test_approx_null_scores_bin_one_like_exact_ntile(spark):
    """ADVICE r6: NULL scores got a NULL bin from the edge-comparison
    sum while exact ntile (ORDER BY score ASC = Spark NULLS FIRST)
    assigns every row a bin, NULLs first → bin 1. The approx path now
    coalesces NULL scores to bin 1 to match."""
    rows = [(i, float(i)) for i in range(200)] + [
        (1000 + i, None) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "k long, s double")
    exact = {
        r["k"]: r["bin"] for r in quantile_bins(df, "s", "k", 4).collect()
    }
    approx = {
        r["k"]: r["bin"]
        for r in quantile_bins_approx(df, "s", "k", 4).collect()
    }
    assert len(approx) == len(rows)
    for i in range(5):
        assert exact[1000 + i] == 1
        assert approx[1000 + i] == 1
