"""Gates for classifier evaluation (SURVEY §2 op 124): DuckDB twin
parity (AUC / PR curve / confusion), an independent O(n²) pair-counting
reference incl. ties, exact metric laws (flip, perfect, constant),
NULL-universe contract, and the one-aggregate plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.evaluation import (
    auc_roc,
    confusion_at,
    pr_curve,
    sql_auc_roc,
    sql_confusion_at,
    sql_pr_curve,
)
from tests.conftest import SF_T2

# labels correlated-but-not-determined by the score → AUC strictly
# inside (0.5, 1), tie-rich when the score is quantized
LABEL = "(n_chars + 37 * (doc_id % 11)) % 5 < 2"
SCORE = "n_chars % 97"  # heavy ties: 97 distinct values over the corpus


def _docs(spark):
    return spark.read.parquet(f"{SF_T2}/documents.parquet")


def _labeled_docs(spark):
    return _docs(spark).select(
        "doc_id",
        F.expr(LABEL).alias("label"),
        F.expr(SCORE).cast("double").alias("score"),
    )


def _auc_pairs_reference(rows):
    """O(n²) Mann-Whitney: (concordant + ties/2) / (P·N)."""
    pos = [s for (lab, s) in rows if lab]
    neg = [s for (lab, s) in rows if not lab]
    if not pos or not neg:
        return None
    conc = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    return (conc + 0.5 * ties) / (len(pos) * len(neg))


def test_auc_matches_duckdb_twin(spark, duck):
    got = auc_roc(_labeled_docs(spark), "label", "score").collect()[0]
    want = duck.execute(
        sql_auc_roc(
            f"(SELECT doc_id, {LABEL} AS label, "
            f"CAST({SCORE} AS DOUBLE) AS score FROM documents)",
            "label",
            "score",
        )
    ).fetchone()
    assert (got["auc"], got["n_pos"], got["n_neg"]) == tuple(want)
    assert 0.4 < got["auc"] < 1.0 and got["n_pos"] > 0 and got["n_neg"] > 0


def test_auc_matches_pair_counting_reference_with_ties(spark):
    rows = [
        (i, i % 3 == 0, float((i * 7) % 13))  # many exact score ties
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, label boolean, score double")
    got = auc_roc(df, "label", "score").collect()[0]["auc"]
    want = _auc_pairs_reference([(lab, s) for (_, lab, s) in rows])
    assert got == pytest.approx(want, abs=1e-12)


def test_auc_exact_laws(spark):
    df = spark.createDataFrame(
        [(i, i % 4 == 0, float(i % 23)) for i in range(300)],
        "id long, label boolean, score double",
    )
    a = auc_roc(df, "label", "score").collect()[0]["auc"]
    flipped = df.select("id", (~F.col("label")).alias("label"), "score")
    b = auc_roc(flipped, "label", "score").collect()[0]["auc"]
    assert a + b == pytest.approx(1.0, abs=1e-15)  # exact complement law
    # perfect separation → exactly 1; constant score → exactly 0.5
    perfect = spark.createDataFrame(
        [(i, i >= 50, float(i)) for i in range(100)],
        "id long, label boolean, score double",
    )
    assert auc_roc(perfect, "label", "score").collect()[0]["auc"] == 1.0
    const = spark.createDataFrame(
        [(i, i % 2 == 0, 7.0) for i in range(100)],
        "id long, label boolean, score double",
    )
    assert auc_roc(const, "label", "score").collect()[0]["auc"] == 0.5


def test_auc_null_universe_and_degenerate(spark):
    rows = [(1, True, 2.0), (2, False, 1.0), (3, None, 9.0), (4, True, None)]
    df = spark.createDataFrame(rows, "id long, label boolean, score double")
    got = auc_roc(df, "label", "score").collect()[0]
    # NULL label and NULL score rows are outside the universe
    assert (got["auc"], got["n_pos"], got["n_neg"]) == (1.0, 1, 1)
    # single-class corpus → NULL auc, never a crash
    onecls = spark.createDataFrame(
        [(1, True, 2.0), (2, True, 1.0)], "id long, label boolean, score double"
    )
    got = auc_roc(onecls, "label", "score").collect()[0]
    assert got["auc"] is None and got["n_pos"] == 2 and got["n_neg"] == 0


def test_auc_round_to_bounds_the_window_and_quantizes(spark):
    df = spark.createDataFrame(
        [(i, i % 3 == 0, i / 997.0) for i in range(500)],
        "id long, label boolean, score double",
    )
    exact = auc_roc(df, "label", "score").collect()[0]["auc"]
    coarse = auc_roc(df, "label", "score", round_to=2).collect()[0]["auc"]
    # quantization only merges ranks — result stays a valid AUC near exact
    assert 0.0 <= coarse <= 1.0 and abs(coarse - exact) < 0.05
    # and the quantized universe matches quantizing ahead of the operator
    pre = df.select("id", "label", F.round("score", 2).alias("score"))
    assert (
        auc_roc(pre, "label", "score").collect()[0]["auc"] == coarse
    )


def test_two_level_plan_value_identical_and_partitioned(spark, monkeypatch):
    """Force the bucketed path on small data: value-identical to the
    global-window path (and to the twin), and the score-ordered window
    carries a REAL bucket partition spec."""
    import dwca_parquet_spark.operators.evaluation as E

    df = _labeled_docs(spark)
    global_auc = auc_roc(df, "label", "score").collect()[0]
    monkeypatch.setattr(E, "_AUC_GLOBAL_WINDOW_MAX", 10)
    monkeypatch.setattr(E, "_AUC_INPUT_SMALL_BYTES", 0)
    monkeypatch.setattr(E, "_AUC_DRIVER_MAX_BYTES", 0)
    forced = E.auc_roc(df, "label", "score")
    got = forced.collect()[0]
    assert tuple(got) == tuple(global_auc)
    plan = forced._jdf.queryExecution().executedPlan().toString()
    for ln in plan.splitlines():
        if "windowspecdefinition" in ln and "score" in ln:
            assert "windowspecdefinition(_b" in ln, ln


def test_pr_curve_matches_duckdb_twin(spark, duck):
    got = sorted(
        (
            r["threshold"], r["tp"], r["fp"], r["fn"],
            r["precision"], r["recall"],
        )
        for r in pr_curve(_labeled_docs(spark), "label", "score").collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            sql_pr_curve(
                f"(SELECT doc_id, {LABEL} AS label, "
                f"CAST({SCORE} AS DOUBLE) AS score FROM documents)",
                "label",
                "score",
            )
        ).fetchall()
    )
    assert got == want and len(got) > 10
    # identities at every operating point: tp+fn = P (recall denominator)
    p_total = got[0][1] + got[0][3]  # lowest threshold: tp+fn with tp max
    assert all(tp + fn == p_total for (_, tp, _, fn, _, _) in got)


def test_pr_curve_refuses_unbounded_distinct_scores(spark, monkeypatch):
    """round-9 guard (op-110 discipline): an un-quantized pr_curve over
    a large input measures the distinct-score count and refuses above
    the window bound with round_to guidance; the quantized call and
    small inputs are untouched."""
    import dwca_parquet_spark.operators.evaluation as E

    df = _labeled_docs(spark)
    monkeypatch.setattr(E, "_AUC_INPUT_SMALL_BYTES", 0)
    monkeypatch.setattr(E, "_AUC_GLOBAL_WINDOW_MAX", 10)
    with pytest.raises(ValueError, match="round_to"):
        E.pr_curve(df, "label", "score")
    # quantized: bounded by the grid → no refusal, curve intact
    got = E.pr_curve(df, "label", "score", round_to=0).collect()
    assert len(got) > 10


def test_confusion_matches_twin_and_identities(spark, duck):
    thr = 48.0
    got = confusion_at(_labeled_docs(spark), "label", "score", thr).collect()[0]
    want = duck.execute(
        sql_confusion_at(
            f"(SELECT doc_id, {LABEL} AS label, "
            f"CAST({SCORE} AS DOUBLE) AS score FROM documents)",
            "label",
            "score",
            thr,
        )
    ).fetchone()
    assert tuple(got) == tuple(want)
    n_universe = _docs(spark).count()
    assert got["tp"] + got["fp"] + got["tn"] + got["fn"] == n_universe
    # f1 is the harmonic mean of the reported precision/recall
    f1 = 2 * got["precision"] * got["recall"] / (
        got["precision"] + got["recall"]
    )
    assert got["f1"] == pytest.approx(f1, abs=1e-12)


def test_confusion_plan_is_one_aggregate(spark):
    out = confusion_at(_labeled_docs(spark), "label", "score", 10.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Sort" not in plan
    assert "Join" not in plan
    # the only exchange is the single-row final-aggregate gather
    assert plan.count("Exchange") <= 1


def test_auc_window_runs_over_aggregated_scores(spark, monkeypatch):
    """Mid-tier plan pin (driver tier disabled): the rank window must
    consume the per-distinct-score aggregate, never corpus rows — and
    the score-ordered window must be PARTITIONED by the prefix-sum
    bucket (the op-105 two-level shape): the only unpartitioned window
    in the plan is the ≤ n_buckets-row offset cumsum, never one
    ordered by score."""
    import dwca_parquet_spark.operators.evaluation as E

    monkeypatch.setattr(E, "_AUC_DRIVER_MAX_BYTES", 0)
    out = E.auc_roc(_labeled_docs(spark), "label", "score", round_to=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan and "HashAggregate" in plan
    first_window = plan.index("Window")
    # tree prints top-down: an aggregate BELOW the window appears later
    assert "HashAggregate" in plan[first_window:]
    # at this distinct count the MEASURED choice is the global window
    # (Catalyst folds the constant bucket out of the spec); the bucketed
    # path's partition-spec pin lives in
    # test_two_level_plan_value_identical_and_partitioned


def test_driver_tier_bit_identical_to_window_tier(spark, monkeypatch):
    """The round-9 driver tier (single-stage Arrow collect + NumPy rank
    reduce) must return BIT-identical rows to the window plan on the
    same input — including the float traps the NumPy side must handle
    deliberately: NaN scores pool into one tie group (both engines'
    GROUP BY semantics) and -0.0 ties with 0.0."""
    import dwca_parquet_spark.operators.evaluation as E

    base = _labeled_docs(spark)
    # parquet-backed input: the size estimate is real → the default
    # call takes the driver tier (no Window in the returned plan)
    via_driver = E.auc_roc(base, "label", "score").collect()[0]
    plan = E.auc_roc(base, "label", "score")._jdf.queryExecution()
    assert "Window" not in plan.executedPlan().toString()
    monkeypatch.setattr(E, "_AUC_DRIVER_MAX_BYTES", 0)
    via_window = E.auc_roc(base, "label", "score").collect()[0]
    assert tuple(via_driver) == tuple(via_window)
    # createDataFrame inputs are RDD-backed (unknown stats → careful
    # path), so exercise the driver tier on the float traps directly
    traps = spark.createDataFrame(
        [
            (True, float("nan")), (False, float("nan")),
            (True, -0.0), (False, 0.0), (True, 7.5),
        ],
        "label boolean, score double",
    )
    lab = E._labeled(traps, "label", "score", None)
    direct = E._auc_driver(lab).collect()[0]
    via_jvm = E.auc_roc(traps, "label", "score").collect()[0]
    assert tuple(direct) == tuple(via_jvm)
    # empty universe through the driver tier (parquet-backed, filter
    # removes every row): all-NULL row, same as the aggregate paths'
    # sum-over-nothing — and never a crash
    empty = base.filter(F.col("score") < -1)
    got = E.auc_roc(empty, "label", "score").collect()[0]
    assert tuple(got) == (None, None, None)
