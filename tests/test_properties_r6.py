"""Round-6 property fuzz: quantile_bins_approx vs exact ntile over
hypothesis-generated score distributions (including heavy ties), and
the unicode control-strip twin over generated codepoint soup."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dwca_parquet_spark.operators.sampling import (
    quantile_bins,
    quantile_bins_approx,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SETTINGS
@given(
    scores=st.lists(
        st.one_of(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
            st.sampled_from([0.0, 1.0, -1.0, 42.0]),  # force tie mass
        ),
        min_size=5,
        max_size=300,
    ),
    n_bins=st.integers(min_value=2, max_value=12),
)
def test_quantile_bins_approx_contract_fuzz(spark, scores, n_bins):
    """For ANY score distribution: bins in 1..n_bins, monotone in
    score, ties share a bin, and on tie-free inputs every row lands
    within one bin of the exact ntile."""
    rows = [(i, float(s)) for i, s in enumerate(scores)]
    df = spark.createDataFrame(rows, "k long, s double")
    out = quantile_bins_approx(df, "s", "k", n_bins).collect()
    assert all(1 <= r["bin"] <= n_bins for r in out)
    by_score = sorted(out, key=lambda r: (r["s"], r["k"]))
    bins = [r["bin"] for r in by_score]
    assert all(a <= b for a, b in zip(bins, bins[1:]))  # monotone
    per_score = {}
    for r in out:
        per_score.setdefault(r["s"], set()).add(r["bin"])
    assert all(len(v) == 1 for v in per_score.values())  # ties share

    if len(set(scores)) == len(scores):  # tie-free → compare to exact
        exact = {
            r["k"]: r["bin"]
            for r in quantile_bins(df, "s", "k", n_bins).collect()
        }
        approx = {r["k"]: r["bin"] for r in out}
        assert max(abs(approx[k] - exact[k]) for k in exact) <= 1


@SETTINGS
@given(
    texts=st.lists(
        st.text(
            alphabet=st.one_of(
                st.characters(min_codepoint=0x20, max_codepoint=0x7E),
                st.sampled_from(
                    "\t\n\x01\x1f\x7f\x85\ufeff\u200b\u200c"
                    "\u200d\u2060\u00a0\u2002\u2009\u3000"
                    "\u2028\u2029\u00e9\u00df\u4e2d"
                ),
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_clean_controls_twin_fuzz(spark, duck, texts):
    """Generated codepoint soup: Spark and DuckDB produce the identical
    cleaned text, and cleaning is idempotent."""
    from dwca_parquet_spark.operators.unicode import (
        clean_controls,
        sql_clean_controls,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, t string")
    got = sorted(
        (r["id"], r["text"]) for r in clean_controls(df, "id", "t").collect()
    )
    duck.execute("CREATE OR REPLACE TABLE ufuzz (id BIGINT, t VARCHAR)")
    duck.executemany("INSERT INTO ufuzz VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in duck.execute(sql_clean_controls("ufuzz", "id", "t")).fetchall()
    )
    assert got == want
    # idempotence
    again = sorted(
        (r["id"], r["text"])
        for r in clean_controls(
            spark.createDataFrame(got, "id long, t string"), "id", "t"
        ).collect()
    )
    assert again == got
