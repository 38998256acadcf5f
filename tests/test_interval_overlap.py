"""interval_overlap_join semantic gates (SURVEY §2.G op 148). The
sf0.01 theta-join twin is q73 (test_correctness.py); these pin the
half-open overlap semantics and the responsibility-bucket dedup on
hand intervals."""

from __future__ import annotations

from dwca_parquet_spark.operators.relational import interval_overlap_join


def _iv(spark, rows):
    return spark.createDataFrame(rows, "id bigint, lo bigint, hi bigint")


def _pairs(spark, a, b, w):
    out = interval_overlap_join(
        _iv(spark, a), _iv(spark, b), "lo", "hi", bucket_width=w
    )
    return sorted((r["id"], r["r_id"]) for r in out.collect())


def test_overlap_across_many_buckets_counted_once(spark):
    # both intervals span buckets 0..9 at w=10: the pair must appear
    # exactly once despite sharing ten join buckets
    a = [(1, 0, 100)]
    b = [(2, 5, 95)]
    assert _pairs(spark, a, b, w=10) == [(1, 2)]


def test_half_open_touching_is_not_overlap(spark):
    a = [(1, 0, 50)]
    b = [(2, 50, 100), (3, 49, 60)]  # touching at 50 excluded; 49 overlaps
    assert _pairs(spark, a, b, w=10) == [(1, 3)]


def test_containment_and_disjoint(spark):
    a = [(1, 10, 90), (2, 200, 210)]
    b = [(3, 40, 50), (4, 0, 300), (5, 95, 99)]
    # 1 contains 3; 4 contains both a-intervals; 5 disjoint from 1
    assert _pairs(spark, a, b, w=25) == [(1, 3), (1, 4), (2, 4)]


def test_all_columns_survive_with_prefix(spark):
    a = [(1, 0, 10)]
    b = [(9, 5, 15)]
    out = interval_overlap_join(
        _iv(spark, a), _iv(spark, b), "lo", "hi", bucket_width=4
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id"], r["lo"], r["hi"]) == (1, 0, 10)
    assert (r["r_id"], r["r_lo"], r["r_hi"]) == (9, 5, 15)
