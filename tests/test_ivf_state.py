"""Gates for the stored IVF index (SURVEY §2 op 120, round 7): the
incremental column for the ANN ladder. (1) a state built over A then
appended with B answers queries IDENTICALLY to a state built over A∪B
under the same frozen centroids; (2) the stored probe reproduces the
one-shot ivf_topk row-for-row when the state covers the same corpus
(same centroids protocol, same ranking math, same tie-break); (3) the
append plan never touches indexed vectors (one distinct assignment
expression — the batch's)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.similarity import (
    ivf_append,
    ivf_state,
    ivf_topk,
    ivf_topk_stored,
)

K_CELLS = 8
DIM = 16


def _vec_df(spark, ids, rng):
    return spark.createDataFrame(
        [
            (int(i), [rng.uniform(-1, 1) for _ in range(DIM)])
            for i in ids
        ],
        "vid long, vec array<float>",
    )


def _topk_set(df):
    return sorted(
        (r["query_id"], r["cand_id"], r["cosine"]) for r in df.collect()
    )


def test_ivf_stored_matches_one_shot(spark):
    rng = random.Random(20260815)
    df = _vec_df(spark, range(120), rng)
    cents, inv = ivf_state(df, "vid", "vec", K_CELLS)
    queries = df.filter(F.col("vid") < 10)
    got = _topk_set(
        ivf_topk_stored(queries, cents, inv, "vid", "vec", k=5, nprobe=2)
    )
    want = _topk_set(
        ivf_topk(
            df, "vid", "vec", query_ids_below=10, k=5,
            k_cells=K_CELLS, nprobe=2,
        )
    )
    assert got == want and len(got) == 10 * 5


def test_ivf_append_equals_rebuild_and_plan_pin(spark, tmp_path):
    import re

    rng = random.Random(7)
    # A holds the lowest ids, so state(A) and state(A∪B) share the
    # deterministic centroid protocol — the honest rebuild reference
    a = _vec_df(spark, range(100), rng)
    b = _vec_df(spark, range(200, 260), rng)
    cents, inv_a = ivf_state(a, "vid", "vec", K_CELLS)

    # the documented flow: state lives as parquet partitioned on cell
    spath = str(tmp_path / "inv")
    inv_a.write.partitionBy("cell").parquet(spath)
    appended = ivf_append(b, cents, "vid", "vec")
    appended.write.partitionBy("cell").mode("append").parquet(spath)
    stored = spark.read.parquet(spath)

    queries = _vec_df(spark, range(300, 310), rng)
    got = ivf_topk_stored(
        queries, cents, stored, "vid", "vec", k=5, nprobe=2
    )
    got_set = _topk_set(got)

    both = a.unionByName(b)
    cents2, inv2 = ivf_state(both, "vid", "vec", K_CELLS)
    # frozen-quantizer sanity: A∪B's deterministic centroids ARE A's
    assert sorted(tuple(r) for r in cents.collect()) == sorted(
        tuple(r) for r in cents2.collect()
    )
    want_set = _topk_set(
        ivf_topk_stored(queries, cents2, inv2, "vid", "vec", k=5, nprobe=2)
    )
    assert got_set == want_set and len(got_set) == 10 * 5

    # PLAN PIN: the append assigns ONLY the batch — one distinct
    # assignment expression in its plan, and the probe plan contains
    # none over the stored side (state rows come from the parquet scan)
    plan_append = (
        ivf_append(b, cents, "vid", "vec")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(set(re.findall(r"cells_of\(svec#(\d+)", plan_append))) == 1
    plan_probe = got._jdf.queryExecution().executedPlan().toString()
    # the probe's only Arrow assignment is the QUERY-side nprobe lookup
    assert len(set(re.findall(r"cells_of\(svec#(\d+)", plan_probe))) == 1


def test_ivf_state_needs_enough_vectors(spark):
    rng = random.Random(1)
    with pytest.raises(ValueError):
        ivf_state(_vec_df(spark, range(4), rng), "vid", "vec", K_CELLS)
