"""Physical-plan audit over every declared query.

For each ``queries()`` entry, inspects the executed plan string for the
anti-patterns that would not survive 100 TB and prints one line per query:

- CartesianProduct — always a bug at scale;
- BroadcastNestedLoopJoin — correct ONLY when one side is a bounded
  literal/dimension table (q41's 3-row band table, bounded query sets);
- BatchEvalPython — a row-at-a-time Python UDF in the plan (the Arrow
  paths show ArrowEvalPython / mapInPandas instead);
- Exchange count — shuffles; flagged only informationally.

Exit code 1 if a CartesianProduct or BatchEvalPython appears anywhere, or
a BroadcastNestedLoopJoin appears outside the allowlist.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

# queries where a nested-loop/broadcast theta join IS the right plan:
# bounded side is a literal band table or an explicitly bounded query set.
BNLJ_OK = {
    "q41_range_join",        # 3-row literal band table
    "q32_ngram_jaccard_top1", # bounded query set vs corpus (exact baseline)
    "q56_edit_distance",      # bounded candidate set, broadcast verifier
    "q21_scalar_subquery",    # 1-row broadcast mean (scalar subquery shape)
    "q57_tfidf_top_terms",    # 1-row broadcast corpus size
    "q33_knn_bruteforce",     # broadcast bounded query set, != predicate
    "q63_skew_profile",       # 1-row broadcast total for row_share
    "q68_hybrid_rrf",         # 1-row broadcast prepped query vector
    "q69_triangles",          # combining three 1-row global aggregates
    "q71_retrieval_eval",     # q33's broadcast bounded query set (!=)
    "q72_rolling_actives",    # 1-row broadcast max-bucket clip
}


def main() -> int:
    from dwca_parquet_spark import queries as Q
    from dwca_parquet_spark.cache import release_caches
    from dwca_parquet_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    bad = 0
    for name, fn in Q.QUERIES.items():
        try:
            plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {type(exc).__name__}: {exc}"[:200])
            bad += 1
            continue
        finally:
            release_caches()
            spark.catalog.clearCache()
        cart = plan.count("CartesianProduct")
        bnlj = plan.count("BroadcastNestedLoopJoin")
        pyudf = plan.count("BatchEvalPython")
        arrow = plan.count("ArrowEvalPython") + plan.count("FlatMapGroupsInPandas") \
            + plan.count("MapInPandas")
        ex = plan.count("Exchange")
        flags = []
        if cart:
            flags.append(f"CARTESIAN x{cart}")
            bad += 1
        if pyudf:
            flags.append(f"PY-UDF x{pyudf}")
            bad += 1
        if bnlj and name not in BNLJ_OK:
            flags.append(f"BNLJ x{bnlj}")
            bad += 1
        note = ("  <-- " + ", ".join(flags)) if flags else ""
        print(f"{name}: exchanges={ex} bnlj={bnlj} arrow={arrow}{note}")
    spark.stop()
    print(f"\n{'FAIL' if bad else 'OK'}: {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
