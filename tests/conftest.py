"""Shared fixtures: one session-scoped SparkSession + DuckDB with the
fixture tables registered as views (mirroring the driver's oracle setup)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import SparkSession

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    # Deliberately a PLAIN session (not this repo's get_spark): the driver's
    # correctness gate builds its own SparkSession, so every query must work
    # without our builder's conf. Round 1's q16/q23/q24 crash was masked by
    # testing under get_spark() — never again.
    s = (
        SparkSession.builder.master("local[*]")
        .appName("dwca-parquet-spark-tests")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def duck():
    return duck_con(SF_T2)


# ---------------------------------------------------------------------------
# Slow lane (round 6, VERDICT r5 ask #7). The full suite (no -m filter) is
# and remains THE gate; `-m "not slow"` is the <5-minute iteration lane.
# Node ids measured >= 4 s by a full --durations run (2026-08-15); marking
# happens here (collection hook) rather than per-file so parametrized cases
# — e.g. three heavy driver-parity queries out of 50 — can be marked
# individually without restructuring their parametrize calls.
# ---------------------------------------------------------------------------
SLOW_NODE_IDS = {
    # round-7 rebalance (VERDICT r6 ask #7): quick lane had crept to
    # 388 s; the ≥4 s nodes below move to the slow lane (the full suite
    # stays THE gate). Durations measured 2026-08-15.
    "test_bloom.py::test_probe_no_false_negatives",
    "test_bottomk.py::test_bottomk_merge_law_and_idempotence",
    "test_embedding_clusters.py::test_block_pairs_autosize_and_blocking_invariance",
    "test_leakage_split.py::test_singletons_match_plain_hash_split",
    "test_phash.py::test_phash_finds_reencodes_exact_hash_misses",
    "test_pipeline_e2e.py::test_crawl_chain_leakage_fence_and_split_manifests",
    "test_properties.py::test_pair_jaccard_out_of_domain_cand_ids_cannot_reach_packing",
    "test_properties_r6.py::test_clean_controls_twin_fuzz",
    "test_properties_r6.py::test_quantile_bins_approx_contract_fuzz",
    "test_reports.py::test_corpus_card_url_diversity_panel",
    "test_semdedup.py::test_semdedup_incremental_equals_frozen_reference",
    "test_semdedup.py::test_semdedup_incremental_state_advance_and_plan_pin",
    "test_streaming_sketches.py::test_old_versions_pruned",
    "test_streaming_sketches.py::test_stream_fold_equals_batch_sketch",
    "test_sq.py::test_sq8_topk_recall_and_rerank",
    "test_sq.py::test_bq_hamming_topk_recall_and_rerank",
    "test_properties.py::test_html_extract_fuzz_parity",
    "test_properties.py::test_topk_matches_sorted_head",
    "test_text_ops.py::test_contamination_overlap_documents_parity",
    "test_shards.py::test_write_training_shards_deterministic",
    "test_streaming_sketches.py::test_replay_is_noop_and_crash_residue_ignored",
    "test_linkage.py::test_link_records_clusters",
    "test_reports.py::test_corpus_card_statistical_signals",
    "test_sampling_r6.py::test_token_budget_null_scores_kept_and_match_twin",
    "test_bloom.py::test_probe_false_positive_rate_bounded",
    "test_zorder.py::test_zorder_preserves_rows_and_skips_both_dims",
    "test_semdedup.py::test_semantic_dedup_planted_groups",
    "test_bottomk.py::test_bottomk_duckdb_parity",
    "test_cdc.py::test_diff_snapshots_round_trip",
    "test_gopher.py::test_select_to_token_budget_parity",
    "test_bottomk.py::test_bottomk_group_merge_law_and_estimates",
    "test_bottomk.py::test_bottomk_null_keys_dropped_both_engines",
    "test_bloom.py::test_bitmap_parity_duckdb",
    "test_bloom.py::test_dedup_incremental_equals_anti_join",
    "test_bloom.py::test_incremental_minhash_equals_cross_pairs_of_full_run",
    "test_bpe.py::test_bpe_fit_distributed_equals_driver",
    "test_catalog.py::test_csw_records_golden",
    "test_correctness.py::test_query_matches_oracle[q30_minhash_lsh_pairs]",
    "test_correctness.py::test_query_matches_oracle[q31_simhash]",
    "test_correctness.py::test_query_matches_oracle[q32_ngram_jaccard_top1]",
    "test_correctness.py::test_query_matches_oracle[q38_binary_features]",
    "test_correctness.py::test_query_matches_oracle[q44_dedup_clusters]",
    "test_correctness.py::test_query_matches_oracle[q61_dedup_keep_best]",
    "test_embedding_clusters.py::test_embedding_clusters_match_union_find",
    "test_fs.py::test_write_csv_single_file_uri",
    "test_fs.py::test_write_parquet_single_file_uri",
    "test_fs.py::test_write_versioned_uri_idempotent",
    "test_geometry.py::test_geoparquet_sink",
    "test_gopher.py::test_dedup_paragraphs_incremental_equivalence",
    "test_gopher.py::test_realize_mixture_parity",
    "test_graph.py::test_pagerank_constant_lineage",
    "test_graph.py::test_pagerank_matches_decimal_reference",
    "test_incremental_e2e.py::test_incremental_ingestion_equals_rebuild",
    "test_leakage_split.py::test_no_cluster_straddles_splits",
    "test_leakage_split.py::test_one_row_per_input_id",
    "test_leakage_split.py::test_planted_groups_share_split_and_naive_split_leaks",
    "test_nb_classifier.py::test_bigram_lm_parity_and_fluency",
    "test_nb_classifier.py::test_fit_deterministic_and_scores_separate",
    "test_packing.py::test_pack_sequences_budget_and_determinism",
    "test_pipeline_e2e.py::test_pretraining_pipeline_composes",
    "test_pq.py::test_adc_recall_beats_random",
    "test_pq.py::test_encode_matches_numpy_and_compresses",
    "test_pq.py::test_fit_deterministic_under_repartitioning",
    "test_pq.py::test_ivf_pq_bounds_candidates_and_recalls",
    "test_pq.py::test_quantization_error_decreases",
    "test_pq.py::test_rerank_improves_over_adc",
    "test_properties.py::test_asof_join_matches_naive",
    "test_properties.py::test_chunk_documents_reconstructs",
    "test_properties.py::test_csv_roundtrip",
    "test_properties.py::test_dedup_latest_idempotent",
    "test_properties.py::test_dedup_paragraphs_fuzz_parity",
    "test_properties.py::test_edit_distance_pairs_fuzz_complete",
    "test_properties.py::test_gopher_quality_fuzz_parity",
    "test_properties.py::test_hash_sample_nesting",
    "test_properties.py::test_hash_split_matches_python",
    "test_properties.py::test_interval_join_matches_naive",
    "test_properties.py::test_join_cardinality_laws",
    "test_properties.py::test_pair_jaccard_length_filter_lossless",
    "test_properties_r4.py::test_bloom_incremental_exactness",
    "test_properties_r4.py::test_diff_apply_reproduces_any_snapshot",
    "test_properties_r4.py::test_heavy_hitters_guarantee_holds",
    "test_properties_r4.py::test_rollup_fold_invariance",
    "test_reports.py::test_corpus_card_numbers_and_determinism",
    "test_service.py::test_generate_csw_and_geoapi",
    "test_service.py::test_http_skin_end_to_end",
    "test_sq.py::test_bq_mih_exact_within_radius",
    "test_streaming.py::test_stream_stream_attribution_join",
    "test_streaming_ingest.py::test_stream_ingest_dedups_and_is_idempotent",
    "test_streaming_ingest.py::test_stream_paragraph_dedup_and_replay",
    "test_text_ops.py::test_contamination_overlap_sf01_timed",
    "test_text_ops.py::test_dsir_logratio_parity_and_separation",
    # round-8 rebalance (durations measured 2026-08-15, full sweep +
    # targeted run): the ≥4 s round-7/8 nodes move to the slow lane so
    # the quick lane stays ≤ ~5 min; the full suite remains THE gate.
    "test_pca.py::test_state_update_equals_refit_bit_exact",
    "test_evaluation.py::test_auc_matches_duckdb_twin",
    "test_evaluation.py::test_auc_exact_laws",
    "test_streaming_ingest.py::test_stream_semantic_dedup_and_replay",
    "test_ivf_state.py::test_ivf_append_equals_rebuild_and_plan_pin",
    "test_ivf_state.py::test_ivf_stored_matches_one_shot",
    "test_reports.py::test_corpus_card_no_repeats_panel_row",
    "test_reports.py::test_corpus_card_dominant_repeats_panel",
    "test_reports.py::test_corpus_card_cross_source_overlap_panel",
    "test_invindex.py::test_rebuild_overwrites",
    "test_fileindex.py::test_append_extends_index_without_touching_old_rows",
    "test_group_hh.py::test_partitioning_never_breaks_guarantee",
    "test_evaluation.py::test_auc_round_to_bounds_the_window_and_quantizes",
    "test_drift.py::test_identity_law_on_real_corpus",
    "test_drift.py::test_planted_drift_moves_matching_panels",
    "test_evaluation.py::test_two_level_plan_value_identical_and_partitioned",
    "test_evaluation.py::test_auc_matches_pair_counting_reference_with_ties",
    # round-9 rebalance: the new multi-second gates (streaming drift
    # fold/wiring, incremental clusters, the segmented-index append
    # laws, the three-tier AUC bit-identity) move to the slow lane;
    # each module keeps at least one quick-lane node.
    "test_streaming_drift.py::test_fold_equals_one_shot_corpus_drift_exactly",
    "test_streaming_drift.py::test_stream_wiring_converges",
    "test_incremental_clusters.py::test_incremental_equals_from_scratch_incl_transitive_chain",
    "test_incremental_clusters.py::test_untouched_components_pass_through_and_two_batches_compose",
    "test_invindex.py::test_append_equals_rebuild_and_direct[data quality]",
    "test_invindex.py::test_append_equals_rebuild_and_direct[the]",
    "test_invindex.py::test_append_equals_rebuild_and_direct[model training data corpus]",
    "test_invindex.py::test_append_never_rewrites_existing_segments",
    "test_invindex.py::test_loaded_index_probe_equals_per_call",
    "test_evaluation.py::test_driver_tier_bit_identical_to_window_tier",
    # round-9 late additions ≥ 4 s (each module keeps quick-lane nodes)
    "test_streaming_activity.py::test_fold_equals_one_shot_for_both_panels",
    "test_streaming_activity.py::test_stream_wiring_converges",
    "test_hybrid.py::test_rrf_fuses_ranks_with_published_arithmetic",
    "test_graph.py::test_triangle_count_star_and_path_have_none",
    "test_streaming_activity.py::test_trend_fold_equals_one_shot_exactly",
    "test_streaming_activity.py::test_trend_stream_wiring_converges",
    "test_correctness.py::test_query_matches_oracle[q65_resample_ffill]",
    "test_correctness.py::test_query_matches_oracle[q69_triangles]",
    "test_correctness.py::test_query_matches_oracle[q68_hybrid_rrf]",
    "test_correctness.py::test_query_matches_oracle[q76_session_transitions]",
    "test_streaming_activity.py::test_anomaly_and_cusum_reports_equal_one_shot",
    # round-10 additions ≥ 4 s
    "test_triangles_incremental.py::test_append_equals_recount_random_splits",
    "test_triangles_incremental.py::test_append_dedupes_reversed_duplicate_and_seen_edges",
    "test_triangles_incremental.py::test_append_cases_split_exactly",
    "test_triangles_incremental.py::test_earlier_segments_byte_pinned_and_replay_noop",
    "test_triangles_incremental.py::test_planted_hub_append",
    "test_lid.py::test_lid_beats_stopword_heuristic_on_short_docs",
    "test_streaming_funnel.py::test_fold_equals_one_shot_funnel",
    "test_streaming_funnel.py::test_replay_is_noop_and_duplicates_collapse",
    "test_streaming_funnel.py::test_stream_wiring_converges",
    "test_graph.py::test_pagerank_resume_equals_straight_run",
    "test_graph.py::test_kcore_matches_reference_and_planted_cliques",
    "test_triangles_incremental.py::test_stream_wiring_converges",
    "test_streaming_vdist.py::test_fold_equals_one_shot_quantiles",
    "test_streaming_vdist.py::test_stream_wiring_converges",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nid = item.nodeid.replace("tests/", "", 1)
        if nid in SLOW_NODE_IDS:
            item.add_marker(pytest.mark.slow)
