"""The external driver attests correctness for only the FIRST 50 entries
of __spark_entry__.queries(). These tests freeze the guarantee that every
SURVEY.md §2 operator family has at least one oracle-bearing
representative inside that window (VERDICT.md round-1 top item)."""

from __future__ import annotations

from database_to_bigquery_spark.registry import DRIVER_PRIORITY, all_specs

# family -> names, any one of which attests the family. Keep in sync with
# SURVEY.md §2 / VERDICT.md operator table.
FAMILY_REPRESENTATIVES = {
    "S1": ["s1_catalog_allowlist"],
    "S2": ["s2_full_scan"],
    "S3": ["s3_incremental_day_slice"],
    "S4": ["s4_datetime_format"],
    "S5/S6": ["s5_s6_rename_drop"],
    "S7": ["s7_bool_cast"],
    "S9": ["s9_empty_extract"],
    "S10": ["s10_schema_enforce"],
    "S14": ["s14_audit_counts"],
    "X1": ["q1_pricing_summary", "q_filter_project"],
    "X2": ["q3_shipping_priority", "q_full_outer_nations"],
    "X3": ["q_semi_join", "q_anti_join"],
    "X4": ["q_range_join_bands", "q_asof_join", "q_self_theta_join"],
    "X5": ["q_hash_agg_functions", "q1_pricing_summary"],
    "X6": ["q_rollup", "q_cube", "q_grouping_sets"],
    "X7": ["q_percentiles", "q_bitmap_distinct_rollup", "q_histogram_equi_depth"],
    "X8": ["q_window_rank", "q_window_range_frame", "q_global_ranks_scalable"],
    "X9": ["q_topk_per_group", "q18_large_volume_customers", "q_lateral_topn"],
    "X10": ["q_set_ops", "q_union_by_name_drift"],
    "X11": ["q_json_extract", "q_variant_json", "q_from_xml"],
    "X12": [
        "dedup_exact_text",
        "dedup_clusters",
        "dedup_minhash_lsh",
        # r08: the quality-argmax cluster representative carries X12
        # while dedup_exact_text rotates out
        "dedup_cluster_keep_best",
    ],
    "X13": [
        "sim_topk_bruteforce",
        "sim_topk_ivf",
        "sim_topk_sq8",
        # r08: the IVF+PQ form carries X13 while bruteforce rotates out
        "sim_topk_ivfpq",
    ],
    # text_quality_threshold_sweep is an X14 attestor per VERDICT §2 —
    # it carries the family while text_stats rotates out (r07)
    "X14": [
        "text_stats",
        "text_tfidf_top_terms",
        "text_repetition_filter",
        "text_quality_threshold_sweep",
    ],
    # the WebDataset duplex + perceptual hash are X15 attestors per
    # VERDICT §2 (multimodal columns + WebDataset duplex)
    "X15": [
        "mm_binary_metadata",
        "mm_resize",
        "mm_webdataset_write",
        "mm_phash_neardup",
    ],
    "X16": ["stream_tumbling_hourly", "stream_stateful_user_totals"],
    "X17": ["udf_pandas_scalar", "udf_grouped_agg_weighted", "udtf_word_chunks"],
    # round-2/3 flagship families — each lists the attested r02 member
    # AND the round-3 rotation partner, either of which attests it
    "X12+ semantic dedup": ["dedup_semdedup", "sim_semantic_decontamination"],
    "X13+ PQ compression": ["sim_topk_pq", "sim_topk_ivfpq"],
    "X14+ trained filter": ["text_quality_linear_probe", "text_bigram_kn_score"],
    "governance": [
        "q_gdpr_erasure_audit",
        "q_freshness_sla_audit",
        "q_l_diversity_audit",
        # r09: k-anonymity carries governance while l-diversity rotates out
        "q_k_anonymity_audit",
    ],
    "ops/backfill": ["q_backfill_plan"],
    "CDC/merge": ["q_snapshot_diff_cdc", "q_merge_with_delete", "q_merge_upsert"],
    # round-4 rotation partners (previously unattested flagships)
    "X13+ kNN join": ["sim_knn_join_exact"],
    "X15+ shard writer": ["mm_webdataset_write", "q_webdataset_shard_plan"],
    "ts forecasting": ["ts_holt_winters", "ts_stl_decompose", "ts_stl_anomaly"],
    "SQL recursion": ["q_recursive_month_spine"],
    # round-5 rotation partners (r4 flagships, previously unattested)
    "SCD2 time travel": [
        "ts_scd2_as_of_snapshot",
        "ts_time_travel_diff",
        "q_scd2_apply_changes",
    ],
    "X14+ retention sweep": ["text_quality_threshold_sweep"],
    "X7+ equi-depth": ["q_histogram_equi_depth", "q_histogram_equi_depth_approx"],
    # round-6 rotation partners (previously unattested families)
    "X5+ IVM": ["q_ivm_join_maintenance"],
    "X12+ incremental clusters": [
        "dedup_incremental_clusters",
        "dedup_clusters_lsh",
    ],
    "X12+ paragraph dedup": ["text_paragraph_dedup"],
    "ops/table checksum": ["q_table_checksum", "q_merkle_bucket_diff"],
    # round-6 rotation partners
    "governance DP": ["q_dp_noisy_counts", "q_dp_noisy_sum"],
    "training-prep packing": ["llm_chunk_manifest", "text_pack_sequences"],
    "X15+ perceptual hash": ["mm_phash_neardup", "dedup_simhash"],
    # round-7 rotation partners (first attestation for each family)
    "X13+ numerics": ["sim_covariance_matrix", "sim_whiten_identity_check"],
    "training-prep curriculum": ["llm_curriculum_order"],
    "behavioral funnels": ["q_funnel_time_windowed", "q_funnel_conversion"],
    # retention curves are the survival function of churn — cohort
    # retention attests this family while km/streaks rotate out (r08)
    "behavioral survival/streaks": [
        "q_survival_km",
        "q_activity_streaks",
        "q_cohort_retention",
    ],
    # r08: chi-square independence carries statistics while ks_test and
    # corr_matrix rotate out
    "statistics": ["q_ks_test", "q_corr_matrix", "q_chi_square_independence"],
    # round-8 rotation partners (first attestation for each family)
    "ts gapfill": ["ts_gapfill_hourly"],
    "sampling": ["q_stratified_sample", "q_class_balanced_sample"],
    "X11+ VARIANT": ["q_variant_json"],
}

DRIVER_SAMPLE = 50


def test_priority_prefix_is_applied_and_complete():
    specs = all_specs()
    names = list(specs)
    assert names[: len(DRIVER_PRIORITY)] == list(DRIVER_PRIORITY)
    assert len(DRIVER_PRIORITY) <= DRIVER_SAMPLE
    assert len(set(DRIVER_PRIORITY)) == len(DRIVER_PRIORITY)
    # the reorder must not drop or duplicate anything
    assert len(names) == len(set(names))


def test_every_family_has_oracle_bearing_representative_in_sample():
    specs = all_specs()
    window = set(list(specs)[:DRIVER_SAMPLE])
    for family, reps in FAMILY_REPRESENTATIVES.items():
        in_window = [n for n in reps if n in window]
        assert in_window, f"family {family} has no representative in driver sample"
        # at least one representative must carry a DuckDB oracle so the
        # driver records a full rows+schema+hash row, not rows-only
        assert any(
            specs[n].oracle is not None for n in in_window
        ), f"family {family} only has rows-only representatives in sample"


def test_production_preset_excludes_scale_unsafe_twins():
    """The production-profile view must exclude exactly the queries the
    census marks as intentionally scale-unsafe (non-empty scale_twin),
    and every exclusion's named replacement must itself be a registered
    PRODUCTION query (a twin pointing at another excluded query would
    leave no scale-safe path)."""
    from database_to_bigquery_spark.registry import production_specs

    specs = all_specs()
    prod = production_specs()
    excluded = {n for n in specs if n not in prod}
    assert excluded == {n for n, s in specs.items() if s.scale_twin}
    # known members: the documented exact twins
    for name in (
        "q_ntile_stats",
        "dedup_ngram_jaccard",
        "dedup_embedding_cosine",
        "dedup_triangle_count",
    ):
        assert name in excluded, name
    for n in excluded:
        twin = specs[n].scale_twin
        assert twin in prod, f"{n}'s scale twin {twin!r} is not a production query"
