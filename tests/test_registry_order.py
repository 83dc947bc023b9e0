"""The external driver attests correctness for only the FIRST 50 entries
of __spark_entry__.queries(). These tests freeze the guarantee that every
SURVEY.md §2 operator family stays COVERED by driver attestation — where
coverage is ROLLING (r10, VERDICT r9 task 3): a family counts covered if
any representative was attested green within the last ATTESTATION_WINDOW
rounds (read from the committed CORRECTNESS_r*.json history), because the
driver samples exactly the 50-entry window each round, so an in-window
seat this round IS an attestation this round. Only a family whose
attestations have EXPIRED must hold an in-window oracle-bearing seat.
This is what frees ~all 50 seats per round for the never-attested
backlog instead of pinning 45/50 on families already proven green
rounds ago."""

from __future__ import annotations

import glob
import json
import os
import re

from database_to_bigquery_spark.registry import DRIVER_PRIORITY, all_specs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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
    "X2": ["q3_shipping_priority", "q_full_outer_nations", "q7_volume_shipping"],
    "X3": ["q_semi_join", "q_anti_join", "q22_dormant_customers"],
    "X4": [
        "q_range_join_bands",
        "q_asof_join",
        "q_self_theta_join",
        "ts_point_in_time_join",
    ],
    "X5": ["q_hash_agg_functions", "q1_pricing_summary", "q_stats_moments"],
    "X6": ["q_rollup", "q_cube", "q_grouping_sets"],
    "X7": [
        "q_percentiles",
        "q_bitmap_distinct_rollup",
        "q_histogram_equi_depth",
        "q_approx_topk",
        "q_theta_sketch_setops",
    ],
    "X8": ["q_window_rank", "q_window_range_frame", "q_global_ranks_scalable"],
    "X9": [
        "q_topk_per_group",
        "q18_large_volume_customers",
        "q_lateral_topn",
        "q15_top_supplier",
    ],
    "X10": ["q_set_ops", "q_union_by_name_drift"],
    "X11": [
        "q_json_extract",
        "q_variant_json",
        "q_from_xml",
        "q_map_functions",
        "q_fuzzy_levenshtein",
    ],
    "X12": [
        "dedup_exact_text",
        "dedup_clusters",
        "dedup_minhash_lsh",
        "dedup_cluster_keep_best",
        "dedup_keep_best",
        "dedup_containment",
    ],
    "X13": [
        "sim_topk_bruteforce",
        "sim_topk_ivf",
        "sim_topk_sq8",
        "sim_topk_ivfpq",
        "sim_hybrid_rrf",
        "sim_mmr_rerank",
    ],
    "X14": [
        "text_stats",
        "text_tfidf_top_terms",
        "text_repetition_filter",
        "text_quality_threshold_sweep",
        "text_lang_id",
        "text_token_count",
        "text_fingerprint",
        "text_pii_scrub",
        "text_bm25_scores",
    ],
    "X15": [
        "mm_binary_metadata",
        "mm_resize",
        "mm_webdataset_write",
        "mm_phash_neardup",
        "mm_caption_pairs",
        "mm_audio_frames",
    ],
    "X16": [
        "stream_tumbling_hourly",
        "stream_stateful_user_totals",
        "stream_sliding_windows",
    ],
    "X17": [
        "udf_pandas_scalar",
        "udf_grouped_agg_weighted",
        "udtf_word_chunks",
    ],
    "X12+ semantic dedup": ["dedup_semdedup", "sim_semantic_decontamination"],
    "X13+ PQ compression": ["sim_topk_pq", "sim_topk_ivfpq"],
    "X14+ trained filter": ["text_quality_linear_probe", "text_bigram_kn_score"],
    "governance": [
        "q_gdpr_erasure_audit",
        "q_freshness_sla_audit",
        "q_l_diversity_audit",
        "q_k_anonymity_audit",
    ],
    "ops/backfill": ["q_backfill_plan", "q_compaction_binpack"],
    "CDC/merge": ["q_snapshot_diff_cdc", "q_merge_with_delete", "q_merge_upsert"],
    "X13+ kNN join": ["sim_knn_join_exact", "sim_knn_join_ivf2"],
    "X15+ shard writer": ["mm_webdataset_write", "q_webdataset_shard_plan"],
    "ts forecasting": ["ts_holt_winters", "ts_stl_decompose", "ts_stl_anomaly"],
    "SQL recursion": ["q_recursive_month_spine"],
    "SCD2 time travel": [
        "ts_scd2_as_of_snapshot",
        "ts_time_travel_diff",
        "q_scd2_apply_changes",
    ],
    "X14+ retention sweep": ["text_quality_threshold_sweep"],
    "X7+ equi-depth": ["q_histogram_equi_depth", "q_histogram_equi_depth_approx"],
    "X5+ IVM": ["q_ivm_join_maintenance"],
    "X12+ incremental clusters": [
        "dedup_incremental_clusters",
        "dedup_clusters_lsh",
    ],
    "X12+ paragraph dedup": ["text_paragraph_dedup"],
    "ops/table checksum": ["q_table_checksum", "q_merkle_bucket_diff"],
    "governance DP": ["q_dp_noisy_counts", "q_dp_noisy_sum"],
    "training-prep packing": ["llm_chunk_manifest", "text_pack_sequences"],
    "X15+ perceptual hash": ["mm_phash_neardup", "dedup_simhash"],
    "X13+ numerics": ["sim_covariance_matrix", "sim_whiten_identity_check"],
    "training-prep curriculum": ["llm_curriculum_order"],
    "behavioral funnels": ["q_funnel_time_windowed", "q_funnel_conversion"],
    "behavioral survival/streaks": [
        "q_survival_km",
        "q_activity_streaks",
        "q_cohort_retention",
    ],
    "statistics": [
        "q_ks_test",
        "q_corr_matrix",
        "q_chi_square_independence",
        "q_stats_moments",
        "q_benford_test",
    ],
    "ts gapfill": ["ts_gapfill_hourly"],
    "sampling": [
        "q_stratified_sample",
        "q_class_balanced_sample",
        "q_weighted_median",
        "q_median_quantiles",
    ],
    "X11+ VARIANT": ["q_variant_json"],
}

DRIVER_SAMPLE = 50
# A family's attestation stays valid this many rounds. The driver
# attests the 50-seat window every round, so a family rotated in at
# round R is covered through R + ATTESTATION_WINDOW - 1 and must
# rotate back in by then. 4 rounds × ~50 seats ≈ 200 attestation
# slots per window-lifetime — enough to keep all ~50 families fresh
# while still clearing the never-attested backlog.
ATTESTATION_WINDOW = 4


def attestation_history() -> tuple[dict[str, int], int]:
    """(name -> latest round attested GREEN, latest round on record)
    from the committed CORRECTNESS_r*.json files. A row counts green
    when it recorded no error and its available checks passed (oracle
    rows: rows+schema+hash; rows-only rows: ran with err None)."""
    latest: dict[str, int] = {}
    max_round = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        for name, row in json.load(open(path)).items():
            if row.get("err") not in (None, "no_oracle"):
                continue
            checks = [
                row.get(k)
                for k in ("rows_match", "schema_match", "hash_match")
                if row.get(k) is not None
            ]
            if checks and not all(checks):
                continue
            latest[name] = max(latest.get(name, 0), rnd)
    return latest, max_round


def expiring_families(horizon: int = 1) -> list[str]:
    """Families whose rolling attestation lapses within `horizon`
    rounds unless re-attested — the rotation worklist for the next
    window. (Helper for builders, exercised by the coverage test.)"""
    latest, max_round = attestation_history()
    out = []
    for family, reps in FAMILY_REPRESENTATIVES.items():
        last = max((latest.get(r, 0) for r in reps), default=0)
        in_next_window = any(r in DRIVER_PRIORITY[:DRIVER_SAMPLE] for r in reps)
        if not in_next_window and last and last <= max_round - ATTESTATION_WINDOW + horizon:
            out.append(family)
    return out


def test_priority_prefix_is_applied_and_complete():
    specs = all_specs()
    names = list(specs)
    assert names[: len(DRIVER_PRIORITY)] == list(DRIVER_PRIORITY)
    assert len(DRIVER_PRIORITY) <= DRIVER_SAMPLE
    assert len(set(DRIVER_PRIORITY)) == len(DRIVER_PRIORITY)
    # the reorder must not drop or duplicate anything
    assert len(names) == len(set(names))


def test_every_family_covered_by_rolling_attestation_or_window_seat():
    """A family is covered if (a) attested green within the last
    ATTESTATION_WINDOW rounds (the driver re-attests the window every
    round, so a seat in the CURRENT window also refreshes coverage
    next round), or (b) it holds an oracle-bearing seat in the current
    window. Families covered by neither have lapsed — rotate them
    back in."""
    specs = all_specs()
    window = set(list(specs)[:DRIVER_SAMPLE])
    latest, max_round = attestation_history()
    floor = max_round - ATTESTATION_WINDOW + 1
    for family, reps in FAMILY_REPRESENTATIVES.items():
        fresh = [n for n in reps if latest.get(n, 0) >= floor]
        in_window = [n for n in reps if n in window and specs[n].oracle is not None]
        assert fresh or in_window, (
            f"family {family} has neither a green attestation since round "
            f"{floor} nor an oracle-bearing seat in the driver window"
        )


def test_window_spends_free_seats_on_never_attested_backlog():
    """While a never-attested backlog exists, seats not needed for
    family coverage must go to first-timers — the structural fix for
    the 130-query attestation backlog (VERDICT r9 task 3)."""
    specs = all_specs()
    window = list(specs)[:DRIVER_SAMPLE]
    latest, _ = attestation_history()
    backlog = [n for n in specs if n not in latest and specs[n].oracle is not None]
    first_timers = [n for n in window if n not in latest]
    if len(backlog) >= 15:
        assert len(first_timers) >= 15, (
            f"only {len(first_timers)} first-timer seats while "
            f"{len(backlog)} oracle-bearing queries were never attested"
        )


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
