"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Key ordering: the driver's correctness gate covers the first 50
registered keys per round, so ``queries()`` emits keys in a rotating
priority order — keys without a hard driver verdict yet come first
(oracle-backed ones before weak rows-only ones), keys already verified
green in a previous round rotate to the back.  ``_DRIVER_VERIFIED``
is regenerated each round from the CORRECTNESS_r01..r0N artifacts:
every key with a verdict on record whose implementation is unchanged
since (changed keys are pinned in the current ``_WINDOW_50`` to
re-earn theirs).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import ingest_sharepoint_file_to_fabric_lakehouse_spark as engine

engine.load_all()

# Keys with a driver verdict on record (strong green, or the weak
# rows-only verdict that is the by-design ceiling for the xxhash64 hot
# paths) whose implementation is unchanged since that verdict —
# REGENERATED each round from CORRECTNESS_r01..r0N minus the current
# window (every key changed this round is IN the window to re-earn, so
# membership here == "verdict still describes the shipped code").
# These rotate to the back of queries(); keys never driver-checked
# sort directly after the window.
_DRIVER_VERIFIED = {
    "agg_approx_distinct", "agg_approx_quantile", "agg_bitmap_distinct",
    "agg_bool", "agg_cms_portable", "agg_collect", "agg_corr_moments", "agg_count_distinct", "agg_cube",
    "agg_empty_check", "agg_grouping_sets", "agg_having", "agg_percentile",
    "agg_rollup",
    "agg_exact_median_twopass", "agg_exact_quantile_grouped",
    "agg_group_sum", "agg_heavy_hitters_exact", "agg_histogram_fixed",
    "agg_incremental_merge", "agg_incremental_rollup", "agg_mode_top_freq",
    "array_ops", "cast_types", "cond_case_when", "corpus_dedup_keep_best",
    "corpus_dedup_pipeline", "corpus_mix_weights",
    "corpus_quality_pipeline", "date_arith", "date_format_tz",
    "date_series_gapfill", "dedup_cluster_cc", "dedup_containment",
    "dedup_embedding_cosine", "dedup_exact_hash",
    "dedup_incremental_minhash", "dedup_lsh_eval", "dedup_minhash_portable",
    "dedup_ngram_jaccard", "dq_expectations", "events_ab_ttest",
    "events_anomaly_zscore", "events_attribution_lasttouch",
    "events_changepoint_cusum", "events_dau_wau_mau", "events_ewma",
    "events_forecast_snaive", "events_markov_transitions",
    "events_resample_ohlc", "events_rolling_distinct",
    "events_sequence_pattern", "events_session_stats", "events_trend_ols",
    "events_user_retention", "filter_comparison", "filter_exists_subquery",
    "flagship_q3_topk", "funnel_conversion", "geo_grid_nearest",
    "graph_bfs_reachability", "graph_label_propagation",
    "graph_link_prediction", "graph_pagerank", "graph_triangle_count",
    "hash_funcs", "join_asof_latest", "pivot_wide",
    "join_asof_nearest", "join_asof_next_within", "join_broadcast_dim",
    "join_bucketed", "join_dynamic_partition_pruned",
    "join_interval_banded", "join_lateral_topn", "join_left_semi",
    "join_null_safe_eq", "join_null_skew_split", "join_runtime_bloom",
    "join_scd2_pointintime", "join_shuffle_large", "join_skew_salted",
    "join_theta_range", "map_json_ops", "math_expr",
    "multimodal_binary_meta", "multimodal_chunk_binary",
    "multimodal_embed_ann", "multimodal_frame_sample",
    "multimodal_resize_meta", "orders_benford_digits", "orders_cohort_ltv",
    "orders_open_backlog", "orders_pareto_abc", "orders_rfm_segments",
    "project_rename_drop", "project_select", "scalar_subquery",
    "scan_binaryfile", "scan_csv_malformed", "scan_csv_schema",
    "scan_datasource_sharepoint", "scan_json_lines", "scan_manifest",
    "scan_observe_metrics", "scan_parquet", "scan_parquet_nested",
    "scan_partition_pruned", "scan_rowgroup_skipping",
    "scan_schema_evolution", "scan_table_stats", "search_bm25",
    "search_hybrid_rrf", "set_except", "set_intersect", "set_union_all",
    "set_union_distinct", "sim_grouped_centroid",
    "sim_ivf_partition_pruned", "sim_ivf_probe", "sim_ivf_recall_eval",
    "sim_kmeans_build", "sim_mmr_diversify", "sim_pq_adc_topk",
    "sim_radius_search", "sim_topk_bruteforce", "sim_topk_ivfpq",
    "sink_compact_small_files", "sink_csv_export", "sink_delta_merge",
    "sink_merge_partitioned", "sink_parquet", "sink_partitioned",
    "sink_scd2_merge", "sink_snapshot_diff", "sink_zorder_layout",
    "sort_multi_nulls", "sql_api_parameterized", "sql_api_q1",
    "sql_api_q10", "sql_api_q12", "sql_api_q13", "sql_api_q14",
    "sql_api_q15", "sql_api_q16", "sql_api_q17", "sql_api_q18",
    "sql_api_q19", "sql_api_q2", "sql_api_q20", "sql_api_q21",
    "sql_api_q22", "sql_api_q4", "sql_api_q5", "sql_api_q6", "sql_api_q7",
    "sql_api_q8", "sql_api_q9", "str_basic", "str_regex", "stream_session",
    "stream_sliding", "stream_tumbling", "string_agg_ordered",
    "text_boilerplate_ratio", "text_bpe_tokenize", "text_chunk_overlap",
    "text_decontaminate", "text_duplicate_spans",
    "text_fingerprint", "text_lang_filter", "text_langid_ngram",
    "text_lm_quality", "text_ngram_entropy",
    "text_quality_score", "text_repetition_filter", "text_stats",
    "text_token_count", "tfidf_top_terms", "topk_per_group",
    "udaf_pandas_grouped", "udf_cogrouped_asof", "udf_pandas_cosine",
    "udf_pandas_scalar", "udf_python_scalar", "udtf_lateral_python",
    "udtf_map_in_pandas", "unpivot_long", "vocab_bpe_merges",
    "vocab_pmi_collocations", "vocab_topk", "vocab_zipf_fit",
    "win_cumulative_distinct", "win_distribution", "win_first_last",
    "win_gaps_islands", "win_lag_lead", "win_moving_avg",
    "win_ntile_bucketize", "win_range_interval", "win_rank_dense",
    "win_row_number", "win_running_sum",
}

# Round 9's 50-slot window, pinned per the round-8 verdict's item 1:
# (a) the 7 keys that have NEVER had a driver verdict (all added late
# r8; all pass the local sf0.01 oracle run); (b) the 4 keys whose
# implementation changed after their latest green verdict (the late-r8
# cross-fixture fixes) — changed keys re-earn; (c) every key changed
# or added in ROUND 9: the exact-decimal lift quotient
# (events_cooccurrence_lift; Spark `div` wraps past 2^63), the Q11
# SUM-widening fix, the decimal/HUGEINT arg-extrema ordering key
# (agg_min_max_by, also in (b)), the multi-probe banded-LSH rework
# (sim_topk_lsh + portable twin + recall eval + vector dup witness),
# the new full-pipeline minhash witness + the banding refactor it
# shares with dedup_fuzzy_minhash, the int-keyed staged PPJoin prefix
# (dedup_jaccard_prefix), and ALL live streaming keys (the
# checkpoint-resume drain gate touched each one; outer join and the
# streaming datasource are already in (a)); (d) the remaining 22
# slots rotate the OLDEST r01 greens — 61 keys still carry only
# r01/r02 verdicts under evolved shared helpers, these are the first
# 22, the rest queue for r10.  Keys added/changed after this window
# was pinned sort directly after it via _ordered_keys (unverified
# strong first), i.e. they are first in line for the r10 window and
# COVERAGE.md's provenance table records them as local-only until
# then.
_WINDOW_50 = [
    # (a) never driver-checked (late round 8)
    "stream_stream_outer_join", "stream_datasource_sharepoint",
    "events_user_features", "dedup_minhash_dup_witness",
    "sim_lsh_dup_witness", "sim_vector_quantize_int8", "text_feature_hashing",
    # (b) re-earn: changed after their latest verdict (late round 8)
    "join_interval_overlap", "text_pack_sequences", "agg_sketch_hll_merge",
    "agg_min_max_by",
    # (c) changed/added in round 9
    "events_cooccurrence_lift", "sql_api_q11", "sim_topk_lsh",
    "sim_topk_lsh_portable", "sim_lsh_recall_eval",
    "dedup_minhash_pipeline_witness", "dedup_fuzzy_minhash",
    "dedup_jaccard_prefix", "stream_tumbling_live", "stream_dedup",
    "stream_stateful_custom", "stream_watermark_late", "stream_foreach_sink",
    "stream_static_join", "stream_session_live", "stream_stream_join",
    "stream_additive_state_merge",
    # (c') changed after the window was first pinned — swapped in for
    # rotation slots (changed keys re-earning outranks re-confirming
    # stable greens; the displaced r01 keys return to the verified
    # pool and queue for r10): the ingest lifecycle steady-state gate,
    # and the SimHash family's SQL-string expression rewrite (the
    # py4j plan-construction fix applied to both hash paths; stats
    # consumes the production path, so it re-earns with it)
    "ingest_pipeline", "dedup_simhash", "dedup_simhash_portable",
    "dedup_simhash_stats",
    # (c'') the synthesized-10x sweep's long-overflow find: the _mix32
    # sampling hash and the pii id-multiply wrapped past id ~3.5e9 /
    # ~1.2e15 — decimal(38,0) widening on both engines; all four
    # re-earn (values identical at fixture ids, verified at sf0.001/
    # sf0.01/sf0.1 and the synthesized 10x set)
    "corpus_sample_stratified", "text_dataset_split",
    "corpus_quality_weighted_sample", "text_pii_scrub",
    # (c''') added in round 9: Ed-Join blocked edit-distance linkage —
    # brand new, needs its FIRST verdict (new keys outrank rotation;
    # the displaced r01 green queues for r10)
    "dedup_edit_distance_blocked",
    # (d) rotation: oldest r01 greens (13 of 61; remainder queue for r10)
    "agg_stats",
    "dedup_distinct_rows", "dedup_subset_keyed", "explode_lateral",
    "filter_between_date", "filter_in_set", "filter_like", "filter_null",
    "join_cross", "join_left_anti", "join_multikey_chain", "join_outer_full",
    "join_outer_left",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return engine.QUERIES["flagship_q3_topk"](spark, "/root/testdata/sf0.001")


def _ordered_keys() -> list[str]:
    keys = list(engine.QUERIES)
    window = [k for k in _WINDOW_50 if k in engine.QUERIES]
    seen = set(window)
    rest_unverified_strong = [
        k for k in keys
        if k not in seen and k not in _DRIVER_VERIFIED and k in engine.ORACLES
    ]
    seen.update(rest_unverified_strong)
    rest_unverified_weak = [
        k for k in keys if k not in seen and k not in _DRIVER_VERIFIED
    ]
    seen.update(rest_unverified_weak)
    return window + rest_unverified_strong + rest_unverified_weak + [
        k for k in keys if k not in seen
    ]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {k: engine.QUERIES[k] for k in _ordered_keys()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted ⇒ rows-only check)."""
    return {k: engine.ORACLES[k] for k in _ordered_keys() if k in engine.ORACLES}
