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
    "agg_bool", "agg_cms_portable", "agg_collect", "agg_corr_moments",
    "agg_count_distinct", "agg_cube", "agg_empty_check",
    "agg_exact_median_twopass", "agg_exact_quantile_grouped",
    "agg_group_sum", "agg_grouping_sets", "agg_having",
    "agg_heavy_hitters_exact", "agg_histogram_fixed",
    "agg_incremental_merge", "agg_incremental_rollup", "agg_min_max_by",
    "agg_mode_top_freq", "agg_percentile", "agg_rollup",
    "agg_sketch_hll_merge", "agg_stats", "array_ops", "cast_types",
    "cond_case_when", "corpus_dedup_keep_best", "corpus_dedup_pipeline",
    "corpus_mix_weights", "corpus_quality_pipeline",
    "corpus_quality_weighted_sample", "corpus_sample_stratified",
    "date_arith", "date_format_tz", "date_series_gapfill",
    "dedup_cluster_cc", "dedup_containment", "dedup_distinct_rows",
    "dedup_edit_distance_blocked", "dedup_embedding_cosine",
    "dedup_exact_hash", "dedup_fuzzy_minhash", "dedup_incremental_minhash",
    "dedup_lsh_eval", "dedup_minhash_dup_witness",
    "dedup_minhash_pipeline_witness", "dedup_minhash_portable",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_simhash_portable",
    "dedup_simhash_stats", "dedup_subset_keyed", "dq_expectations",
    "events_ab_ttest", "events_anomaly_zscore",
    "events_attribution_lasttouch", "events_changepoint_cusum",
    "events_cooccurrence_lift", "events_dau_wau_mau", "events_ewma",
    "events_forecast_snaive", "events_markov_transitions",
    "events_resample_ohlc", "events_rolling_distinct",
    "events_sequence_pattern", "events_session_stats", "events_trend_ols",
    "events_user_features", "events_user_retention", "explode_lateral",
    "filter_between_date", "filter_comparison", "filter_exists_subquery",
    "filter_in_set", "filter_like", "filter_null", "flagship_q3_topk",
    "funnel_conversion", "geo_grid_nearest", "graph_bfs_reachability",
    "graph_label_propagation", "graph_link_prediction", "graph_triangle_count", "hash_funcs", "ingest_pipeline",
    "join_asof_latest", "join_asof_nearest", "join_asof_next_within",
    "join_broadcast_dim", "join_bucketed", "join_cross",
    "join_dynamic_partition_pruned", "join_interval_banded",
    "join_interval_overlap", "join_lateral_topn", "join_left_anti",
    "join_left_semi", "join_multikey_chain", "join_null_safe_eq",
    "join_null_skew_split", "join_outer_full", "join_outer_left",
    "join_runtime_bloom", "join_scd2_pointintime", "join_shuffle_large",
    "join_skew_salted", "join_theta_range", "limit_n", "map_json_ops",
    "math_expr", "multimodal_binary_meta", "multimodal_chunk_binary",
    "multimodal_embed_ann", "multimodal_frame_sample",
    "multimodal_resize_meta", "orders_benford_digits", "orders_cohort_ltv",
    "orders_open_backlog", "orders_pareto_abc", "orders_rfm_segments",
    "pivot_wide", "project_rename_drop", "project_select",
    "scalar_subquery", "scan_binaryfile", "scan_csv_malformed",
    "scan_csv_schema", "scan_datasource_sharepoint", "scan_json_lines",
    "scan_manifest", "scan_observe_metrics", "scan_parquet",
    "scan_parquet_nested", "scan_partition_pruned",
    "scan_rowgroup_skipping", "scan_schema_evolution", "scan_table_stats",
    "search_bm25", "search_hybrid_rrf", "set_except", "set_intersect",
    "set_union_all", "set_union_distinct", "sim_grouped_centroid",
    "sim_ivf_partition_pruned", "sim_ivf_probe", "sim_ivf_recall_eval",
    "sim_lsh_dup_witness", "sim_lsh_recall_eval", "sim_mmr_diversify",
    "sim_radius_search", "sim_topk_bruteforce",
    "sim_topk_lsh", "sim_topk_lsh_portable",
    "sim_vector_quantize_int8", "sink_compact_small_files",
    "sink_csv_export", "sink_parquet", "sink_partitioned",
    "sink_scd2_merge", "sink_snapshot_diff", "sink_zorder_layout",
    "sort_multi_nulls", "sql_api_parameterized", "sql_api_q1",
    "sql_api_q10", "sql_api_q12", "sql_api_q13",
    "sql_api_q14", "sql_api_q15", "sql_api_q16", "sql_api_q17",
    "sql_api_q19", "sql_api_q20",
    "sql_api_q21", "sql_api_q22", "sql_api_q4", "sql_api_q5", "sql_api_q6",
    "sql_api_q7", "sql_api_q8", "sql_api_q9", "str_basic", "str_regex",
    "stream_additive_state_merge", "stream_datasource_sharepoint",
    "stream_dedup", "stream_foreach_sink", "stream_session",
    "stream_session_live", "stream_sliding", "stream_stateful_custom",
    "stream_static_join", "stream_stream_join", "stream_stream_outer_join",
    "stream_tumbling", "stream_tumbling_live", "stream_watermark_late",
    "string_agg_ordered", "text_boilerplate_ratio", "text_bpe_tokenize",
    "text_chunk_overlap", "text_dataset_split", "text_decontaminate",
    "text_duplicate_spans", "text_feature_hashing", "text_fingerprint",
    "text_lang_filter", "text_langid_ngram", "text_lm_quality",
    "text_ngram_entropy", "text_pack_sequences", "text_pii_scrub",
    "text_quality_score", "text_repetition_filter", "text_stats",
    "text_token_count", "tfidf_top_terms", "topk_per_group",
    "udaf_pandas_grouped", "udf_cogrouped_asof", "udf_pandas_cosine",
    "udf_pandas_scalar", "udf_python_scalar", "udtf_lateral_python",
    "udtf_map_in_pandas", "unpivot_long", "vocab_bpe_merges",
    "vocab_topk", "vocab_zipf_fit",
    "win_cumulative_distinct", "win_distribution", "win_first_last",
    "win_gaps_islands", "win_lag_lead", "win_moving_avg",
    "win_ntile_bucketize", "win_range_interval", "win_rank_dense",
    "win_row_number", "win_running_sum"
}

# Round 11's 50-slot window, pinned per the round-10 verdict's items
# 1-2 and the post-r10 commits: (a) the FIVE keys whose implementation
# changed after their last verdict, pinned at the head to re-earn —
# sim_kmeans_build (staged codebook landed late in r10 outside that
# round's window: the one process defect the r10 verdict flagged),
# corpus_shuffle_shard (shard bits 28-31 fix: the Knuth multiplier is
# 1 mod 16, so the low-bit shard was (doc_id - epoch) mod 16 — a
# round-robin relabel, not a decorrelated permutation),
# sink_delta_merge + sink_merge_partitioned (atomic-rename commit
# protocol in plans/merge.py: stage + _SUCCESS witness + backup/commit
# renames + crash recovery), and dedup_jaccard_prefix (fused map-side
# verification: the 784k-row candidate groupBy and the verify
# repartition exchanges are gone, dedup happens on the ~256-row
# post-tau survivor set; 1.61 s -> ~0.9 s warm at sf0.1);
# (b) the SIX keys still riding r01 verdicts (code unchanged since —
# the verdicts are valid, but after this round every key's verdict
# postdates its last code change and staleness drains by
# construction): unpivot_long, win_first_last, win_lag_lead,
# win_moving_avg, win_rank_dense, win_running_sum;
# (c) the SEVEN keys changed by this round's perf work re-earn:
# sql_api_q2 + sql_api_q11 (their supply relation is now a STAGED
# partsupp-shaped rollup, plans/flagship.py _supply_view — the inline
# CTE re-aggregated lineitem 2-3x per query; values unchanged, the
# oracle still derives it inline), sql_api_q18 (Spark runs a
# shared-rollup text — one lineitem scan+exchange instead of the spec
# form's two; oracle keeps the spec text), sim_pq_adc_topk +
# sim_topk_ivfpq (corpus localCheckpoint dropped — an eager
# checkpoint of the raw corpus is wrong at 100 TB and cost ~0.25 s of
# job latency; the 3-row query slice checkpoints instead),
# vocab_pmi_collocations (bigram table materialized — four consumers,
# exchange reuse never fired, the corpus explode ran 4x), and
# graph_pagerank (hybrid: driver rank loop below a 200k
# aggregated-edge cap, the connected_components pattern, bit-exact
# parity with the distributed loop pinned by test);
# (d) the remaining 32 slots rotate the oldest greens (r04 + r05)
# ((a)+(b)+(c) pin 5+6+7 = 18 of the 50).
# Keys added or changed after this window was pinned sort directly
# after it via _ordered_keys (unverified strong first).
_WINDOW_50 = [
    "sim_kmeans_build", "corpus_shuffle_shard", "sink_delta_merge",
    "sink_merge_partitioned", "dedup_jaccard_prefix", "unpivot_long",
    "win_first_last", "win_lag_lead", "win_moving_avg", "win_rank_dense",
    "win_running_sum", "agg_approx_distinct", "agg_incremental_rollup",
    "corpus_mix_weights", "multimodal_frame_sample", "sim_radius_search",
    "sink_scd2_merge", "string_agg_ordered", "agg_approx_quantile",
    "agg_bool", "vocab_pmi_collocations", "dedup_cluster_cc",
    "dedup_embedding_cosine", "dedup_exact_hash", "dedup_minhash_portable",
    "events_user_retention", "graph_pagerank", "graph_triangle_count",
    "join_asof_latest", "join_bucketed", "join_theta_range",
    "map_json_ops", "sim_pq_adc_topk", "scan_datasource_sharepoint",
    "scan_json_lines", "scan_partition_pruned", "sim_grouped_centroid",
    "sim_topk_bruteforce", "stream_session", "stream_sliding",
    "stream_tumbling", "text_decontaminate", "text_fingerprint",
    "text_repetition_filter", "tfidf_top_terms", "vocab_topk",
    "sim_topk_ivfpq", "sql_api_q18", "sql_api_q2",
    "sql_api_q11"
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
