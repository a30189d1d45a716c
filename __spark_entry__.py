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
# rows-only verdict that is the by-design ceiling for the three
# xxhash64 hot paths) whose implementation is unchanged since that
# verdict — REGENERATED each round from CORRECTNESS_r01..r0N minus
# the current window (every key changed this round is IN the window
# to re-earn, so membership here == "verdict still describes the
# shipped code").  These rotate to the back of queries(); keys never
# driver-checked sort directly after the window.
_DRIVER_VERIFIED = {
    "agg_approx_distinct", "agg_approx_quantile", "agg_bitmap_distinct",
    "agg_bool", "agg_cms_portable", "agg_collect", "agg_corr_moments",
    "agg_count_distinct", "agg_cube", "agg_empty_check",
    "agg_exact_median_twopass", "agg_exact_quantile_grouped",
    "agg_grouping_sets", "agg_having", "agg_heavy_hitters_exact",
    "agg_histogram_fixed", "agg_incremental_merge",
    # agg_min_max_by: composite tie-break ordering added late r8 (the
    # synthesized-4x sweep manufactured price ties) — re-earns in r9
    "agg_incremental_rollup", "agg_mode_top_freq",
    # agg_sketch_hll_merge: r8 oracle upgraded to the error-bound shape
    # (sf0.1 sweep showed exact-equality stops holding at ~10k/group)
    "agg_percentile", "agg_rollup", "agg_stats",
    "array_ops", "cast_types", "cond_case_when", "corpus_dedup_pipeline",
    "corpus_mix_weights", "corpus_quality_pipeline",
    "corpus_sample_stratified", "date_arith", "date_format_tz",
    "date_series_gapfill", "dedup_cluster_cc", "dedup_distinct_rows",
    "dedup_embedding_cosine", "dedup_exact_hash",
    # dedup_fuzzy_minhash: signature projection factored into a shared
    # helper late r8 (value-neutral, rows re-checked locally) — changed
    # keys re-earn, so it queues for its r9 rows-only re-verdict
    "dedup_simhash",
    "dedup_incremental_minhash", "dedup_jaccard_prefix", "dedup_lsh_eval",
    "dedup_minhash_portable", "dedup_subset_keyed", "events_ab_ttest",
    "events_anomaly_zscore", "events_attribution_lasttouch",
    "events_dau_wau_mau", "events_ewma", "events_markov_transitions",
    "events_resample_ohlc", "events_rolling_distinct",
    "events_sequence_pattern", "events_trend_ols", "events_user_retention",
    "explode_lateral", "filter_between_date", "filter_exists_subquery",
    "filter_in_set", "filter_like", "filter_null", "funnel_conversion",
    "geo_grid_nearest", "graph_bfs_reachability", "graph_link_prediction",
    "graph_triangle_count", "hash_funcs", "ingest_pipeline",
    "join_asof_latest", "join_asof_next_within", "join_bucketed",
    "join_cross", "join_dynamic_partition_pruned", "join_interval_banded",
    # join_interval_overlap: oracle epoch-rounding fix late r8 (the
    # sf0.001 cross-fixture sweep caught a floor-vs-round divergence)
    # — re-earns its verdict in r9
    "join_left_anti", "join_multikey_chain",
    "join_null_safe_eq", "join_null_skew_split", "join_outer_full",
    "join_outer_left", "join_runtime_bloom", "join_scd2_pointintime",
    "join_skew_salted", "join_theta_range", "limit_n", "map_json_ops",
    "math_expr", "multimodal_binary_meta", "multimodal_chunk_binary",
    "multimodal_embed_ann", "multimodal_frame_sample", "orders_cohort_ltv",
    # orders_pareto_abc / text_pack_sequences: two-phase prefix-sum
    # layout-freeze fix late r8 (sf0.1 sweep) — both re-earn in r9
    "orders_open_backlog", "orders_rfm_segments", "pivot_wide",
    "project_rename_drop", "scalar_subquery", "scan_binaryfile",
    "scan_csv_malformed", "scan_csv_schema", "scan_datasource_sharepoint",
    "scan_json_lines", "scan_manifest", "scan_observe_metrics",
    "scan_parquet", "scan_parquet_nested", "scan_partition_pruned",
    "scan_rowgroup_skipping", "scan_schema_evolution", "scan_table_stats",
    "search_bm25", "search_hybrid_rrf", "set_except", "set_intersect",
    "set_union_all", "set_union_distinct", "sim_grouped_centroid",
    "sim_kmeans_build", "sim_mmr_diversify", "sim_pq_adc_topk",
    "sim_radius_search", "sim_topk_bruteforce", "sim_topk_ivfpq",
    "sink_compact_small_files", "sink_csv_export", "sink_delta_merge",
    "sink_merge_partitioned", "sink_parquet", "sink_partitioned",
    "sink_scd2_merge", "sink_snapshot_diff", "sink_zorder_layout",
    "sql_api_q1", "sql_api_q10", "sql_api_q14", "sql_api_q18",
    "sql_api_q19", "sql_api_q5", "sql_api_q6", "str_basic", "str_regex",
    "stream_additive_state_merge", "stream_dedup", "stream_foreach_sink",
    "stream_session", "stream_session_live", "stream_sliding",
    "stream_stateful_custom", "stream_static_join", "stream_stream_join",
    "stream_tumbling", "stream_tumbling_live", "stream_watermark_late",
    "string_agg_ordered", "text_boilerplate_ratio", "text_bpe_tokenize",
    "text_chunk_overlap", "text_dataset_split", "text_decontaminate",
    "text_duplicate_spans", "text_fingerprint", "text_lang_filter",
    "text_langid_ngram", "text_lm_quality",
    "text_pii_scrub", "text_quality_score", "text_repetition_filter",
    "text_stats", "text_token_count", "tfidf_top_terms",
    "udaf_pandas_grouped", "udf_cogrouped_asof", "udf_pandas_cosine",
    "udf_pandas_scalar", "udf_python_scalar", "udtf_lateral_python",
    "udtf_map_in_pandas", "unpivot_long", "vocab_bpe_merges",
    "vocab_pmi_collocations", "vocab_topk", "vocab_zipf_fit",
    "win_cumulative_distinct", "win_distribution", "win_first_last",
    "win_gaps_islands", "win_lag_lead", "win_moving_avg",
    "win_ntile_bucketize", "win_range_interval", "win_rank_dense",
    "win_running_sum",
}

# Round 8's 50-slot window, pinned per the round-7 verdict's item 1:
# (a) the 22 late-r7 keys that have NEVER had a driver verdict (all
# re-verified locally this round); (b) the ~6 keys whose green verdict
# predates a value-neutral late-r7 change (cost-gated checkpoints) —
# changed keys re-earn; (c) every key changed or added in round 8:
# the staged IVF probe pair, the banded-LSH rework (production key is
# weak rows-only; its portable twin and the new recall eval are
# strong), the new simhash/LSH value witnesses, the numpy resize key,
# the factored lift expression, and the five TPC-H completions
# Q2/Q9/Q11/Q16/Q20; (d) the remaining slots re-confirm the OLDEST
# r01 greens — rotation has never re-checked them.
_WINDOW_50 = [
    # (a) never driver-checked (late round 7)
    "sql_api_q4", "sql_api_q7", "sql_api_q8", "sql_api_q12", "sql_api_q13",
    "sql_api_q15", "sql_api_q17", "sql_api_q21", "sql_api_q22",
    "sql_api_parameterized", "join_asof_nearest", "join_lateral_topn",
    "corpus_dedup_keep_best", "corpus_quality_weighted_sample",
    "events_changepoint_cusum", "events_forecast_snaive",
    "events_session_stats", "graph_label_propagation",
    "orders_benford_digits", "orders_pareto_abc", "sim_ivf_recall_eval",
    "text_ngram_entropy",
    # (b) re-earn: value-neutral post-verdict changes late in round 7
    "dedup_ngram_jaccard", "dedup_containment", "dq_expectations",
    "dedup_simhash_portable", "graph_pagerank", "events_cooccurrence_lift",
    # (c) changed/added in round 8
    "sim_ivf_probe", "sim_ivf_partition_pruned", "sim_topk_lsh_portable",
    "sim_topk_lsh", "dedup_simhash_stats", "sim_lsh_recall_eval",
    "multimodal_resize_meta", "sql_api_q2", "sql_api_q9", "sql_api_q11",
    "sql_api_q16", "sql_api_q20",
    # (d) rotation: oldest r01 greens, first re-confirmation since r1
    "flagship_q3_topk", "project_select", "filter_comparison",
    "join_broadcast_dim", "join_shuffle_large", "agg_group_sum",
    "win_row_number", "topk_per_group", "sort_multi_nulls",
    "join_left_semi",
]

# Round 7's 50-slot window (superseded), pinned per the round-6 verdict:
# (a) the 24 round-6 second-wave keys that overflowed the r06 window
# and have NEVER had a driver verdict (all pass the local harness);
# (b) every key whose implementation changed this round — the
# sink_snapshot_diff integer-cents/BIGINT parity fix (the one r06 red
# row), the cooccurrence decimal(38,0) widening, the jaccard-prefix
# skew fallback, the Delta-gated merge sinks, the ingest shuffle-width
# derivation, and the streaming scratch-root/state-width change (all
# 9 live streaming keys); (b') the five keys ADDED in round 7; (b'')
# the late-round staged-index rework.  The (a)+(b) families consumed
# all 50 slots, so the planned rotation re-checks of old r01 greens
# were dropped — changed keys re-earning verdicts outranks
# re-confirming stable ones (flagship_q3_topk still smoke-runs every
# round via entry()).
_WINDOW_R7 = [
    # (a) never driver-checked — exactly the 24 listed in VERDICT.md
    # "What's missing" §1; these MUST land in CORRECTNESS_r07
    "sql_api_q18", "win_cumulative_distinct", "events_markov_transitions",
    "graph_link_prediction", "events_ab_ttest", "orders_rfm_segments",
    "vocab_pmi_collocations", "events_trend_ols", "agg_corr_moments",
    "events_attribution_lasttouch", "graph_bfs_reachability",
    "multimodal_embed_ann", "agg_heavy_hitters_exact",
    "sql_api_q6", "sql_api_q10", "join_scd2_pointintime", "geo_grid_nearest",
    "dedup_lsh_eval", "join_interval_overlap", "agg_exact_quantile_grouped",
    "join_null_safe_eq", "vocab_zipf_fit", "orders_open_backlog",
    "events_dau_wau_mau",
    # (b) implementation changed in round 7 — re-earn the verdict
    "sink_snapshot_diff", "events_cooccurrence_lift", "dedup_jaccard_prefix",
    "sink_delta_merge", "sink_merge_partitioned", "ingest_pipeline",
    "stream_tumbling_live", "stream_dedup", "stream_stateful_custom",
    "stream_watermark_late", "stream_foreach_sink", "stream_static_join",
    "stream_session_live", "stream_stream_join", "stream_additive_state_merge",
    # (b') new round-7 keys (need their first driver verdicts)
    "sql_api_q1", "sql_api_q14", "sql_api_q19", "orders_cohort_ltv",
    "sim_mmr_diversify",
    # (b'') staged-index rework late in round 7 (PQ code index shared
    # by the two PQ keys; corpus-dedup canon/signature staging) — the
    # prior verdicts are for the unstaged implementations
    "sim_pq_adc_topk", "sim_topk_ivfpq", "corpus_dedup_pipeline",
    "text_lm_quality", "text_boilerplate_ratio", "corpus_quality_pipeline",
    # (c) no rotation re-checks this round: the staged-index rework
    # (b'') consumed the remaining slots — changed keys must re-earn
    # verdicts before stale-but-stable r01 greens get re-confirmed
    # (flagship_q3_topk still runs every round as the entry() smoke).
    # (d) ADDED AFTER the window filled (late r7): sql_api_q4/q13/q17/
    # q21/q22 (the decorrelation suite), sql_api_q7/q8/q12/q15 (the
    # multi-dim star / conditional-agg / CTE-max classics), and
    # events_changepoint_cusum / sim_ivf_recall_eval /
    # corpus_dedup_keep_best / orders_pareto_abc / text_ngram_entropy /
    # graph_label_propagation / corpus_quality_weighted_sample /
    # events_forecast_snaive / events_session_stats / join_asof_nearest /
    # orders_benford_digits / join_lateral_topn / sql_api_parameterized.  They sort directly after the window via
    # _ordered_keys (unverified strong), i.e. they are FIRST IN LINE
    # for the round-8 window; COVERAGE.md's provenance table records
    # them as local-sweep-only until then.
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
