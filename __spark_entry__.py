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
lists the keys with a green row in CORRECTNESS_r01/r02.json whose
implementation has not changed since that verdict.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import ingest_sharepoint_file_to_fabric_lakehouse_spark as engine

engine.load_all()

# Green rows in CORRECTNESS_r01.json + CORRECTNESS_r02.json whose
# implementation is unchanged since the verdict.  Deliberately absent
# (re-enter the window this round): agg_approx_distinct (reworked in r2
# to exact counts + HLL error-bound oracle) and join_asof_latest
# (tie-break semantics hardened in r2) — the green rows on record are
# for the old implementations — plus any key whose implementation
# changes this round (streaming fixed-cost trim, ingest path-table).
_DRIVER_VERIFIED = {
    # r01 greens (unchanged since)
    "flagship_q3_topk", "join_bucketed", "scan_partition_pruned",
    "project_select", "project_rename_drop", "filter_comparison",
    "filter_in_set", "filter_like", "filter_null", "filter_between_date",
    "join_broadcast_dim", "join_shuffle_large", "join_multikey_chain",
    "join_outer_left", "join_outer_full", "join_left_semi",
    "join_left_anti", "join_cross", "join_theta_range",
    "agg_group_sum", "agg_count_distinct",
    "agg_having", "agg_rollup", "agg_cube", "agg_grouping_sets",
    "agg_stats", "agg_percentile", "agg_min_max_by", "agg_empty_check",
    "win_row_number", "win_rank_dense", "win_lag_lead", "win_running_sum",
    "win_moving_avg", "win_first_last", "sort_multi_nulls", "limit_n",
    "topk_per_group", "set_union_all", "set_union_distinct",
    "set_intersect", "set_except", "dedup_distinct_rows",
    "dedup_subset_keyed", "pivot_wide", "unpivot_long", "explode_lateral",
    # r02 greens (unchanged since)
    "agg_collect",
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_tumbling_live", "stream_dedup", "stream_watermark_late",
    "stream_foreach_sink", "stream_stateful_custom",
    "str_basic", "str_regex", "date_format_tz", "date_arith", "math_expr",
    "cond_case_when", "cast_types", "array_ops", "map_json_ops", "hash_funcs",
    "udf_python_scalar", "udf_pandas_scalar", "udaf_pandas_grouped",
    "udtf_map_in_pandas", "udf_pandas_cosine",
    "scan_parquet", "scan_csv_schema", "scan_json_lines", "scan_binaryfile",
    "scan_manifest",
    "sink_parquet", "sink_partitioned", "sink_delta_merge",
    "sink_merge_partitioned", "ingest_pipeline",
    # dedup_ngram_jaccard: removed late r7 — its shingle relation
    # gained a cost-gated checkpoint (value-neutral, but changed keys
    # re-earn verdicts), so it re-enters the r8 queue
    "dedup_exact_hash", "dedup_minhash_portable",
    "dedup_embedding_cosine", "sim_topk_bruteforce", "sim_grouped_centroid",
    "text_stats", "text_lang_filter", "text_quality_score",
    "text_token_count", "text_langid_ngram", "text_fingerprint",
    "vocab_topk", "tfidf_top_terms", "dedup_cluster_cc",
    "multimodal_binary_meta",
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
