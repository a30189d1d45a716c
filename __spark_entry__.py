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
lists the keys with a green row in CORRECTNESS_r01.json.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import ingest_sharepoint_file_to_fabric_lakehouse_spark as engine

engine.load_all()

# Green (or weak-by-design no_oracle) rows in CORRECTNESS_r01.json.
# agg_collect is deliberately absent: its r01 row was a hasher failure,
# so it re-enters the check window this round.
_DRIVER_VERIFIED = {
    "flagship_q3_topk", "join_bucketed", "scan_partition_pruned",
    "project_select", "project_rename_drop", "filter_comparison",
    "filter_in_set", "filter_like", "filter_null", "filter_between_date",
    "join_broadcast_dim", "join_shuffle_large", "join_multikey_chain",
    "join_outer_left", "join_outer_full", "join_left_semi",
    "join_left_anti", "join_cross", "join_theta_range", "join_asof_latest",
    "agg_group_sum", "agg_count_distinct", "agg_approx_distinct",
    "agg_having", "agg_rollup", "agg_cube", "agg_grouping_sets",
    "agg_stats", "agg_percentile", "agg_min_max_by", "agg_empty_check",
    "win_row_number", "win_rank_dense", "win_lag_lead", "win_running_sum",
    "win_moving_avg", "win_first_last", "sort_multi_nulls", "limit_n",
    "topk_per_group", "set_union_all", "set_union_distinct",
    "set_intersect", "set_except", "dedup_distinct_rows",
    "dedup_subset_keyed", "pivot_wide", "unpivot_long", "explode_lateral",
}

# Weak (no-oracle) keys promoted into this round's window ahead of the
# other weak keys: the ingestion flagship + the two core LSH dedup/ANN
# paths.
_WEAK_PRIORITY = ["ingest_pipeline", "dedup_fuzzy_minhash", "sim_topk_lsh"]

# Keys added AFTER this round's 50-slot window was planned — deferred
# behind the window so they don't displace the keys above; they enter
# the window next round.
_DEFERRED_NEW = [
    "corpus_sample_stratified", "text_dataset_split", "text_pii_scrub",
    "corpus_mix_weights", "sim_radius_search", "multimodal_frame_sample",
    "agg_sketch_hll_merge", "stream_stateful_custom",
    "events_user_retention", "win_distribution",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return engine.QUERIES["flagship_q3_topk"](spark, "/root/testdata/sf0.001")


def _ordered_keys() -> list[str]:
    keys = list(engine.QUERIES)
    deferred = set(_DEFERRED_NEW)
    unverified = [k for k in keys if k not in _DRIVER_VERIFIED and k not in deferred]
    strong = [k for k in unverified if k in engine.ORACLES]
    weak_pri = [k for k in _WEAK_PRIORITY if k in engine.QUERIES]
    weak_rest = [
        k for k in unverified if k not in engine.ORACLES and k not in weak_pri
    ]
    new_keys = [k for k in keys if k in deferred]
    front = strong + weak_pri + weak_rest + new_keys
    seen = set(front)
    return front + [k for k in keys if k not in seen]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {k: engine.QUERIES[k] for k in _ordered_keys()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted ⇒ rows-only check)."""
    return {k: engine.ORACLES[k] for k in _ordered_keys() if k in engine.ORACLES}
