"""Window function surface (SURVEY.md §2 B.5).

Reference parity: the running `total` counter
(sharepoint_to_bronze_delta.py:150 → win_running_sum) and
latest-file-per-folder (→ win_first_last, topk_per_group).

Scale notes: all windows partition by a key (custkey/user_id) —
one shuffle, then per-partition sort.  No global (unpartitioned)
windows anywhere: a ``Window.orderBy`` without partitionBy funnels
100 TB through one task and is banned in this codebase.  Ordering
always includes a unique tiebreaker column so results are
deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..core import dec, query, t


@query(
    "win_row_number",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 3 orders per customer (row_number ranking)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_rank_dense",
    """
    SELECT o_orderkey, o_orderstatus,
           rank()       OVER (PARTITION BY o_orderstatus ORDER BY round(o_totalprice, -4)) AS price_rank,
           dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY round(o_totalprice, -4)) AS price_dense_rank,
           ntile(4)     OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS price_quartile
    FROM orders
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank (with real ties via price bucketing) + ntile
    (unique ordering for determinism)."""
    bucket = F.round(F.col("o_totalprice"), -4)
    w_tie = Window.partitionBy("o_orderstatus").orderBy(bucket)
    w_uni = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w_tie).alias("price_rank"),
        F.dense_rank().over(w_tie).alias("price_dense_rank"),
        F.ntile(4).over(w_uni).alias("price_quartile"),
    )


@query(
    "win_lag_lead",
    """
    SELECT event_id, user_id, ts, value,
           lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS gap_us
    FROM events
    WHERE user_id < 20
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead offsets + inter-event gap (sessionization prep)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


@query(
    "win_running_sum",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_count
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame — the reference's running ingest total
    (sharepoint_to_bronze_delta.py:150), distributed."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
        F.count("*").over(w).alias("running_count"),
    )


@query(
    "win_moving_avg",
    """
    SELECT event_id, user_id, ts,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS value_ma5,
           ROUND(MIN(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS value_min5
    FROM events
    WHERE user_id < 20
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 5-row frame: moving average smoothing of events.value."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.avg("value").over(w), 6).alias("value_ma5"),
        F.round(F.min("value").over(w), 6).alias("value_min5"),
    )


@query(
    "win_first_last",
    """
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
           last_value(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order_date
    FROM orders
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last over full frame — latest-file-per-folder analog."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
            F.last("o_orderdate").over(w).alias("last_order_date"),
        )
        .distinct()
    )


@query(
    "win_distribution",
    """
    SELECT o_orderkey, o_orderstatus,
           ROUND(percent_rank() OVER w, 6) AS pr,
           ROUND(cume_dist() OVER w, 6) AS cd
    FROM orders
    WHERE o_orderkey < 2000
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist) with a
    total-order tiebreak — completes the B.5 ranking family."""
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
    )


@query(
    "win_ntile_bucketize",
    """
    WITH q AS (
      SELECT o_orderpriority, o_totalprice,
             ntile(4) OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS quartile
      FROM orders
    )
    SELECT o_orderpriority, quartile,
           count(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
    FROM q
    GROUP BY o_orderpriority, quartile
    ORDER BY o_orderpriority, quartile
    """,
)
def win_ntile_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartiles per group (equal-frequency bucketing — the
    window behind histogram equalization, spend tiers, and per-group
    stratified splits).  Ordering carries the unique o_orderkey
    tiebreak so bucket membership is engine-independent; quartile
    totals use exact decimal sums."""
    from ..core import money

    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    q = o.select("o_orderpriority", "o_totalprice", F.ntile(4).over(w).alias("quartile"))
    return (
        q.groupBy("o_orderpriority", "quartile")
        .agg(
            F.count("*").alias("n_orders"),
            money(F.sum(dec("o_totalprice"))).alias("total_price"),
        )
        .orderBy("o_orderpriority", "quartile")
    )


@query(
    "win_cumulative_distinct",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events WHERE user_id < 20
    )
    SELECT user_id, ts, event_id, event_type,
           CAST(SUM(first_seen) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS BIGINT)
             AS distinct_types_so_far
    FROM flagged
    ORDER BY user_id, ts, event_id
    """,
)
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a user's event timeline — how many
    distinct event types each user has touched as of every event (the
    feature-breadth / exploration metric).

    SQL has no ``count(DISTINCT ...) OVER (ORDER BY ...)``; the
    scalable identity is two stacked windows on the SAME partitioning:
    flag each (user, type)'s FIRST occurrence with row_number, then a
    running sum of the flag along the user timeline.  Both windows
    hash-shuffle on user_id once (Catalyst reuses the exchange; the
    second window only re-sorts within partitions), so the cost is one
    exchange + two in-partition sorts — versus the quadratic
    self-join ("count distinct among my predecessors") a naive
    formulation pays.  Ordering carries (ts, event_id) so first-seen
    flags are engine-deterministic under timestamp ties.
    """
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.sum("first_seen").over(w_run).cast("long").alias("distinct_types_so_far"),
        )
        .orderBy("user_id", "ts", "event_id")
    )
