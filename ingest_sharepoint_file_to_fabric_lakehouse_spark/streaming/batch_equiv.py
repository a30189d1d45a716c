"""Event-time window aggregations over `events` (SURVEY.md §2 B.8) in
batch-equivalence form: the exact same ``window``/``session_window``
expressions Structured Streaming uses, executed on the static table so
the DuckDB oracle can verify values.  `streams.py` runs the same
shapes through a real ``readStream``.

Scale notes: event-time windows group by (window, key) — the shuffle
key includes the window bucket, so state is bounded per (window, key)
pair; in streaming, the watermark bounds total state.  Sums are exact
decimal (core.dec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import dec, money, query, t


@query(
    "stream_tumbling",
    """
    SELECT time_bucket(INTERVAL 5 MINUTES, ts) AS window_start,
           time_bucket(INTERVAL 5 MINUTES, ts) + INTERVAL 5 MINUTES AS window_end,
           event_type,
           count(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute event-time windows per event_type."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            money(F.sum(dec("value"))).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "stream_sliding",
    """
    WITH offsets AS (SELECT unnest([0, 5]) AS off_min),
    windowed AS (
      SELECT time_bucket(INTERVAL 10 MINUTES, ts - off_min * INTERVAL 1 MINUTE)
               + off_min * INTERVAL 1 MINUTE AS window_start,
             event_type, value
      FROM events CROSS JOIN offsets
    )
    SELECT window_start,
           window_start + INTERVAL 10 MINUTES AS window_end,
           event_type,
           count(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM windowed
    GROUP BY 1, 2, 3
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 10-minute windows every 5 minutes (each event lands in
    two windows); oracle reconstructs the same windows as a union of
    two phase-shifted tumbling bucketings."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            money(F.sum(dec("value"))).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "stream_session",
    """
    WITH gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 300000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    islands AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_last_event,
           count(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM islands
    GROUP BY user_id, session_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (5-minute inactivity gap) per user via
    the native ``session_window``; the oracle rebuilds sessions with
    the classic lag + cumulative-sum island technique."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last_event"),
            F.count("*").alias("n_events"),
            money(F.sum(dec("value"))).alias("total_value"),
        )
        .select("user_id", "session_start", "session_last_event", "n_events", "total_value")
    )
