"""SCD Type-2 dimension maintenance over parquet — history-preserving
upserts, the lakehouse pattern the reference's bronze Delta sink
(`config.py:16`) feeds into but never implements.

Semantics per merge batch (one ``change_date``):

* key changed (attribute differs from the current row) → CLOSE the
  current row (``valid_to = change_date``, ``is_current = false``) and
  INSERT a new current row (``valid_from = change_date``);
* key unchanged or absent from the batch → pass through untouched.

Scale shape: one shuffle of the dimension and one of the (much
smaller) update batch on the business key — the same full-outer MERGE
shuffle as plans/merge.py; history rows are immutable so a partitioned
layout (`is_current`, or valid_from-year) keeps the hot 'current' set
a partition-pruned scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import query, t


def scd2_apply(
    dim: DataFrame, updates: DataFrame, key: str, attr: str, change_date
) -> DataFrame:
    """Apply one SCD2 batch: close changed current rows, insert their
    replacements, pass everything else through."""
    cur = dim.alias("d")
    upd = updates.alias("u")
    joined = cur.join(upd, on=key, how="left")
    changed = F.col("d.is_current") & F.col(f"u.{attr}_new").isNotNull() & (
        F.col(f"d.{attr}") != F.col(f"u.{attr}_new")
    )
    # existing rows: closed if a differing update hit a current row
    existing = joined.select(
        key,
        f"d.{attr}",
        "d.valid_from",
        F.when(changed, F.lit(change_date).cast("date")).otherwise(F.col("d.valid_to")).alias("valid_to"),
        F.when(changed, F.lit(False)).otherwise(F.col("d.is_current")).alias("is_current"),
    )
    # replacement rows for the changed keys
    inserts = (
        cur.join(upd, on=key)
        .filter(F.col("d.is_current") & (F.col(f"d.{attr}") != F.col(f"u.{attr}_new")))
        .select(
            key,
            F.col(f"u.{attr}_new").alias(attr),
            F.lit(change_date).cast("date").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return existing.unionByName(inserts)


@query(
    "sink_scd2_merge",
    """
    WITH dim AS (
      SELECT c_custkey, c_mktsegment,
             DATE '2024-01-01' AS valid_from,
             CAST(NULL AS DATE) AS valid_to,
             true AS is_current
      FROM customer
    ),
    upd AS (
      SELECT c_custkey, 'PROMO' AS seg_new FROM customer WHERE c_custkey % 10 = 0
    ),
    existing AS (
      SELECT d.c_custkey, d.c_mktsegment, d.valid_from,
             CASE WHEN u.c_custkey IS NOT NULL AND d.c_mktsegment <> u.seg_new
                  THEN DATE '2024-06-01' ELSE d.valid_to END AS valid_to,
             CASE WHEN u.c_custkey IS NOT NULL AND d.c_mktsegment <> u.seg_new
                  THEN false ELSE d.is_current END AS is_current
      FROM dim d LEFT JOIN upd u USING (c_custkey)
    ),
    inserts AS (
      SELECT d.c_custkey, u.seg_new AS c_mktsegment,
             DATE '2024-06-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
             true AS is_current
      FROM dim d JOIN upd u USING (c_custkey)
      WHERE d.c_mktsegment <> u.seg_new
    )
    SELECT * FROM existing UNION ALL SELECT * FROM inserts
    """,
)
def sink_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge end-to-end: seed the customer dimension as current
    rows, apply a PROMO-segment update batch for every 10th key, write
    the result table, read it back.  The oracle replays the identical
    close+insert logic in SQL — every closed row, replacement row, and
    untouched row is value-checked."""
    base = f"/tmp/sgdata/{os.path.basename(sf_dir.rstrip('/'))}/scd2_dim"
    dim = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.lit("2024-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 == 0)
        .select("c_custkey", F.lit("PROMO").alias("c_mktsegment_new"))
    )
    merged = scd2_apply(dim, updates, "c_custkey", "c_mktsegment", "2024-06-01")
    merged.write.mode("overwrite").parquet(base)
    return spark.read.parquet(base)
