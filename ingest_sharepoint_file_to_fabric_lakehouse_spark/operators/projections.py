"""Projections / filters / predicates (SURVEY.md §2 B.2).

Reference parity: the reference projects Graph items into a 7-column
manifest (sharepoint_to_bronze_delta.py:141-149 → project_select),
renames/subsets display columns (utility_sp_grant_siteselected.py:149
→ project_rename_drop), and filters with first-match / is-file
predicates (sharepoint_to_bronze_delta.py:66,140 → filter_*).

Scale notes: every query here is a single narrow scan→filter→project
stage — no shuffle at all.  Predicates and column lists reach the
parquet reader (PushedFilters / ReadSchema in .explain), so at 100 TB
these are IO-bound scans reading only the referenced columns and
row-groups whose min/max stats pass the predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import query, t


@query(
    "project_select",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_quantity * 2.0 AS dbl_qty,
           'lineitem' AS src
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns + alias + lit constant (ref :141-149)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("disc_price"),
        (F.col("l_quantity") * F.lit(2.0)).alias("dbl_qty"),
        F.lit("lineitem").alias("src"),
    )


@query(
    "project_rename_drop",
    """
    SELECT c_custkey AS customer_id, c_name AS customer_name, c_mktsegment
    FROM customer
    """,
)
def project_rename_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """withColumnRenamed + drop (ref utility:149)."""
    return (
        t(spark, sf_dir, "customer")
        .withColumnRenamed("c_custkey", "customer_id")
        .withColumnRenamed("c_name", "customer_name")
        .drop("c_acctbal", "c_nationkey")
    )


@query(
    "filter_comparison",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
    FROM lineitem
    WHERE (l_quantity < 5 OR l_quantity >= 45)
      AND l_discount <> 0.0
      AND NOT (l_tax <= 0.01)
    """,
)
def filter_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """<, >=, !=, AND/OR/NOT composite predicate (ref :66,140)."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_quantity") < 5) | (F.col("l_quantity") >= 45))
        & (F.col("l_discount") != 0.0)
        & ~(F.col("l_tax") <= 0.01)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")


@query(
    "filter_in_set",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def filter_in_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list filter — the folder allow-list pattern (config.py:22-29)."""
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )


@query(
    "filter_like",
    """
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%widget%' AND regexp_matches(p_type, '^(ECONOMY|PROMO)')
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE + rlike pattern matching (generalizes sanitizer A-15)."""
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%") & F.col("p_type").rlike("^(ECONOMY|PROMO)"))
        .select("p_partkey", "p_name", "p_type")
    )


@query(
    "filter_null",
    """
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'P') AS status_np,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_filled
    FROM orders
    WHERE NULLIF(o_orderstatus, 'O') IS NOT NULL
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isNull/isNotNull/coalesce/nullif semantics (ref A-9: missing facet ⇒ null)."""
    o = t(spark, sf_dir, "orders").withColumn("status_np", F.expr("nullif(o_orderstatus, 'P')"))
    return (
        o.filter(F.expr("nullif(o_orderstatus, 'O')").isNotNull())
        .select(
            "o_orderkey",
            "status_np",
            F.coalesce(F.col("status_np"), F.lit("PENDING")).alias("status_filled"),
        )
    )


@query(
    "filter_between_date",
    """
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-03-31 23:59:59'
    """,
)
def filter_between_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp range predicate → parquet row-group pruning at scale."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1996-03-31 23:59:59").cast("timestamp"),
            )
        )
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )
