"""Reshaping operators: pivot/unpivot, lateral explode, scalar
subqueries, ordered string aggregation — the remaining everyday
analytics surface beyond SURVEY.md §2's explicit checklist.

Scale notes: ``pivot`` with an explicit value list compiles to one
hash aggregate (no extra pass to discover categories — always pass the
list at 100 TB).  ``explode`` is a generator in the same stage as the
scan, no shuffle.  Scalar subqueries compile to a broadcast of one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import dec, money, query, t


@query(
    "pivot_wide",
    """
    SELECT l_returnflag,
           CAST(ROUND(SUM(CASE WHEN l_linestatus = 'F'
                THEN CAST(l_quantity AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS qty_f,
           CAST(ROUND(SUM(CASE WHEN l_linestatus = 'O'
                THEN CAST(l_quantity AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS qty_o
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (explicit value list ⇒ single
    aggregate pass; the oracle states the equivalent CASE WHEN form)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(money(F.sum(dec("l_quantity"))))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    )


@query(
    "unpivot_long",
    """
    SELECT c_custkey, metric, val FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val FROM customer
    ) WHERE c_custkey < 300
    """,
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) two measure columns into (metric, val) rows."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")


@query(
    "explode_lateral",
    """
    SELECT doc_id, pos, token
    FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
      FROM documents
    )
    WHERE doc_id < 40
    """,
)
def explode_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: one row per (doc, position, token) — the lateral
    flatten that feeds every shingle/token pipeline."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    return d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))


@query(
    "scalar_subquery",
    """
    WITH avg_price AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS a
      FROM orders
    )
    SELECT o_orderkey, o_totalprice,
           ROUND(o_totalprice / (SELECT a FROM avg_price), 6) AS price_ratio
    FROM orders
    WHERE o_totalprice > 1.8 * (SELECT a FROM avg_price)
    """,
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (global average) used in both projection and
    predicate — compiles to a one-row broadcast, not a self-join.

    The average goes through the exact-decimal sum (core.dec
    discipline) so the subquery value — and therefore the boundary
    predicate — is bit-identical in both engines.
    """
    t(spark, sf_dir, "orders").createOrReplaceTempView("ssq_orders")
    return spark.sql(
        """
        WITH avg_price AS (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS a
          FROM ssq_orders
        )
        SELECT o_orderkey, o_totalprice,
               ROUND(o_totalprice / (SELECT a FROM avg_price), 6) AS price_ratio
        FROM ssq_orders
        WHERE o_totalprice > 1.8 * (SELECT a FROM avg_price)
        """
    )


@query(
    "string_agg_ordered",
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
    FROM nation
    GROUP BY n_regionkey
    """,
)
def string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): sort_array(collect_list)
    then join — deterministic across any partitioning."""
    return (
        t(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations_csv")
        )
    )
