"""Sorts / limits / top-k / set operations / dedup (SURVEY.md §2 B.6).

Reference parity: first-match limit (sharepoint_to_bronze_delta.py:66
→ limit_n), multi-folder manifest union (config.py:22-29 →
set_union_*), incremental diffing (A-7 → set_except/intersect),
north-star dedup (→ dedup_*).

Scale notes: sorts that feed a LIMIT compile to TakeOrderedAndProject
(per-partition top-k + driver merge of k·partitions rows — never a
global sort).  Subset dedup is implemented as a keyed window keep-first
rather than ``dropDuplicates`` so the surviving row is deterministic —
same one row on any cluster layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..core import query, t


@query(
    "sort_multi_nulls",
    """
    SELECT o_orderkey, status_np, o_totalprice,
           row_number() OVER (ORDER BY status_np DESC NULLS LAST,
                              o_totalprice DESC, o_orderkey) AS rn
    FROM (
      SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_np, o_totalprice
      FROM orders
      ORDER BY NULLIF(o_orderstatus, 'P') DESC NULLS LAST, o_totalprice DESC, o_orderkey
      LIMIT 100
    )
    """,
)
def sort_multi_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort with explicit null ordering; rank attached so
    the order itself is value-checked (hash compare is order-blind).

    Scale shape: sort+limit first (TakeOrderedAndProject — per-partition
    top-k, no global sort), then a global row_number on the 100
    surviving rows only.
    """
    o = t(spark, sf_dir, "orders").withColumn("status_np", F.expr("nullif(o_orderstatus,'P')"))
    order = [F.col("status_np").desc_nulls_last(), F.col("o_totalprice").desc(), F.col("o_orderkey")]
    top = o.select("o_orderkey", "status_np", "o_totalprice").orderBy(*order).limit(100)
    return top.select("*", F.row_number().over(Window.orderBy(*order)).alias("rn"))


@query(
    "limit_n",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-N (sort + limit ⇒ TakeOrderedAndProject)."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "topk_per_group",
    """
    SELECT * FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rn <= 5
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k: 5 biggest orders per market segment ("latest N
    files per folder")."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
    )


@query(
    "set_union_all",
    """
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer WHERE c_acctbal > 5000
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by name — multi-folder manifest concatenation."""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side"))
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@query(
    "set_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with dedup."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 7000
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 7000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_suppkey < 5
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics, via subtract) — the incremental "new
    files only" diff (A-7)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 5)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


@query(
    "dedup_distinct_rows",
    """
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def dedup_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row distinct."""
    return t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "dedup_subset_keyed",
    """
    SELECT o_custkey, o_orderstatus, o_orderkey AS first_orderkey FROM (
      SELECT o_custkey, o_orderstatus, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey, o_orderstatus
                                ORDER BY o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def dedup_subset_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset dedup with a deterministic survivor (keep lowest key) —
    the correct distributed replacement for pandas drop_duplicates;
    plain ``dropDuplicates([cols])`` keeps an arbitrary row."""
    w = Window.partitionBy("o_custkey", "o_orderstatus").orderBy("o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderstatus", "o_orderkey", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderstatus", F.col("o_orderkey").alias("first_orderkey"))
    )
