"""Declarative data-quality expectations (Deequ/Great-Expectations
shape): a rule suite evaluated against a table in as few passes as the
rule types allow, returning one row per rule with its violation count.

This is the validation gate a 100 TB ingest pipeline runs between
bronze and silver — the engine-side complement of scan_observe_metrics
(in-flight telemetry) and scan_table_stats (profiling): here the
OUTPUT is the pass/fail contract.

Scale notes: every row-local rule (null / range / set / pattern)
compiles to a conditional aggregate in ONE shared scan — adding a rule
adds a column, not a pass.  Uniqueness needs key cardinality: one
extra exchange on the key (count vs count-distinct; swap in the
bitmap/HLL partials from agg_bitmap_distinct/agg_sketch_hll_merge when
exactness can relax).  Referential integrity is a broadcast anti-join
against the dimension.  All rule results are single-row aggregates
unioned into a control-plane-sized report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import query, t

_DQ_SQL = """
WITH rowlocal AS (
  SELECT
    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS null_orderkey,
    CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
             THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_price,
    CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
             THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
    CAST(SUM(CASE WHEN o_orderdate < DATE '1992-01-01'
                    OR o_orderdate >= DATE '2005-01-01'
             THEN 1 ELSE 0 END) AS BIGINT) AS date_out_of_range,
    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_orderkey,
    count(*) AS n_rows
  FROM orders
),
ri AS (
  SELECT count(*) AS orphan_custkey
  FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c
                    WHERE c.c_custkey = o.o_custkey)
)
SELECT rule, n_violations, n_rows,
       (n_violations = 0) AS passed
FROM (
  SELECT 'orderkey_not_null' AS rule, null_orderkey AS n_violations, n_rows
  FROM rowlocal
  UNION ALL
  SELECT 'totalprice_positive', nonpositive_price, n_rows FROM rowlocal
  UNION ALL
  SELECT 'orderstatus_in_set', bad_status, n_rows FROM rowlocal
  UNION ALL
  SELECT 'orderdate_in_range', date_out_of_range, n_rows FROM rowlocal
  UNION ALL
  SELECT 'orderkey_unique', dup_orderkey, n_rows FROM rowlocal
  UNION ALL
  SELECT 'custkey_references_customer', ri.orphan_custkey, rowlocal.n_rows
  FROM ri, rowlocal
)
ORDER BY rule
"""


@query("dq_expectations", _DQ_SQL)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-rule expectation suite over ``orders``: not-null, positive
    range, accepted values, date range, key uniqueness, and
    referential integrity against ``customer`` — each reported as
    (rule, n_violations, n_rows, passed).

    Plan discipline: the four row-local rules and the uniqueness rule
    ride ONE aggregate over a single scan (conditional sums + a
    count-distinct on the key); referential integrity is a left-anti
    ``NOT EXISTS`` that Catalyst plans as a broadcast anti-join
    (customer is the dim).  The report pivots the single combined row
    to 6 rows with ``stack`` — one scan, one anti-join, no per-rule
    rescans, no driver loops, at any scale.
    """
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    rowlocal = o.agg(
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_orderkey"),
        F.sum(
            F.when(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("nonpositive_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        )
        .cast("long")
        .alias("bad_status"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
                | (F.col("o_orderdate") >= F.lit("2005-01-01").cast("date")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("date_out_of_range"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_orderkey"),
        F.count("*").alias("n_rows"),
    )
    orphans = o.join(
        F.broadcast(c.select("c_custkey")),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_anti",
    ).agg(F.count("*").alias("orphan_custkey"))

    # r16 optimization (guide §2.3/§2.4): the report used to be a
    # 6-way union over the 1-row aggregate — each branch REPLAYED the
    # full orders scan+aggregate (7 scans / 10 exchanges in the static
    # plan), held in check only by a fixture-scale page-cache
    # adjudication and a checkpoint_if_large gate above it.  Pivoting
    # the single combined row to 6 report rows with ``stack`` makes
    # the suite cost exactly one orders scan + one anti-join at EVERY
    # scale — no materialization gate needed, no rescans to adjudicate.
    combined = rowlocal.crossJoin(F.broadcast(orphans))
    report = combined.select(
        F.expr(
            "stack(6,"
            " 'orderkey_not_null', null_orderkey,"
            " 'totalprice_positive', nonpositive_price,"
            " 'orderstatus_in_set', bad_status,"
            " 'orderdate_in_range', date_out_of_range,"
            " 'orderkey_unique', dup_orderkey,"
            " 'custkey_references_customer', orphan_custkey"
            ") AS (rule, n_violations)"
        ),
        "n_rows",
    )
    return report.withColumn("passed", F.col("n_violations") == 0).orderBy("rule")


@query(
    "orders_benford_digits",
    """
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                  AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER)
               AS digit
      FROM orders
      WHERE o_totalprice > 0
    ),
    n AS (SELECT count(*) AS total FROM d)
    SELECT digit,
           count(*) AS n_observed,
           CAST(count(*) * 1000000 // (SELECT total FROM n) AS BIGINT)
             AS observed_ppm,
           CAST(ROUND(ln(1.0 + 1.0 / digit) / ln(10.0) * 1000000, 0) AS BIGINT)
             AS benford_ppm
    FROM d
    GROUP BY digit
    ORDER BY digit
    """,
)
def orders_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals — the
    forensic data-quality test (fabricated or systematically generated
    monetary data flunks the logarithmic first-digit distribution;
    auditors run exactly this over ledgers).  Emits per digit the
    observed count, observed share, and the Benford expectation, ready
    for the curator to eyeball or a chi-square gate to consume.

    Exactness: the first digit comes from the INTEGER-cents string
    (integer→string is identical on both engines, and ×100 never
    changes a leading digit — no log10/power float edge at decade
    boundaries); observed shares are exact integral ppm; the Benford
    constants are ln-ratio doubles whose 0-dp rounding sits far from
    any .5 boundary, so both engines fold them to identical integers.

    Scale shape: a map-side digit projection + one 9-group aggregate —
    at 100 TB this is scan bandwidth and a control-plane rollup, the
    same shape as every moment-sketch key.
    """
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    n = d.agg(F.count("*").alias("total"))
    return (
        d.groupBy("digit")
        .agg(F.count("*").alias("n_observed"))
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            "n_observed",
            F.expr("(n_observed * 1000000) div total").alias("observed_ppm"),
            F.round(F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0)) * 1000000, 0)
            .cast("long")
            .alias("benford_ppm"),
        )
        .orderBy("digit")
    )
