"""Scalar function surface (SURVEY.md §2 B.7): string / date / math /
conditional / cast / array / map-json / hash.

Reference parity: name sanitizing (sharepoint_to_bronze_delta.py:208
→ str_basic/str_regex), tz-aware timestamp formatting (:122,190 →
date_format_tz), boolean-string parsing (:222,229 → cast_types,
cond_case_when), Graph JSON navigation (:55,65,76 → map_json_ops),
timestamped archive names (:189-191 → str_basic concat).

All expressions are built-in ``pyspark.sql.functions`` — JVM-side,
inside whole-stage codegen; zero Python in the hot path.  Row-level
IEEE arithmetic is deterministic, so these need no decimal tricks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import dec, query, t


@query(
    "str_basic",
    """
    SELECT p_partkey,
           upper(p_name) AS name_up,
           lower(p_brand) AS brand_lo,
           concat(p_type, '_', p_brand) AS type_brand,
           substring(p_name, 1, 5) AS name_pfx,
           length(p_name) AS name_len,
           trim('  ' || p_name || ' ') AS name_trim,
           replace(p_name, '''', '_') AS name_sanitized
    FROM part
    """,
)
def str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat/substring/case/trim/length + the A-15 quote sanitizer."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_up"),
        F.lower("p_brand").alias("brand_lo"),
        F.concat_ws("_", "p_type", "p_brand").alias("type_brand"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.regexp_replace("p_name", "'", "_").alias("name_sanitized"),
    )


@query(
    "str_regex",
    """
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS name_starred,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           split_part(p_name, ' ', 1) AS first_word
    FROM part
    """,
)
def str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_replace / regexp_extract / split (A-15 generalized)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "*").alias("name_starred"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
    )


@query(
    "date_format_tz",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_log_fmt,
           strftime(o_orderdate, '%d%m%y%H%M%S') AS ts_archive_fmt,
           strftime(o_orderdate, '%d%m%y%H%M%S') || '_' || 'report.csv' AS archive_name,
           o_orderdate + INTERVAL 8 HOUR AS ts_kul,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def date_format_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp formatting + KL-timezone shift + truncation.

    Mirrors the reference's two formats: log ``%Y-%m-%d %H:%M:%S``
    (sharepoint_to_bronze_delta.py:122) and archive-name prefix
    ``%d%m%y%H%M%S`` with ``{ts}_{name}`` concat (:189-191).
    Asia/Kuala_Lumpur is fixed UTC+8 (no DST), so the oracle uses a
    literal 8-hour interval while Spark uses the named zone.
    """
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    ts = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(ts, "yyyy-MM-dd HH:mm:ss").alias("ts_log_fmt"),
        F.date_format(ts, "ddMMyyHHmmss").alias("ts_archive_fmt"),
        F.concat_ws("_", F.date_format(ts, "ddMMyyHHmmss"), F.lit("report.csv")).alias("archive_name"),
        F.to_timestamp_ntz(F.from_utc_timestamp(ts.cast("timestamp"), "Asia/Kuala_Lumpur")).alias("ts_kul"),
        F.date_trunc("month", ts).cast("timestamp_ntz").alias("month_start"),
    )


@query(
    "date_arith",
    """
    SELECT l_orderkey, l_linenumber,
           year(l_shipdate) AS ship_year,
           month(l_shipdate) AS ship_month,
           day(l_shipdate) AS ship_day,
           CAST(dayofweek(l_shipdate) AS INT) + 1 AS ship_dow,
           l_shipdate + INTERVAL 30 DAY AS due_date,
           date_diff('day', CAST('1995-01-01' AS TIMESTAMP), l_shipdate) AS days_since_epoch_start
    FROM lineitem
    WHERE l_orderkey < 300
    """,
)
def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract / add / diff date arithmetic over fixture timestamps.

    Note: DuckDB ``dayofweek`` is 0=Sunday; Spark ``dayofweek`` is
    1=Sunday — oracle adds 1 to align.
    """
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    d = F.col("l_shipdate")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.year(d).alias("ship_year"),
        F.month(d).alias("ship_month"),
        F.dayofmonth(d).alias("ship_day"),
        F.dayofweek(d).alias("ship_dow"),
        (d + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).alias("days_since_epoch_start"),
    )


@query(
    "math_expr",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
           l_extendedprice / l_quantity AS unit_price,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,4)), 0) AS DOUBLE) AS price_round,
           abs(l_discount - 0.05) AS disc_dev,
           power(l_quantity, 2) AS qty_sq,
           sqrt(l_quantity) AS qty_sqrt,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod
    FROM lineitem
    WHERE l_orderkey < 300
    """,
)
def math_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic expression surface — the TPC-H revenue shape (B.7)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias("charged"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        F.round(dec("l_extendedprice"), 0).cast("double").alias("price_round"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@query(
    "cond_case_when",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN 'finished'
                WHEN o_orderstatus = 'O' THEN 'open'
                ELSE 'other' END AS status_label,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_band,
           CASE WHEN lower('True') = 'true' THEN TRUE ELSE FALSE END AS archive_flag
    FROM orders
    """,
)
def cond_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN chains + the A-17 boolean-string parse pattern."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_label"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_band"),
        (F.lower(F.lit("True")) == "true").alias("archive_flag"),
    )


@query(
    "cast_types",
    """
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(o_orderkey AS DOUBLE) AS key_dbl,
           CAST('true' AS BOOLEAN) AS flag_true,
           CAST('False' AS BOOLEAN) AS flag_false,
           CAST('2024-03-01 12:30:00' AS TIMESTAMP) AS ts_lit,
           CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts incl. the reference's string→bool flags (A-17, ref :222,229)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.lit("true").cast("boolean").alias("flag_true"),
        F.lit("False").cast("boolean").alias("flag_false"),
        F.lit("2024-03-01 12:30:00").cast("timestamp_ntz").alias("ts_lit"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_num"),
    )


@query(
    "array_ops",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           array_to_string(string_split(text, ' ')[2:4], ',') AS tokens_2_to_4,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           array_to_string(list_sort(string_split(substring(text, 1, 40), ' ')), ',')
             AS sorted_head_tokens,
           len(list_filter(string_split(text, ' '), x -> length(x) > 4)) AS n_long_tokens
    FROM documents
    """,
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode-free array surface: size/element_at/slice/contains/sort +
    higher-order filter — over tokenized document text.

    Array-typed intermediates are emitted comma-joined (array_join):
    result cells stay hashable for order-insensitive value comparison
    (same discipline as agg_collect)."""
    d = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_join(F.slice(toks, 2, 3), ",").alias("tokens_2_to_4"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(
            F.sort_array(F.split(F.substring("text", 1, 40), " ")), ","
        ).alias("sorted_head_tokens"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long_tokens"),
    )


@query(
    "map_json_ops",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_val,
           CAST(json_extract(props, '$.missing') AS INT) AS missing_val,
           CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket
    FROM events
    WHERE event_id < 500
    """,
)
def map_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field navigation on events.props — the Graph-JSON pattern
    (sharepoint_to_bronze_delta.py:55,65,76)."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        k.alias("k_val"),
        F.get_json_object("props", "$.missing").cast("int").alias("missing_val"),
        (k % 10).alias("k_bucket"),
    )


@query(
    "hash_funcs",
    """
    SELECT doc_id,
           sha256(text) AS text_sha256,
           md5(text) AS text_md5,
           sha256(CAST(doc_id AS VARCHAR) || ':' || lang) AS keyed_hash
    FROM documents
    """,
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hashing — file-identity / dedup primitive (north star;
    A-5 archive rename identity)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.sha2("text", 256).alias("text_sha256"),
        F.md5("text").alias("text_md5"),
        F.sha2(F.concat_ws(":", F.col("doc_id").cast("string"), F.col("lang")), 256).alias("keyed_hash"),
    )
