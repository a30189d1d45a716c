"""Join surface (SURVEY.md §2 B.3): broadcast, shuffle, multi-key,
outer, semi/anti, cross, theta/range, as-of.

Reference parity: the one real join in the reference is the hand-rolled
N+1 semi-join flagging site accessibility
(utility_sp_grant_siteselected.py:152-168 → join_left_semi); the
incremental "files not yet ingested" pattern implied by A-4/A-7 is
join_left_anti.

Scale notes per join:
* dims (region/nation/customer-slices) are ``broadcast()`` — no
  shuffle of the fact side at all.
* large⋈large (lineitem⋈orders) shuffles both sides on the order key —
  uniform TPC-H-style key, AQE handles residual skew.
* the as-of join is implemented as the single-shuffle union trick
  (tag + union + last_value over window) instead of a range join —
  O(n log n) per partition and one shuffle, vs the O(n·m) per-key
  blow-up of a naive range join; this is the form that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..core import dec, money, query, t


@query(
    "join_broadcast_dim",
    """
    SELECT r_name, n_name,
           count(*) AS n_customers,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast small dims (star schema): zero fact-side shuffle
    until the final aggregation."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            money(F.sum(dec("c_acctbal"))).alias("total_acctbal"),
        )
    )


@query(
    "join_shuffle_large",
    """
    SELECT o_orderstatus,
           count(*) AS n_items,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_shuffle_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two large tables — planner picks shuffle join on the order key."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_items"), money(F.sum(dec("l_quantity"))).alias("total_qty"))
    )


@query(
    "join_multikey_chain",
    """
    SELECT p_brand, s_name,
           count(*) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                       * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_size >= 5
    GROUP BY p_brand, s_name
    """,
)
def join_multikey_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way chained join: fact ⋈ part ⋈ supplier, both broadcast."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_size") >= 5)
    s = t(spark, sf_dir, "supplier")
    rev = money(F.sum(dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(F.count("*").alias("n_lines"), rev.alias("revenue"))
    )


@query(
    "join_outer_left",
    """
    SELECT c_mktsegment,
           count(*) AS n_rows,
           count(o_orderkey) AS n_big_orders,
           count(*) - count(o_orderkey) AS n_unmatched
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 250000) big
      ON c_custkey = big.o_custkey
    GROUP BY c_mktsegment
    """,
)
def join_outer_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join — unmatched rows become nulls, counted per segment."""
    c = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("o_orderkey").alias("n_big_orders"),
            (F.count("*") - F.count("o_orderkey")).alias("n_unmatched"),
        )
    )


@query(
    "join_outer_full",
    """
    SELECT
      COALESCE(n.n_nationkey, c.c_nationkey) AS nationkey,
      CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END AS missing_dim,
      CASE WHEN c.c_nationkey IS NULL THEN 1 ELSE 0 END AS missing_fact,
      COALESCE(c.n_custs, 0) AS n_custs
    FROM (SELECT n_nationkey FROM nation WHERE n_nationkey < 20) n
    FULL OUTER JOIN (
      SELECT c_nationkey, count(*) AS n_custs
      FROM customer WHERE c_acctbal > 0 GROUP BY c_nationkey
    ) c ON n.n_nationkey = c.c_nationkey
    """,
)
def join_outer_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with nulls surfaced on both sides."""
    n = t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 20).select("n_nationkey")
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_custs"))
    )
    j = n.join(c, n.n_nationkey == c.c_nationkey, "full")
    return j.select(
        F.coalesce(n.n_nationkey, c.c_nationkey).alias("nationkey"),
        F.when(n.n_nationkey.isNull(), 1).otherwise(0).alias("missing_dim"),
        F.when(c.c_nationkey.isNull(), 1).otherwise(0).alias("missing_fact"),
        F.coalesce(c.n_custs, F.lit(0)).alias("n_custs"),
    )


@query(
    "join_left_semi",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join: customers having at least one urgent order.

    This is the Spark-native form of the reference's N+1
    accessibility check (utility_sp_grant_siteselected.py:152-168) —
    one distributed semi-join replaces one HTTP round-trip per row.
    """
    c = t(spark, sf_dir, "customer")
    urgent = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_left_anti",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
    )
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join — the "files not yet ingested" incremental pattern
    (A-4/A-7): new_manifest ANTI JOIN ingestion_log."""
    c = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    """
    SELECT r_name, s.o_orderstatus,
           (SELECT count(*) FROM orders o2
            WHERE o2.o_orderstatus = s.o_orderstatus) AS n_status
    FROM region
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two small inputs (building block for
    brute-force similarity)."""
    r = t(spark, sf_dir, "region").select("r_name")
    o = t(spark, sf_dir, "orders")
    statuses = o.groupBy("o_orderstatus").agg(F.count("*").alias("n_status"))
    return r.crossJoin(statuses).select("r_name", "o_orderstatus", "n_status")


@query(
    "join_theta_range",
    """
    SELECT p_brand,
           count(*) AS n_premium_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS premium_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
             AND l_extendedprice > 30 * p_retailprice
    GROUP BY p_brand
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed equi + inequality (theta) join: equi key keeps it a hash
    join with the range predicate applied post-match — at scale this
    stays a broadcast join, never a BNLJ."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(p),
            (li.l_partkey == p.p_partkey) & (li.l_extendedprice > 30 * p.p_retailprice),
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_premium_lines"),
            money(F.sum(dec("l_extendedprice"))).alias("premium_revenue"),
        )
    )


def asof_join_latest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Generic as-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` sharing the ``on`` key.

    Implementation: tag both sides, union, single window sorted by
    (key, ts, side) carrying the right side's values forward with
    ``last(..., ignorenulls=True)``.  ONE shuffle on the key, O(n log n)
    per partition — the scalable alternative to a per-key range join.
    DuckDB oracle equivalent: ``ASOF JOIN``.

    Determinism: the right side is first reduced to ONE row per
    (key, ts) — the lexicographically greatest ``right_cols`` tuple —
    so duplicate right timestamps can never make the surviving match
    engine- or partitioning-dependent.  (At equal ts the window orders
    right rows (side 0) before left rows (side 1), so every left row
    sees the carry including its own timestamp.)
    """
    _extra = [c for c in right_cols if c not in (on, right_ts)]
    if _extra:
        right = (
            right.groupBy(on, right_ts)
            .agg(F.max(F.struct(*[F.col(c) for c in _extra])).alias("_s"))
            .select(on, right_ts, *[F.col(f"_s.{c}").alias(c) for c in _extra])
        )
    else:
        right = right.select(on, right_ts).distinct()
    lcols = left.columns
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tagged.unionByName(r_tagged)
    carried = unioned.select(
        "*", *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}") for c in right_cols]
    )
    return carried.filter(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in right_cols]
    )


@query(
    "join_asof_latest",
    """
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.ts AS asof_ts, c.value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
      SELECT user_id, ts, max(value) AS value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ) c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase enriched with the user's latest click
    at-or-before it (events enrichment, B.3)."""
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "value")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join_latest(purchases, clicks, "user_id", "ts", "ts", ["ts", "value"])
    return joined.select("event_id", "user_id", "ts", "value", "asof_ts", "asof_value")


@query(
    "join_skew_salted",
    """
    WITH f AS (
      SELECT CASE WHEN l_partkey % 10 < 3 THEN 0 ELSE l_partkey END AS sk,
             l_quantity
      FROM lineitem
    ),
    d AS (
      SELECT CASE WHEN p_partkey % 10 < 3 THEN 0 ELSE p_partkey END AS sk,
             min(p_name) AS pname,
             count(*) AS n_parts
      FROM part GROUP BY 1
    )
    SELECT f.sk, d.pname, d.n_parts,
           count(*) AS n_lines,
           CAST(ROUND(SUM(CAST(f.l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_qty
    FROM f JOIN d ON f.sk = d.sk
    WHERE f.sk < 500
    GROUP BY 1, 2, 3
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-salted skew join: ~30% of the fact rows collapse onto ONE
    hot key (a deterministic remap of l_partkey), and a plain shuffle
    join would land that key's entire partition on a single task —
    the classic straggler at 100 TB.

    The salting pattern: the fact side appends ``salt =
    pmod(hash(row), S)`` and the dim side is replicated S ways via
    ``explode(sequence(0, S-1))``, so the join key becomes (sk, salt)
    and the hot key's rows spread across S tasks.  The salt is derived
    from row identity, never from the data values used downstream, so
    the join RESULT is byte-identical to the unsalted join — which is
    exactly what the oracle replays (no salt anywhere in the SQL).

    The shuffle_hash hint pins a shuffled join: at fixture scale the
    planner would broadcast the dim and hide the effect entirely
    (broadcast IS the right plan when the dim fits — salting is for
    the large⋈large case, complementing AQE's skewedJoin which only
    handles sort-merge).  S trades skew spreading against dim
    replication cost; S ≈ ceil(hot-key share x parallelism) keeps
    every task under ~1/parallelism of the rows.
    """
    S = 8
    li = t(spark, sf_dir, "lineitem")
    sk_f = F.when(F.col("l_partkey") % 10 < 3, F.lit(0)).otherwise(
        F.col("l_partkey")
    )
    fact = li.select(
        sk_f.alias("sk"),
        "l_quantity",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(S))
        .cast("int")
        .alias("salt"),
    ).filter(F.col("sk") < 500)
    p = t(spark, sf_dir, "part")
    sk_d = F.when(F.col("p_partkey") % 10 < 3, F.lit(0)).otherwise(
        F.col("p_partkey")
    )
    dim = (
        p.select(sk_d.alias("sk"), "p_name")
        .groupBy("sk")
        .agg(F.min("p_name").alias("pname"), F.count("*").alias("n_parts"))
        .filter(F.col("sk") < 500)
    )
    dim_s = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(S - 1)))
    ).withColumn("salt", F.col("salt").cast("int"))
    joined = fact.join(dim_s.hint("shuffle_hash"), ["sk", "salt"])
    return joined.groupBy("sk", "pname", "n_parts").agg(
        F.count("*").alias("n_lines"),
        money(F.sum(dec("l_quantity"))).alias("total_qty"),
    )


def asof_join_next(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Forward as-of: for each left row, the EARLIEST right row with
    ``right_ts >= left_ts`` sharing the ``on`` key — the mirror of
    :func:`asof_join_latest` (same union + single-window plan, same
    one shuffle on the key), with the frame looking forward
    (``first(..., ignorenulls=True)`` over currentRow→following) and
    left rows ordered BEFORE right rows at equal timestamps so a
    same-instant right row is matched.  Right is reduced to one row
    per (key, ts) exactly as in the backward form, so ties can never
    make the match engine-dependent.
    """
    _extra = [c for c in right_cols if c not in (on, right_ts)]
    if _extra:
        right = (
            right.groupBy(on, right_ts)
            .agg(F.max(F.struct(*[F.col(c) for c in _extra])).alias("_s"))
            .select(on, right_ts, *[F.col(f"_s.{c}").alias(c) for c in _extra])
        )
    else:
        right = right.select(on, right_ts).distinct()
    lcols = left.columns
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    unioned = l_tagged.unionByName(r_tagged)
    carried = unioned.select(
        "*",
        *[
            F.first(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("_side") == 0).select(
        *lcols, *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in right_cols]
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Nearest as-of: for each left row, the right row closest in time
    in EITHER direction sharing the ``on`` key — pandas
    ``merge_asof(direction='nearest')``; ties go to the
    at-or-before match.

    Both directions ride ONE union and ONE shuffle on the key: the
    backward match is ``last(candidate, ignorenulls)`` over the
    preceding frame and the forward match is ``first(candidate,
    ignorenulls)`` over the following frame with the opposite side
    ordering at equal timestamps (so a same-instant right row is
    visible to both).  The candidate payload is carried as one
    nullable STRUCT so the matched (ts, values) tuple is atomic.
    Right is reduced to one row per (key, ts) exactly as in the
    directional forms, so duplicate right timestamps can never make
    the match engine- or partitioning-dependent.  Distances compare
    as exact integer microseconds for timestamps (doubles otherwise).
    """
    from pyspark.sql.types import TimestampNTZType, TimestampType

    _extra = [c for c in right_cols if c not in (on, right_ts)]
    if _extra:
        right = (
            right.groupBy(on, right_ts)
            .agg(F.max(F.struct(*[F.col(c) for c in _extra])).alias("_s"))
            .select(on, right_ts, *[F.col(f"_s.{c}").alias(c) for c in _extra])
        )
    else:
        right = right.select(on, right_ts).distinct()
    lcols = left.columns
    cand_fields = [F.col("_ts").alias("_cts")] + [
        F.col(f"_r_{c}").alias(f"_r_{c}") for c in right_cols
    ]
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in right_cols
        ],
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged).withColumn(
        "_cand", F.when(F.col("_side") == 0, F.struct(*cand_fields))
    )
    wb = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "*",
        F.last("_cand", ignorenulls=True).over(wb).alias("_b"),
        F.first("_cand", ignorenulls=True).over(wf).alias("_f"),
    ).filter(F.col("_side") == 1)

    ts_type = left.schema[left_ts].dataType

    def num(col: Column) -> Column:
        if isinstance(ts_type, (TimestampType, TimestampNTZType)):
            return F.unix_micros(col.cast("timestamp"))
        return col.cast("double")

    back_wins = (
        F.col("_f").isNull()
        | (
            F.col("_b").isNotNull()
            & (num(F.col("_ts")) - num(F.col("_b._cts"))
               <= num(F.col("_f._cts")) - num(F.col("_ts")))
        )
    )
    winner = F.when(back_wins, F.col("_b")).otherwise(F.col("_f"))
    return carried.select(
        *lcols, *[winner[f"_r_{c}"].alias(f"asof_{c}") for c in right_cols]
    )


@query(
    "join_asof_next_within",
    """
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    c AS (
      SELECT user_id, ts, max(value) AS value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    m AS (
      SELECT p.event_id, min(c.ts) AS asof_ts
      FROM p JOIN c
        ON p.user_id = c.user_id
       AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 15 MINUTES
      GROUP BY p.event_id
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           m.asof_ts, c.value AS asof_value
    FROM p
    LEFT JOIN m USING (event_id)
    LEFT JOIN c ON c.user_id = p.user_id AND c.ts = m.asof_ts
    """,
)
def join_asof_next_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: each purchase matched to the
    user's NEXT click within 15 minutes (reaction-time enrichment —
    the mirror of join_asof_latest, completing the as-of family:
    backward, forward, bounded).

    The tolerance is applied AFTER the single-window forward carry:
    the nearest future click is unique, so if it falls outside the
    bound there is provably no click inside it, and the match nulls
    out.  Plan: one shuffle on user_id, O(n log n) per partition — the
    oracle replays it as a bounded range join + argmin, which is the
    quadratic form this operator avoids at scale.
    """
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join_next(
        purchases, clicks, "user_id", "ts", "ts", ["ts", "value"]
    )
    within = F.col("asof_ts") <= F.col("ts") + F.expr("INTERVAL 15 MINUTES")
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(within, F.col("asof_ts")).alias("asof_ts"),
        F.when(within, F.col("asof_value")).alias("asof_value"),
    )


@query(
    "join_interval_banded",
    """
    WITH t0 AS (SELECT min(epoch_us(ts)) AS t0us FROM events),
    iv AS (
      SELECT CAST(t.i AS INT) AS interval_id,
             t0.t0us + t.i * 21600000000 AS s_us,
             t0.t0us + t.i * 21600000000 + 5400000000 AS e_us
      FROM t0, range(0, 20) t(i)
    )
    SELECT iv.interval_id,
           count(*) AS n_events,
           CAST(SUM(ev.event_id) AS BIGINT) AS id_checksum
    FROM iv JOIN events ev
      ON epoch_us(ev.ts) >= iv.s_us AND epoch_us(ev.ts) <= iv.e_us
    GROUP BY iv.interval_id
    ORDER BY iv.interval_id
    """,
)
def join_interval_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join with NO equi key — the shape that
    silently degenerates to a broadcast nested-loop join (every event
    compared to every interval) unless you band it: both sides are
    bucketed into fixed time bands the width of the longest interval,
    intervals explode into each band they overlap, and the join
    becomes EQUI on band with the range predicate as a post-filter.
    Each event is compared only against intervals sharing its band —
    O(events + intervals·bands) instead of O(events × intervals).

    Time is integer microseconds end to end (epoch_us both engines),
    so band arithmetic is integer-exact across engines.  20
    maintenance windows (90 min every 6 h from the corpus start) are
    derived from one control-plane scalar (min event time).  The
    oracle is the naive range join the banding avoids.  At 100 TB the
    banded form also partition-prunes: band is a monotone function of
    time, so a time-partitioned fact only opens partitions whose
    bands appear in the (broadcast) interval list.
    """
    W = 5_400_000_000  # band width: the max interval length (90 min)
    e = t(spark, sf_dir, "events").select(
        "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )
    t0us = e.agg(F.min("ts_us")).first()[0]
    iv = spark.range(0, 20).select(
        F.col("id").cast("int").alias("interval_id"),
        (F.lit(t0us) + F.col("id") * 21_600_000_000).alias("s_us"),
        (F.lit(t0us) + F.col("id") * 21_600_000_000 + 5_400_000_000).alias("e_us"),
    )
    iv_bands = iv.withColumn(
        "band",
        F.explode(
            F.sequence(F.expr(f"s_us div {W}"), F.expr(f"e_us div {W}"))
        ),
    )
    ev = e.withColumn("band", F.expr(f"ts_us div {W}"))
    joined = ev.join(F.broadcast(iv_bands), "band").filter(
        (F.col("ts_us") >= F.col("s_us")) & (F.col("ts_us") <= F.col("e_us"))
    )
    return (
        joined.groupBy("interval_id")
        .agg(F.count("*").alias("n_events"), F.sum("event_id").alias("id_checksum"))
        .orderBy("interval_id")
    )


@query(
    "join_runtime_bloom",
    """
    SELECT month, n_items, revenue FROM (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             count(*) AS n_items,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                         * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY month
    ) ORDER BY month
    """,
)
def join_runtime_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle join with a RUNTIME BLOOM FILTER pushed to the fact side.

    The selective dim filter (urgent orders only) makes most lineitem
    rows join-dead, but a plain sort-merge join still shuffles all of
    them.  Spark's InjectRuntimeFilter turns the filtered orders side
    into a ``bloom_filter_agg`` subquery whose ``might_contain`` test
    is evaluated ON THE SCAN of lineitem — join-dead rows are dropped
    before the exchange, cutting shuffle bytes by the filter's
    selectivity (~1/5 here).  At 100 TB this is the difference between
    shuffling the whole fact table and shuffling only matching rows —
    the dynamic-filtering analogue of static partition pruning, for
    non-partition keys (``join_dynamic_partition_pruned`` covers the
    partition-key case).

    Broadcast is disabled for this plan (a broadcast join needs no
    bloom — the filter exists precisely for the too-big-to-broadcast
    dim); the thresholds are per-query session confs restored by
    ``prep`` before the next query.  ``tests/test_plans.py`` asserts
    ``might_contain`` guards the lineitem scan.
    """
    from ..core import mark_conf_dirty

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1"
    )
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    # the toggles must OUTLIVE this call (the plan optimizes at action
    # time), so flag the session for the next prep's re-pin instead of
    # restoring here
    mark_conf_dirty(spark)
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    rev = money(F.sum(dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.count("*").alias("n_items"), rev.alias("revenue"))
        .orderBy("month")
    )


@query(
    "join_null_skew_split",
    """
    WITH o AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_custkey END AS join_key
      FROM orders
    )
    SELECT COALESCE(c_mktsegment, '<null-key>') AS segment,
           count(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
    FROM o LEFT JOIN customer ON join_key = c_custkey
    GROUP BY segment
    ORDER BY segment
    """,
)
def join_null_skew_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join under NULL-KEY SKEW, with the null rows routed
    AROUND the join — the manual fix for the hottest skew key there
    is.

    A third of the fact rows here carry a NULL join key.  Nulls never
    match, but a naive outer join still hashes them all to ONE
    reducer partition — the classic single-straggler task that stalls
    a 1000-executor job (AQE's skew splitting handles oversized VALUE
    keys, but a null flood is better never shuffled at all).  The
    scale shape: split the input on ``join_key IS NULL``, join only
    the non-null stream, project the null stream straight to its
    unmatched output (no exchange for those rows), and UNION the
    branches — asserted in tests as a Union whose join branch filters
    to non-null keys.

    Semantically identical to the plain LEFT JOIN the oracle runs,
    because SQL null keys never match anyway — only the physical
    distribution differs, which is the point.
    """
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None)).otherwise(F.col("o_custkey")).alias(
            "join_key"
        ),
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    matched = o.filter(F.col("join_key").isNotNull()).join(
        c, F.col("join_key") == F.col("c_custkey"), "left"
    ).select("o_totalprice", "c_mktsegment")
    nulls = o.filter(F.col("join_key").isNull()).select(
        "o_totalprice", F.lit(None).cast("string").alias("c_mktsegment")
    )
    return (
        matched.unionAll(nulls)
        .groupBy(F.coalesce("c_mktsegment", F.lit("<null-key>")).alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            money(F.sum(dec("o_totalprice"))).alias("total"),
        )
        .orderBy("segment")
    )


@query(
    "join_interval_overlap",
    """
    WITH ev AS (
      SELECT user_id, ts, event_id FROM events WHERE user_id < 20
    ),
    gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTES
                  THEN 1 ELSE 0 END AS new_s
      FROM ev
    ),
    sess AS (
      SELECT user_id,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid,
             ts
      FROM gaps
    ),
    iv AS (
      -- floor(), not a raw ::BIGINT cast: DuckDB's double->int cast
      -- ROUNDS while Spark's unix_seconds FLOORS, and a sub-second
      -- fraction rounding the other way manufactures or destroys a
      -- zero-length touching overlap (caught by the sf0.001 sweep:
      -- one boundary pair diverged; sf0.01 never exposed it)
      SELECT user_id, sid,
             CAST(floor(epoch(min(ts))) AS BIGINT) AS s,
             CAST(floor(epoch(max(ts))) AS BIGINT) AS e
      FROM sess GROUP BY user_id, sid
    ),
    pairs AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             least(a.e, b.e) - greatest(a.s, b.s) AS ov
      FROM iv a JOIN iv b
        ON a.user_id < b.user_id
       AND a.s <= b.e AND b.s <= a.e
    )
    SELECT user_a, user_b,
           count(*) AS n_overlaps,
           CAST(SUM(ov) AS BIGINT) AS total_overlap_s
    FROM pairs
    GROUP BY 1, 2
    ORDER BY user_a, user_b
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval x interval OVERLAP join: which user pairs were active
    simultaneously, and for how long — co-presence / concurrent-
    session detection (fraud rings, shared accounts, capacity
    planning), the two-sided generalization of the point-in-interval
    join_interval_banded.

    Sessions are the 30-minute-gap islands per user (closed-form, the
    stream_session oracle's construction); overlap seconds are exact
    integer epoch arithmetic.  The engine bands BOTH interval sets
    into the fixed time buckets they span (map-side fan-out bounded
    by session length / band width) and joins band-to-band — an equi
    join whose candidates are only the intervals sharing an hour —
    then applies the exact overlap predicate and dedups pairs that
    share several bands.  The oracle replays the O(n*m) theta join
    the banding avoids.  At 100 TB: candidate volume is per-band
    density squared (AQE skew handling on hot hours), versus the
    nested-loop the raw inequality join would plan; a minimum-
    recurrence floor (HAVING) would keep the report to repeat pairs
    on a denser corpus.
    """
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.withColumn(
            "new_s",
            F.when(
                F.lag("ts").over(w).isNull()
                | (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
                    > 30 * 60 * 1_000_000
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)))
        .groupBy("user_id", "sid")
        .agg(
            F.unix_seconds(F.min("ts").cast("timestamp")).alias("s"),
            F.unix_seconds(F.max("ts").cast("timestamp")).alias("e"),
        )
        .localCheckpoint(eager=True)
    )
    band = 3600  # 1-hour bands
    banded = sess.select(
        "user_id",
        "sid",
        "s",
        "e",
        F.explode(F.sequence(F.expr(f"s div {band}"), F.expr(f"e div {band}"))).alias("bnd"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bnd") == F.col("b.bnd"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("a.sid").alias("sid_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("b.sid").alias("sid_b"),
            (
                F.least(F.col("a.e"), F.col("b.e"))
                - F.greatest(F.col("a.s"), F.col("b.s"))
            ).alias("ov"),
        )
        .distinct()  # a pair overlapping across k shared bands counts once
    )
    return (
        pairs.groupBy("user_a", "user_b")
        .agg(F.count("*").alias("n_overlaps"), F.sum("ov").cast("long").alias("total_overlap_s"))
        .orderBy("user_a", "user_b")
    )


@query(
    "join_null_safe_eq",
    """
    WITH a AS (
      SELECT c_custkey, nullif(c_nationkey % 7, 3) AS k
      FROM customer WHERE c_custkey < 300
    ),
    b AS (
      SELECT s_suppkey, nullif(s_nationkey % 7, 3) AS k
      FROM supplier
    )
    SELECT COALESCE(CAST(a.k AS VARCHAR), 'NULL') AS k,
           count(*) AS n_pairs,
           CAST(SUM(a.c_custkey + b.s_suppkey) AS BIGINT) AS pair_checksum
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY 1
    ORDER BY 1
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``IS NOT DISTINCT FROM`` /
    ``eqNullSafe``): NULL keys MATCH each other instead of silently
    dropping — the semantics survivorship/merge pipelines need when
    'unknown' is itself a join value (both sides' unparsed categories
    must pair up, not vanish).

    The nullable key is derived deterministically (``nullif(x % 7,
    3)``) so the NULL bucket is reproducibly populated.  Catalyst
    plans ``<=>`` as a hash join on a null-safe key (NULLs hash to
    one bucket) — at scale the NULL group is the classic hot key
    (join_null_skew_split routes it AROUND the join when null should
    NOT match; this operator is the opposite contract, where it
    must), so salting or AQE skew-split applies to the null bucket
    like any other hot key.  Integer checksums keep the oracle
    order-insensitive.
    """
    a = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 300)
        .select("c_custkey", F.nullif(F.col("c_nationkey") % 7, F.lit(3)).alias("ka"))
    )
    b = t(spark, sf_dir, "supplier").select(
        "s_suppkey", F.nullif(F.col("s_nationkey") % 7, F.lit(3)).alias("kb")
    )
    joined = a.join(b, F.col("ka").eqNullSafe(F.col("kb")))
    return (
        joined.groupBy(
            F.coalesce(F.col("ka").cast("string"), F.lit("NULL")).alias("k")
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.col("c_custkey") + F.col("s_suppkey")).cast("long").alias("pair_checksum"),
        )
        .orderBy("k")
    )


@query(
    "join_asof_nearest",
    """
    WITH p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts, max(value) AS value
          FROM events WHERE event_type = 'click'
          GROUP BY user_id, ts),
    b AS (SELECT p.event_id, c.ts AS b_ts, c.value AS b_value
          FROM p ASOF LEFT JOIN c
            ON p.user_id = c.user_id AND p.ts >= c.ts),
    f AS (SELECT p.event_id, c.ts AS f_ts, c.value AS f_value
          FROM p ASOF LEFT JOIN c
            ON p.user_id = c.user_id AND p.ts <= c.ts)
    SELECT p.event_id, p.user_id, p.ts, p.value,
           CASE WHEN f.f_ts IS NULL THEN b.b_ts
                WHEN b.b_ts IS NULL THEN f.f_ts
                WHEN epoch_us(p.ts) - epoch_us(b.b_ts)
                     <= epoch_us(f.f_ts) - epoch_us(p.ts)
                THEN b.b_ts ELSE f.f_ts END AS nearest_ts,
           CASE WHEN f.f_ts IS NULL THEN b.b_value
                WHEN b.b_ts IS NULL THEN f.f_value
                WHEN epoch_us(p.ts) - epoch_us(b.b_ts)
                     <= epoch_us(f.f_ts) - epoch_us(p.ts)
                THEN b.b_value ELSE f.f_value END AS nearest_value
    FROM p JOIN b ON b.event_id = p.event_id
           JOIN f ON f.event_id = p.event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-in-time as-of join — the third as-of direction next to
    backward (join_asof_latest) and forward (join_asof_next_within):
    each purchase takes whichever same-user click is closest in time,
    in either direction, ties to the earlier click.  This is pandas'
    ``merge_asof(direction='nearest')`` and the standard sensor-fusion
    alignment when readings may lag OR lead the anchor.

    Single-pass plan: ONE events scan (`event_type IN (purchase,
    click)`, pushed) tagged anchor/candidate, then ONE user_id
    exchange carrying BOTH directions as window frames over the same
    partitioning — the backward match is `last(candidate,
    ignorenulls)` over the preceding frame (candidates sorted before
    anchors at equal ts, value ASC, so the carried row is the
    max-value candidate at the latest ts <= anchor — the same
    per-(key, ts) dedup the oracle's `max(value)` pre-aggregate
    does), and the forward match is `first(candidate, ignorenulls)`
    over the following frame with the opposite intra-ts ordering
    (anchors first, value DESC).  The earlier composition of two
    independent as-of subplans + an event_id re-join cost 5 events
    scans and 4 exchanges; this is 1 scan + 1 exchange + 2 sorts —
    the shape a 100 TB sensor-fusion alignment actually wants.  The
    nearest pick is a map-side CASE over exact integer microsecond
    distances (unix_micros / epoch_us agree bit-for-bit; a
    same-instant click has distance 0 on the backward side and always
    wins, so the backward/forward overlap at equality is consistent
    by construction).  The oracle replays both directions with
    DuckDB's native ASOF JOIN and the identical tie rule.
    """
    e = t(spark, sf_dir, "events")
    u = e.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("event_type") == "purchase").cast("int").alias("_side"),
        # candidate payload as ONE nullable struct so the window carry
        # is atomic — independent last(_c_ts)/last(_c_value) could pair
        # a ts with another row's value if a click value were NULL
        F.when(
            F.col("event_type") == "click", F.struct("ts", "value")
        ).alias("_cand"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("_side"), F.col("_cand.value"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("_side").desc(), F.col("_cand.value").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    both = (
        u.select(
            "*",
            F.last("_cand", ignorenulls=True).over(wb).alias("_b"),
            F.first("_cand", ignorenulls=True).over(wf).alias("_f"),
        )
        .filter(F.col("_side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            F.col("_b.ts").alias("b_ts"),
            F.col("_b.value").alias("b_value"),
            F.col("_f.ts").alias("f_ts"),
            F.col("_f.value").alias("f_value"),
        )
    )

    # unix_micros needs TIMESTAMP; the ntz cast is identity under the
    # session's pinned UTC (core.prep), so the micros are exact
    def us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    back_wins = us("ts") - us("b_ts") <= us("f_ts") - us("ts")
    return both.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(F.col("f_ts").isNull(), F.col("b_ts"))
        .when(F.col("b_ts").isNull(), F.col("f_ts"))
        .when(back_wins, F.col("b_ts"))
        .otherwise(F.col("f_ts"))
        .alias("nearest_ts"),
        F.when(F.col("f_ts").isNull(), F.col("b_value"))
        .when(F.col("b_ts").isNull(), F.col("f_value"))
        .when(back_wins, F.col("b_value"))
        .otherwise(F.col("f_value"))
        .alias("nearest_value"),
    )
