"""Spatial joins via grid bucketing: the 2-D analogue of the banded
interval join (join_interval_banded) — points bucket into cells sized
to the query radius, and candidate pairs come from a 3x3
neighbor-cell equi-join instead of an all-pairs distance cross join.

Coordinates are synthesized deterministically from keys (the fixture
has no geo columns): position in integer TENTHS of a unit, so every
distance comparison is exact integer arithmetic on both engines — no
sqrt, no float ordering anywhere.

Scale notes: cell size == radius makes the 3x3 neighborhood EXACT for
radius-bounded queries (any point within r of a cell's interior lies
in that cell or an adjacent one); candidate volume is
sum(|cell| x |9 neighbor cells|) — local density squared, not corpus
squared.  The build side explodes x9 (the dilation side should be the
SMALLER relation); at 100 TB both sides partition by cell_x so the
equi-join shuffles on cell keys, and hot cells (cities) fall to the
same AQE skew handling as any hot join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import query, t

_R = 150  # radius in tenths (15.0 units); also the grid cell size

_GEO_SQL = """
WITH cust AS (
  SELECT c_custkey,
         (c_custkey * 37) % 1000 AS x,
         (c_custkey * 73) % 1000 AS y
  FROM customer WHERE c_custkey < 500
),
supp AS (
  SELECT s_suppkey,
         (s_suppkey * 41) % 1000 AS x,
         (s_suppkey * 79) % 1000 AS y
  FROM supplier
),
kb AS (SELECT CAST(max(s_suppkey) + 1 AS BIGINT) AS key_bound FROM supplier),
pairs AS (
  SELECT c.c_custkey,
         min_by(s.s_suppkey,
                ((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y))
                  * kb.key_bound + s.s_suppkey) AS nearest_suppkey,
         CAST(min((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y))
              AS BIGINT) AS dist2
  FROM cust c JOIN supp s
    ON (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= 150 * 150
  CROSS JOIN kb
  GROUP BY c.c_custkey
)
SELECT c_custkey, nearest_suppkey, dist2
FROM pairs
ORDER BY c_custkey
"""


@query("geo_grid_nearest", _GEO_SQL)
def geo_grid_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-bounded nearest-neighbor spatial join: for each customer
    point, the closest supplier point within distance 15.0 — store /
    driver / cell-tower assignment, the workhorse spatial query.

    The grid trick: cells are sized to the radius, suppliers dilate
    to their 3x3 neighbor cells (a 9x map-side fan-out of the SMALL
    side), and candidates come from a plain equi-join on the cell key
    — provably exact for radius-bounded search, since any point
    within r of (cx, cy) lies in an adjacent cell.  The oracle
    replays the naive distance theta-join the grid plan avoids (the
    join_interval_banded relationship, one dimension up).  All
    geometry is integer (positions in tenths, squared distances, a
    composite (dist2, suppkey) min_by scalar), so nearest selection
    is bit-deterministic with no sqrt and no float ordering.  The
    composite's key multiplier is max(s_suppkey)+1 DERIVED FROM THE
    DATA (one control-plane agg, broadcast), not a constant — a fixed
    scale would silently mis-rank once keys outgrow it (supplier
    count is 10k x SF, so any hard-coded bound eventually loses);
    overflow headroom is d2 <= 22_500 x key_bound, safe in int64 up
    to ~4e14 suppliers.
    """
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 500)
        .select(
            "c_custkey",
            ((F.col("c_custkey") * 37) % 1000).alias("x"),
            ((F.col("c_custkey") * 73) % 1000).alias("y"),
        )
        .withColumn("cell_x", F.expr(f"x div {_R}"))
        .withColumn("cell_y", F.expr(f"y div {_R}"))
    )
    supp = t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 41) % 1000).alias("sx"),
        ((F.col("s_suppkey") * 79) % 1000).alias("sy"),
    )
    # dilate the supplier side into its 3x3 neighborhood
    offsets = F.expr(
        "flatten(transform(sequence(-1, 1),"
        " dx -> transform(sequence(-1, 1), dy -> struct(dx, dy))))"
    )
    supp9 = (
        supp.select("*", F.explode(offsets).alias("o"))
        .select(
            "s_suppkey",
            "sx",
            "sy",
            (F.expr(f"sx div {_R}") + F.col("o.dx")).alias("cell_x"),
            (F.expr(f"sy div {_R}") + F.col("o.dy")).alias("cell_y"),
        )
    )
    d2 = (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx")) + (
        F.col("y") - F.col("sy")
    ) * (F.col("y") - F.col("sy"))
    # one control-plane scalar, folded as a literal so the point-set
    # plan stays a pure cell-key hash join (no scalar BNLJ riding it)
    key_bound = int(
        t(spark, sf_dir, "supplier").agg(F.max("s_suppkey")).first()[0] or 0
    ) + 1
    cand = (
        cust.join(supp9, ["cell_x", "cell_y"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= _R * _R)
    )
    return (
        cand.groupBy("c_custkey")
        .agg(
            F.min_by(
                "s_suppkey", F.col("d2") * F.lit(key_bound) + F.col("s_suppkey")
            ).alias("nearest_suppkey"),
            F.min("d2").cast("long").alias("dist2"),
        )
        .orderBy("c_custkey")
    )
