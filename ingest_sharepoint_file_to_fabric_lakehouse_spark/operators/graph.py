"""Graph analytics over relational edge lists: weighted PageRank and
per-node triangle counting on the nation-level trade graph (customer
nation → supplier nation, weighted by line count).

Scale notes: each PageRank iteration is one hash join (ranks ⋈ edges
on src) plus one partial-aggregated groupBy(dst) — the standard
edge-partitioned formulation that scales to billions of edges; the
rank vector is #nodes rows.  Five fixed iterations keep the oracle
replayable (the SQL unrolls them as CTEs); production would iterate
to convergence with lineage truncation per round (cf.
``corpus._cc_label_propagation``).

Float-parity design (same trick as ``text_lm_quality``): per-edge
contributions are double products (bit-deterministic given identical
inputs), but their per-node SUM is order-dependent in double — so
each iteration's sum runs in DECIMAL(28,14) (exact, order-free) and
is cast back to double before the next iteration.  Both engines then
see identical doubles at every step and the final 6-dp rounding is
bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..core import query, source_fingerprint, t

_D = 0.85
_ITER = 5

# The derived edge list is the graph-world analogue of a bucketed
# layout: pay the one fact-fact join ONCE per (session, source corpus)
# and share the materialized #nations² relation across every graph
# query.  Keyed on the source fingerprint so a regenerated fixture
# re-derives; the eager localCheckpoint truncates lineage so reuse is
# always a block read.
_EDGE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _trade_edges_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        source_fingerprint(
            sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
        ),
    )
    if key not in _EDGE_CACHE:
        _EDGE_CACHE[key] = _trade_edges(spark, sf_dir).localCheckpoint(eager=True)
    return _EDGE_CACHE[key]


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed weighted nation trade edges (customer nation ->
    supplier nation, weight = line count): one fact-fact shuffle join
    (lineitem ⋈ orders on the uniform order key) with every dimension
    broadcast, then a partial-aggregated pair count — #nations² rows
    out regardless of fact volume."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nat).withColumnRenamed("n_name", "src"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .drop("n_nationkey")
        .join(
            F.broadcast(nat).withColumnRenamed("n_name", "dst"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )


def _pagerank_oracle() -> str:
    heads = [
        """
    WITH edges AS (
      SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS w
      FROM lineitem
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey  = c_custkey
      JOIN supplier  ON l_suppkey  = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      GROUP BY 1, 2
    ),
    outw AS (SELECT src, CAST(SUM(w) AS DOUBLE) AS ow FROM edges GROUP BY src),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM n) AS rank FROM nodes)
    """
    ]
    for i in range(_ITER):
        heads.append(
            f"""
    , r{i + 1} AS (
      SELECT nodes.node,
             CAST(0.15 AS DOUBLE) / (SELECT n FROM n)
             + CAST(0.85 AS DOUBLE) * CAST(COALESCE(SUM(
                 CAST(r.rank * (e.w / o.ow) AS DECIMAL(28,14))
               ), 0) AS DOUBLE) AS rank
      FROM nodes
      LEFT JOIN edges e ON e.dst = nodes.node
      LEFT JOIN r{i} r  ON r.node = e.src
      LEFT JOIN outw o  ON o.src = e.src
      GROUP BY nodes.node
    )
    """
        )
    heads.append(
        f"""
    SELECT node, ROUND(rank, 6) AS pagerank,
           row_number() OVER (ORDER BY rank DESC, node) AS rnk
    FROM r{_ITER}
    ORDER BY rnk
    """
    )
    return "".join(heads)


# Above this many aggregated edges the rank iterations run
# distributed; at or below, on the driver.  Same hybrid (and a similar
# constant) as corpus.connected_components' union-find threshold: the
# EDGE relation here is #nations² rows by construction — the corpus
# pass is the trade-edge aggregation inside _trade_edges_cached — so
# iterating 5 joins over a <=625-row relation through the scheduler
# buys nothing but job latency (~1.2 s of the key's 1.5 s at sf0.1).
_DRIVER_EDGE_CAP = 200_000


@query("graph_pagerank", _pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 5 iterations) over the nation
    trade graph.  Contribution of src → dst is rank(src) x the edge's
    share of src's out-weight; dangling mass is dropped (ranks need
    not sum to 1 — relative ordering is the product), identically on
    both engines.

    HYBRID execution, decided by one control-plane scalar (the
    aggregated edge count): the corpus-proportional work is the
    trade-edge aggregation (one fact-fact shuffle inside
    _trade_edges_cached); the rank loop's state is #nodes rows and its
    input #nodes² edges, so below _DRIVER_EDGE_CAP the 5 iterations
    run on the driver — replicating the distributed arithmetic
    BIT-EXACTLY (double contrib, HALF_UP quantize to decimal(28,14),
    exact decimal accumulation, decimal→double on read; Python floats
    ARE IEEE doubles and Decimal reproduces Spark's DecimalType) —
    and above it the distributed join+agg loop below takes over
    unchanged (a web-scale graph's edge relation never collects).
    The same hybrid as connected_components' driver union-find.
    """
    edges = _trade_edges_cached(spark, sf_dir)
    if edges.count() <= _DRIVER_EDGE_CAP:
        return _pagerank_driver(spark, edges)
    # The iteration state is #nations rows and every shuffle hashes on
    # node/src — 25 keys — so reducer width is control-plane-sized (the
    # MMR rule; A/B on two hosts: 32 -> 2 measured 1.83 -> 1.48 s and
    # 2.22 -> 1.48 s at sf0.1).  The one corpus-proportional pass (the
    # trade-edge aggregation) is inside _trade_edges_cached, which
    # materializes before this pin.
    prev_w = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        return _pagerank_body(spark, edges)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_w)


def _pagerank_driver(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Driver-side rank loop over the collected (control-plane-sized)
    edge relation.  Every arithmetic step mirrors _pagerank_body's
    Spark expressions exactly — see the parity pin
    test_pagerank_driver_equals_distributed."""
    from decimal import ROUND_HALF_UP, Decimal

    rows = edges.collect()
    ow: dict[str, int] = {}
    for r in rows:
        ow[r["src"]] = ow.get(r["src"], 0) + r["w"]
    nodes = sorted({r["src"] for r in rows} | {r["dst"] for r in rows})
    n = len(nodes)
    rank = {v: 1.0 / float(n) for v in nodes}
    q14 = Decimal("1E-14")
    for _ in range(_ITER):
        acc: dict[str, Decimal] = {}
        for r in rows:
            # double contrib (w: long over double out-weight, times
            # double rank), then cast decimal(28,14).  Spark's
            # double→decimal goes through BigDecimal.valueOf ==
            # Double.toString, and Python's repr(float) is the
            # shortest-round-trip algorithm — on JDK >= 19
            # (JDK-4511638) Double.toString is shortest-round-trip
            # too, so the two match exactly; on older JDKs rare values
            # get extra digits and the HALF_UP quantize can still
            # diverge 1 ulp at the 14th place.  The randomized
            # distributed-parity test covers the deployed JDK either
            # way; Decimal(repr(x)) is still strictly closer than
            # Decimal(x)'s exact binary expansion.
            contrib = rank[r["src"]] * (r["w"] / float(ow[r["src"]]))
            acc[r["dst"]] = acc.get(r["dst"], Decimal(0)) + Decimal(
                repr(contrib)
            ).quantize(q14, ROUND_HALF_UP)
        rank = {
            v: 0.15 / float(n) + 0.85 * float(acc.get(v, Decimal(0)))
            for v in nodes
        }
    out = spark.createDataFrame(
        [(v, rank[v]) for v in nodes], schema="node string, rank double"
    )
    w = F.row_number().over(Window.orderBy(F.col("rank").desc(), F.col("node")))
    return (
        out.select("node", F.round("rank", 6).alias("pagerank"), w.alias("rnk"))
        .orderBy("rnk")
    )


def _pagerank_body(spark: SparkSession, edges: DataFrame) -> DataFrame:
    outw = edges.groupBy("src").agg(F.sum("w").cast("double").alias("ow"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # graph order: control-plane scalar (#nations)
    ranks = nodes.select("node", (F.lit(1.0) / F.lit(float(n))).alias("rank"))
    # (#distinct-nation-pairs rows; each of the 5 iterations re-reads
    # this relation — materialize the joined form once)
    contrib_src = edges.join(F.broadcast(outw), "src").localCheckpoint(eager=True)
    for _ in range(_ITER):
        contribs = (
            contrib_src.join(
                ranks.withColumnRenamed("node", "src").withColumnRenamed(
                    "rank", "src_rank"
                ),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                (F.col("src_rank") * (F.col("w") / F.col("ow")))
                .cast("decimal(28,14)")
                .alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("in_mass"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(0.15) / F.lit(float(n))
                    + F.lit(0.85)
                    * F.coalesce(F.col("in_mass"), F.lit(0)).cast("double")
                ).alias("rank"),
            )
            # truncate lineage per round (rank vector is #nodes rows):
            # without this the plan nests 5 join+agg layers deep and
            # analysis/AQE re-planning grows per iteration; with it
            # (plus the cached edge relation) the loop runs at job
            # latency — same pattern as corpus._cc_label_propagation
            .localCheckpoint(eager=True)
        )
    w = F.row_number().over(Window.orderBy(F.col("rank").desc(), F.col("node")))
    return (
        ranks.select("node", F.round("rank", 6).alias("pagerank"), w.alias("rnk"))
        .orderBy("rnk")
    )


@query(
    "graph_triangle_count",
    """
    WITH dedges AS (
      SELECT cn.n_name AS src, sn.n_name AS dst
      FROM lineitem
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey  = c_custkey
      JOIN supplier  ON l_suppkey  = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE cn.n_name <> sn.n_name
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM dedges
    ),
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM edges e1
      JOIN edges e2 ON e2.a = e1.b
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    per_node AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT node, n_triangles FROM per_node ORDER BY node
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the undirected nation trade graph
    (self-loops dropped, edges canonicalized a < b).

    The classic two-join formulation: wedges a–b–c with a < b < c
    (ordering enforced by the canonical edge direction) closed by a
    third edge probe — each triangle found exactly once, then each
    corner credited.  At scale this is two hash joins on node keys
    plus a partial-aggregated count; the canonical ordering is what
    keeps the join fan-out to wedges-with-ordered-corners instead of
    6x that.
    """
    dedges = (
        _trade_edges_cached(spark, sf_dir)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )
    edges = (
        dedges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    # r17 (guide §3.1): the checkpointed edge relation carries no
    # stats, so the planner defaulted both wedge joins to sort-merge —
    # four exchanges + sorts over a relation bounded by #nations²
    # (≤ ~300 rows at ANY corpus size; the node set is the nation
    # dimension).  Explicit broadcasts are the deliberate strategy
    # here, not a fixture tune.
    tri = (
        e1.join(F.broadcast(e2), F.col("e2.a") == F.col("e1.b"))
        .join(
            F.broadcast(e3),
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("a"), F.col("e1.b").alias("b"), F.col("e2.b").alias("c")
        )
    )
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select("b"))
        .unionAll(tri.select("c"))
    )
    return (
        corners.groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
        .orderBy("node")
    )


@query(
    "graph_link_prediction",
    """
    WITH dedges AS (
      SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS w
      FROM lineitem
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey  = c_custkey
      JOIN supplier  ON l_suppkey  = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE cn.n_name <> sn.n_name
      GROUP BY 1, 2
    ),
    thr AS (SELECT 3 * SUM(w) // (2 * count(*)) AS t FROM dedges),
    strong AS (SELECT src, dst FROM dedges, thr WHERE w >= t),
    adj AS (
      SELECT DISTINCT src AS u, dst AS v FROM strong
      UNION SELECT DISTINCT dst, src FROM strong
    ),
    deg AS (SELECT u, count(*) AS d FROM adj GROUP BY u),
    canon AS (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM adj
    ),
    common AS (
      SELECT x.v AS a, y.v AS b, count(*) AS n_common
      FROM adj x JOIN adj y ON x.u = y.u AND x.v < y.v
      GROUP BY 1, 2
    ),
    predicted AS (
      SELECT c.a, c.b, c.n_common
      FROM common c
      WHERE NOT EXISTS (SELECT 1 FROM canon WHERE canon.a = c.a AND canon.b = c.b)
    )
    SELECT p.a, p.b, p.n_common,
           CAST(da.d + db.d - p.n_common AS BIGINT) AS n_union,
           CAST(p.n_common * 1000000 // (da.d + db.d - p.n_common) AS BIGINT)
             AS jaccard_ppm
    FROM predicted p
    JOIN deg da ON da.u = p.a
    JOIN deg db ON db.u = p.b
    ORDER BY jaccard_ppm DESC, p.a, p.b
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-coefficient link prediction on the nation trade graph:
    for every NON-adjacent node pair sharing >= 1 common neighbor,
    score ``|N(a) ∩ N(b)| / |N(a) ∪ N(b)|`` — the classic
    neighborhood-overlap predictor for "which trade links should exist
    next" (friend-of-friend recommendation on any relational graph).

    Shape discipline: common-neighbor counting is the SAME wedge join
    as triangle counting — adjacency self-joined on the shared
    neighbor with an ordered (a < b) corner, partial-aggregated into
    per-pair counts — followed by an anti-join against the canonical
    edge set (predicted = wedge-closed pairs minus existing edges) and
    a broadcast degree join, over the thresholded strong-link
    backbone (w >= 1.5x mean, an exact integer cut — a complete graph
    predicts nothing).  Nothing is ever all-pairs: candidate
    volume is bounded by wedges, exactly like the triangle pass, and
    at 100 TB the same skew discipline applies (hub nodes dominate
    wedge fan-out; cap or sample hub neighborhoods, as a
    recommendation system caps candidate lists).  The score is exact
    integer ppm (`div`), so ranking is engine-deterministic.
    Reuses the session-cached trade edge relation (one fact-fact join
    per corpus, shared with PageRank/triangles).
    """
    dedges = (
        _trade_edges_cached(spark, sf_dir)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", "w")
    )
    # Sparsify to STRONG links (w >= floor(1.5 x mean weight), exact
    # integer threshold): the fixture's nation graph is complete, so
    # prediction is only meaningful over the heavy-trade backbone —
    # and a recommendation graph at scale is thresholded the same way.
    thr = dedges.agg(F.expr("(3 * sum(w)) div (2 * count(*))").alias("t"))
    strong = (
        dedges.crossJoin(F.broadcast(thr))
        .filter(F.col("w") >= F.col("t"))
        .select("src", "dst")
    )
    adj = (
        strong.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(strong.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = adj.groupBy("u").agg(F.count("*").alias("d"))
    canon = adj.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    ).distinct()
    x, y = adj.alias("x"), adj.alias("y")
    # r17 (guide §3.1): adjacency and canonical-edge relations are
    # bounded by #nations² and carry no stats (checkpointed RDD), so
    # the planner defaulted the wedge join and the anti-join to
    # sort-merge; broadcast both small sides explicitly.
    common = (
        x.join(
            F.broadcast(y),
            (F.col("x.u") == F.col("y.u")) & (F.col("x.v") < F.col("y.v")),
        )
        .groupBy(F.col("x.v").alias("a"), F.col("y.v").alias("b"))
        .agg(F.count("*").alias("n_common"))
    )
    predicted = common.join(F.broadcast(canon), ["a", "b"], "left_anti")
    da = deg.select(F.col("u").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("u").alias("b"), F.col("d").alias("db"))
    return (
        predicted.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .withColumn("n_union", (F.col("da") + F.col("db") - F.col("n_common")).cast("long"))
        .withColumn("jaccard_ppm", F.expr("(n_common * 1000000) div n_union"))
        .select("a", "b", "n_common", "n_union", "jaccard_ppm")
        .orderBy(F.col("jaccard_ppm").desc(), "a", "b")
    )


@query(
    "graph_bfs_reachability",
    """
    WITH RECURSIVE dedges AS (
      SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS w
      FROM lineitem
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey  = c_custkey
      JOIN supplier  ON l_suppkey  = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE cn.n_name <> sn.n_name
      GROUP BY 1, 2
    ),
    thr AS (SELECT 3 * SUM(w) // (2 * count(*)) AS t FROM dedges),
    strong AS (SELECT src, dst FROM dedges, thr WHERE w >= t),
    s0 AS (SELECT min(n_name) AS root FROM nation),
    reach(node, dist) AS (
      SELECT root, 0 FROM s0
      UNION ALL
      SELECT s.dst, r.dist + 1
      FROM reach r JOIN strong s ON s.src = r.node
      WHERE r.dist < 4
    )
    SELECT node, CAST(min(dist) AS BIGINT) AS dist
    FROM reach GROUP BY node
    ORDER BY dist, node
    """,
)
def graph_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop reachability (BFS distances <= 4 hops) over the
    strong-trade graph from the lexicographically-first nation — the
    transitive-closure / hierarchy-traversal shape (org charts, BOM
    explosion, fraud rings) that SQL expresses as WITH RECURSIVE and
    Spark as an ITERATIVE frontier join.

    The recursion workaround IS the scale design: each round joins
    only the current FRONTIER (nodes first reached last round)
    against the edge list and anti-joins the visited set — work per
    round is proportional to newly-discovered nodes, the distributed
    analogue of textbook BFS.  Lineage is truncated per round with an
    eager localCheckpoint (the _cc_label_propagation discipline), so
    4 rounds don't compound into a 4-deep replay tree.  The DuckDB
    oracle replays the same traversal as a recursive CTE (min(dist)
    collapses its path enumeration to first-visit distances) — one
    semantic, two recursion mechanisms.  The root is derived from the
    data (min name), never a hard-coded literal, so corpus
    regeneration can't orphan the query.
    """
    dedges = _trade_edges_cached(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    thr = dedges.agg(F.expr("(3 * sum(w)) div (2 * count(*))").alias("t"))
    strong = (
        dedges.crossJoin(F.broadcast(thr))
        .filter(F.col("w") >= F.col("t"))
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    root = (
        t(spark, sf_dir, "nation")
        .agg(F.min("n_name").alias("node"))
        .withColumn("dist", F.lit(0))
    )
    visited = root.localCheckpoint(eager=True)
    frontier = visited
    for d in range(1, 5):
        nxt = (
            frontier.join(strong, frontier["node"] == strong["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(d))
            .localCheckpoint(eager=True)
        )
        # r17: no checkpoint on the union — every component (root and
        # each round's nxt) is ALREADY a materialized checkpoint, so
        # re-materializing the union paid one extra job per round (4
        # per execution) to store blocks that mere union-of-block-reads
        # reproduces without recompute; the anti-join and the final
        # action read the same blocks either way.
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited.select("node", F.col("dist").cast("long")).orderBy("dist", "node")


def _lpa_oracle(rounds: int = 3) -> str:
    """Unrolled synchronous label propagation: each round every node
    adopts its neighbors' most frequent label (count desc, label asc
    tiebreak) — the DuckDB replay of the exact Spark rounds."""
    parts = ["""
    WITH dedges AS (
      SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS w
      FROM lineitem
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey  = c_custkey
      JOIN supplier  ON l_suppkey  = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE cn.n_name <> sn.n_name
      GROUP BY 1, 2
    ),
    thr AS (SELECT 3 * SUM(w) // (2 * count(*)) AS t FROM dedges),
    strong AS (SELECT src, dst FROM dedges, thr WHERE w >= t),
    adj AS (
      SELECT DISTINCT src AS u, dst AS v FROM strong
      UNION SELECT DISTINCT dst, src FROM strong
    ),
    l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM adj)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
    l{r} AS (
      SELECT node, lbl FROM (
        SELECT adj.u AS node, l.lbl, count(*) AS c,
               row_number() OVER (PARTITION BY adj.u
                                  ORDER BY count(*) DESC, l.lbl) AS rn
        FROM adj JOIN l{r - 1} l ON l.node = adj.v
        GROUP BY adj.u, l.lbl
      ) WHERE rn = 1
    )""")
    parts.append(f"""
    SELECT l.node, l.lbl AS community,
           CAST(count(*) OVER (PARTITION BY l.lbl) AS BIGINT) AS community_size
    FROM l{rounds} l
    ORDER BY l.node""")
    return "".join(parts)


@query("graph_label_propagation", _lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection via synchronous label propagation (LPA) on
    the strong-trade backbone: every node starts as its own label and,
    for 3 synchronous rounds, adopts the most frequent label among its
    neighbors — the near-linear community detector (Raghavan et al.),
    here with a deterministic (count desc, label asc) tiebreak so the
    trajectory is bit-identical in the oracle's unrolled replay
    (LPA's usual random tie-breaking is what makes it unstable;
    determinism is what makes it TESTABLE — same discipline as
    sim_kmeans_build's unrolled Lloyd rounds).

    Scale shape per round: one join of the adjacency against the
    label table (both keyed by node — at billions of edges both sides
    hash-partition on the same key and the partitioning is reused
    round to round), one partial-aggregated (node, label) count, one
    node-keyed argmax window.  Labels-as-min-reachable CC
    (dedup_cluster_cc) finds connected pieces; LPA finds DENSE pieces
    inside a connected graph — complementary graph primitives.
    """
    dedges = (
        _trade_edges_cached(spark, sf_dir)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", "w")
    )
    thr = dedges.agg(F.expr("(3 * sum(w)) div (2 * count(*))").alias("t"))
    strong = (
        dedges.crossJoin(F.broadcast(thr))
        .filter(F.col("w") >= F.col("t"))
        .select("src", "dst")
    )
    adj = (
        strong.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(strong.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = adj.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    w_arg = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("lbl"))
    for _ in range(3):
        # r17 (guide §3.1): the label table is #nodes rows (bounded by
        # the nation dimension at any corpus size) and the checkpointed
        # adjacency has no stats, so each round's join planned as
        # sort-merge (two exchanges + sorts per round); broadcast the
        # label side explicitly.
        votes = (
            adj.join(
                F.broadcast(labels.select(F.col("node").alias("v"), "lbl")), "v"
            )
            .groupBy(F.col("u").alias("node"), "lbl")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w_arg))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
        )
    w_sz = Window.partitionBy("lbl")
    return labels.select(
        "node",
        F.col("lbl").alias("community"),
        F.count("*").over(w_sz).cast("long").alias("community_size"),
    ).orderBy("node")
