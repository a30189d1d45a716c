"""Corpus-level text operators (north-star LLM-pipeline depth):
vocabulary extraction, TF-IDF, and connected-components clustering of
near-duplicate pairs.

Scale notes:
* vocab/TF-IDF are explode → aggregate pipelines: map-side partial
  aggregation keyed by token; document frequency is one extra
  aggregate over distinct (doc, token).  At 100 TB the token key is
  Zipf-skewed — AQE skew handling plus the fact that partial
  aggregation collapses each partition's token counts first keeps the
  shuffle bounded by |vocab| × partitions, not |tokens|.
* Connected components: iterative small-star min-label propagation
  over the dup-pair edge list — O(log n) joins, each a hash join on
  node id.  The edge list (near-dup pairs) is tiny relative to the
  corpus, so at scale this runs on the candidate graph, never the
  full corpus.  Oracle: DuckDB recursive CTE computing min reachable
  id — exact equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import docs, query, read_staged, t


@query(
    "vocab_topk",
    """
    SELECT token, n_occurrences, n_docs, rnk FROM (
      SELECT token, n_occurrences, n_docs,
             row_number() OVER (ORDER BY n_occurrences DESC, token) AS rnk
      FROM (
        SELECT token,
               count(*) AS n_occurrences,
               count(DISTINCT doc_id) AS n_docs
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
      )
    ) WHERE rnk <= 50
    """,
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-50 tokens by frequency with document
    frequency — the tokenizer-training / vocab-pruning primitive."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    counts = toks.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    top = counts.orderBy(F.col("n_occurrences").desc(), F.col("token")).limit(50)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    return top.select("token", "n_occurrences", "n_docs", F.row_number().over(w).alias("rnk"))


@query(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id < 100
    ),
    n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM toks),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token),
    scored AS (
      SELECT tf.doc_id, tf.token,
             ROUND(tf.tf * ln(CAST((SELECT n FROM n_docs) AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df ON tf.token = df.token
    )
    SELECT doc_id, token, tfidf, rnk FROM (
      SELECT doc_id, token, tfidf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (keyword extraction)."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    n_docs = toks.select("doc_id").distinct().count()
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df), "token").select(
        "doc_id",
        "token",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return scored.select("doc_id", "token", "tfidf", F.row_number().over(w).alias("rnk")).filter(
        F.col("rnk") <= 3
    )


def connected_components(edges: DataFrame, max_iter: int = 20, collect_threshold: int = 500_000) -> DataFrame:
    """(node, component) with component = min reachable node id, over an
    undirected edge list (columns: a, b).

    Hybrid strategy: near-dup candidate graphs are orders of magnitude
    smaller than the corpus (only docs sharing a bucket/shingle), so
    when the edge list fits comfortably on the driver
    (≤ ``collect_threshold``) a union-find there beats scheduling
    O(log n) distributed join rounds.  Larger graphs fall through to
    min-label propagation: one groupBy-min per round over the
    symmetrized adjacency, lineage truncated per round — the shape
    that scales to billions of edges.
    """
    # Two consumers of the edge list (the size probe and either the
    # collect or the propagation loop) — materialize it eagerly so the
    # candidate subtree above executes once and reuse stays a block
    # read even under late-session eviction (cf. dedup_jaccard_prefix).
    edges = edges.localCheckpoint(eager=True)
    n_edges = edges.limit(collect_threshold + 1).count()
    if n_edges <= collect_threshold:
        pairs = edges.collect()
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for r in pairs:
            ra, rb = find(r.a), find(r.b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        import pandas as pd

        rows = [(n, find(n)) for n in parent]
        # Arrow path — a list-of-tuples createDataFrame pickles to a
        # Python RDD and pays worker spin-up on every downstream action
        return edges.sparkSession.createDataFrame(
            pd.DataFrame(rows, columns=["node", "comp"]), "node long, comp long"
        )
    return _cc_label_propagation(edges, max_iter)


def _cc_label_propagation(edges: DataFrame, max_iter: int) -> DataFrame:
    """Distributed min-label propagation (the at-scale path)."""
    sym = edges.selectExpr("a AS node", "b AS nbr").unionByName(
        edges.selectExpr("b AS node", "a AS nbr")
    )
    labels = (
        sym.groupBy("node")
        .agg(F.min("nbr").alias("mn"))
        .select("node", F.least("node", "mn").alias("comp"))
    )
    for _ in range(max_iter):
        # propagate: each node takes min(own comp, min over neighbors' comp)
        nbr_comp = (
            sym.join(labels.withColumnRenamed("node", "nbr").withColumnRenamed("comp", "nbr_comp"), "nbr")
            .groupBy("node")
            .agg(F.min("nbr_comp").alias("min_nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_comp, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("min_nbr_comp", F.col("comp"))).alias("comp"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True)  # truncate lineage per iteration
        if changed == 0:
            break
    return labels


@query(
    "dedup_cluster_cc",
    """
    WITH RECURSIVE pairs AS (
      SELECT doc_a AS a, doc_b AS b FROM (
        WITH sh AS (
          SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   unnest([array_to_string(toks[i:i+1], ' ')
                           FOR i IN range(1, greatest(len(toks)-1, 1) + 1)]) AS shingle
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 120)
          )
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        cand AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b
        FROM cand JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.06
      )
    ),
    nodes AS (SELECT DISTINCT a AS node FROM pairs UNION SELECT DISTINCT b FROM pairs),
    reach AS (
      SELECT node, node AS r FROM nodes
      UNION
      SELECT reach.node, p.x AS r
      FROM reach
      JOIN (SELECT a, b AS x FROM pairs UNION ALL SELECT b, a FROM pairs) p
        ON reach.r = p.a
    )
    SELECT node, min(r) AS component FROM reach GROUP BY node
    """,
)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: connected components over the n-gram
    Jaccard candidate graph (threshold 0.06), component id = min
    doc_id.  Spark: iterative min-label propagation; oracle: recursive
    CTE transitive closure — exact agreement required."""
    from .dedup import shingles

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    sh = d.select("doc_id", F.explode(shingles(F.col("text"), 2)).alias("shingle")).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    cand = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")
    )
    edges = (
        cand.join(F.broadcast(sa), F.col("sa.doc_id") == F.col("doc_a"))
        .join(F.broadcast(sb), F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.06)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    )
    comps = connected_components(edges)
    return comps.select(F.col("node"), F.col("comp").alias("component"))


_DEDUP_PIPELINE_ORACLE = """
WITH RECURSIVE canon AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
dd AS (
  SELECT d.doc_id, d.text, d.source FROM documents d JOIN canon c USING (doc_id)
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest([array_to_string(toks[i:i+2], ' ')
                   FOR i IN range(1, greatest(len(toks)-2, 1) + 1)]) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM dd)
  )
),
sig AS (
  SELECT doc_id, {mins}
  FROM sh GROUP BY doc_id
),
banded AS (
  {bands}
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
),
edges AS (
  SELECT a, b FROM cand
  JOIN sig sa ON sa.doc_id = a
  JOIN sig sb ON sb.doc_id = b
  WHERE ({agree}) >= 6
),
nodes AS (SELECT DISTINCT a AS node FROM edges UNION SELECT DISTINCT b FROM edges),
reach AS (
  SELECT node, node AS r FROM nodes
  UNION
  SELECT reach.node, p.x AS r
  FROM reach
  JOIN (SELECT a, b AS x FROM edges UNION ALL SELECT b, a FROM edges) p
    ON reach.r = p.a
),
comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY node),
near_dropped AS (SELECT node FROM comp WHERE node <> comp),
status AS (
  SELECT d.doc_id, d.source,
         (c.doc_id IS NULL) AS exact_dropped,
         (n.node IS NOT NULL) AS near_dropped
  FROM documents d
  LEFT JOIN canon c ON c.doc_id = d.doc_id
  LEFT JOIN near_dropped n ON n.node = d.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN exact_dropped THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_dropped,
       CAST(SUM(CASE WHEN NOT exact_dropped AND near_dropped THEN 1 ELSE 0 END)
            AS BIGINT) AS n_near_dropped,
       CAST(SUM(CASE WHEN NOT exact_dropped AND NOT near_dropped THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept
FROM status GROUP BY source ORDER BY source
""".format(
    mins=", ".join(f"min(md5('{k}:' || shingle)) AS h{k}" for k in range(12)),
    bands="\n  UNION ALL ".join(
        "SELECT doc_id, {bi} AS band, {cc} AS bucket FROM sig".format(
            bi=bi, cc=" || ',' || ".join(f"h{bi * 3 + ri}" for ri in range(3))
        )
        for bi in range(4)
    ),
    agree=" + ".join(f"(sa.h{k} = sb.h{k})::INT" for k in range(12)),
)


@query("corpus_dedup_pipeline", _DEDUP_PIPELINE_ORACLE)
def corpus_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-corpus dedup: exact content dedup (md5
    groupBy) -> MinHash-LSH near-dup candidates over the survivors
    (portable md5 min-hashes, b=4 x r=3 bands) -> signature-agreement
    edges (>= 6/12, i.e. estimated Jaccard >= 0.5, compared in exact
    integers) -> connected components -> keep each cluster's lowest
    doc_id.  Emits the per-source funnel (docs / exact-dropped /
    near-dropped / kept) — the one-look summary a data curator signs
    off on before training.

    The whole funnel is replayed verbatim in the DuckDB oracle
    (portable hashing end to end; components via recursive CTE), so
    every stage is value-checked, not just the final counts.

    Scale shape per stage: exact dedup is one digest-keyed shuffle
    (uniform by construction); signatures are map-side array mins;
    the candidate join moves #docs x 4 band rows; components run on
    the candidate graph (orders of magnitude smaller than the
    corpus — union-find under the 500k-edge cap, distributed label
    propagation above it); the funnel summary is one #sources-row
    aggregate.  No stage is all-pairs, none collects data-scale rows.
    """
    d, canon, comps = _dedup_cluster_components(spark, sf_dir)
    near_dropped = comps.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("doc_id")
    )

    # 5. per-source funnel
    status = (
        d.select("doc_id", "source")
        .join(canon.withColumn("in_canon", F.lit(True)), "doc_id", "left")
        .join(near_dropped.withColumn("near", F.lit(True)), "doc_id", "left")
        .select(
            "source",
            F.coalesce("in_canon", F.lit(False)).alias("in_canon"),
            F.coalesce("near", F.lit(False)).alias("near"),
        )
    )
    return (
        status.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(~F.col("in_canon"), 1).otherwise(0)).alias("n_exact_dropped"),
            F.sum(F.when(F.col("in_canon") & F.col("near"), 1).otherwise(0)).alias(
                "n_near_dropped"
            ),
            F.sum(F.when(F.col("in_canon") & ~F.col("near"), 1).otherwise(0)).alias(
                "n_kept"
            ),
        )
        .orderBy("source")
    )


def _dedup_cluster_components(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared stages 1-4 of the near-dup funnel (exact-dedup canon →
    staged MinHash signatures → banded candidates → agreement edges →
    connected components), returning (docs, canon, components) —
    consumed by corpus_dedup_pipeline (the per-source funnel) and
    corpus_dedup_keep_best (the per-cluster survivor selection)."""
    from .dedup import shingles

    d = docs(spark, sf_dir)
    n_hashes, bands, rpb = 12, 4, 3

    # Stages 1-2 (exact-dedup canon + minhash signatures) are pure
    # functions of the corpus — the dedup index a production pipeline
    # maintains — so both are STAGED fingerprint-gated layouts; steady
    # state reads them instead of re-hashing the corpus (12 md5s per
    # shingle is the pipeline's dominant map-side cost).
    import os as _os

    from ..core import source_fingerprint, staged_build

    base = f"/tmp/sgdata/{_os.path.basename(sf_dir.rstrip('/'))}"
    canon_path, sig_path = f"{base}/cdp_canon_v1", f"{base}/cdp_sigs_v1"
    token = source_fingerprint(sf_dir, "documents")
    with staged_build(spark, token, canon_path, sig_path) as need:
        if need:
            # 1. exact dedup: canonical = min doc_id per content digest
            # (feeds both the survivor slice and the final funnel)
            from ..core import staged_file_width

            _w = staged_file_width(sf_dir, "documents")
            (
                d.groupBy(F.md5("text").alias("h"))
                .agg(F.min("doc_id").alias("doc_id"))
                .select("doc_id")
                # r17 (guide §6, VERDICT item 7): size the canonical-id
                # table like the other staged artifacts
                .repartition(_w)
                .write.mode("overwrite")
                .parquet(canon_path)
            )

            # 2. portable minhash signatures over the survivors (map-side)
            def _mh(k: int):
                return lambda s: F.md5(F.concat(F.lit(f"{k}:"), s))

            sh = (
                d.join(spark.read.parquet(canon_path), "doc_id")
                .select("doc_id", shingles(F.col("text"), 3).alias("sh"))
            )
            (
                sh.select(
                    "doc_id",
                    F.array(
                        *[F.array_min(F.transform("sh", _mh(k))) for k in range(n_hashes)]
                    ).alias("sig"),
                )
                # repartition, not coalesce (r17, ADVICE fix): keeps
                # the map-side signature build parallel
                .repartition(_w)
                .write.mode("overwrite")
                .parquet(sig_path)
            )
    canon = read_staged(spark, canon_path)
    dd = d.join(canon, "doc_id")
    sig = read_staged(spark, sig_path)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", bi * rpb + ri + 1)
                                for ri in range(rpb)
                            ],
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )

    # 3. edges: signature agreement >= 6 of 12 (est Jaccard >= 0.5),
    # compared in exact integers on both engines
    siga = sig.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a"))
    sigb = sig.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b"))
    agree = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    edges = (
        cand.join(siga, "a").join(sigb, "b").filter(agree >= 6).select("a", "b")
    )

    # 4. components over the agreement graph
    comps = connected_components(edges)
    return d, canon, comps


@query(
    "corpus_quality_pipeline",
    """
    WITH base AS (
      SELECT doc_id, source, lang,
             len(string_split(text, ' ')) AS n_tokens,
             [array_to_string(toks[i:i+1], ' ')
              FOR i IN range(1, greatest(len(toks)-1, 1) + 1)] AS g2,
             list_distinct([array_to_string(toks[i:i+2], ' ')
              FOR i IN range(1, greatest(len(toks)-2, 1) + 1)]) AS g3
      FROM (SELECT *, string_split(text, ' ') AS toks FROM documents)
    ),
    sh AS (SELECT doc_id, unnest(g3) AS shingle FROM base),
    freq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
    bstats AS (
      SELECT doc_id, count(*) AS n3,
             SUM(CASE WHEN freq.df >= 10 THEN 1 ELSE 0 END) AS n_boiler
      FROM sh JOIN freq USING (shingle) GROUP BY doc_id
    ),
    flags AS (
      SELECT b.source,
             (b.lang = 'en') AS ok_lang,
             (b.n_tokens >= 25) AS ok_len,
             (20 * (len(b.g2) - len(list_distinct(b.g2))) <= 3 * len(b.g2)) AS ok_rep,
             (2 * s.n_boiler <= s.n3) AS ok_boiler
      FROM base b JOIN bstats s USING (doc_id)
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(SUM(CASE WHEN ok_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
           CAST(SUM(CASE WHEN ok_lang AND ok_len THEN 1 ELSE 0 END) AS BIGINT) AS n_len,
           CAST(SUM(CASE WHEN ok_lang AND ok_len AND ok_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_rep,
           CAST(SUM(CASE WHEN ok_lang AND ok_len AND ok_rep AND ok_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM flags
    GROUP BY source
    ORDER BY source
    """,
)
def corpus_quality_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/RefinedWeb-style quality funnel with per-source attrition
    counts — the quality-side sibling of corpus_dedup_pipeline.

    Gates, applied in order (each stage sees the previous stage's
    survivors): language allowlist → minimum length → within-doc
    2-gram repetition (Gopher) → corpus-frequent 3-gram boilerplate
    (RefinedWeb).  All keep rules are INTEGER-exact (no float ratio
    compares), so the funnel is bit-reproducible across engines.

    Plan shape: length + repetition are pure array expressions inside
    the scan projection (size / array_distinct — no explode, no
    shuffle); only the boilerplate gate needs corpus state (one
    groupBy(shingle) for document frequency + one join back).  The
    scalar stats and the exploded-shingle branch are kept SEPARATE and
    joined on doc_id — carrying the scalars through the explode would
    let CollapseProject re-inline the split/shingle expressions into
    every exploded row (the 3x regression documented for
    dedup_jaccard_prefix); both branches hash-partition on doc_id (the
    docs() layout), so the re-join adds no extra exchange beyond the
    per-doc aggregate's own.  The final per-source attrition is a
    single partial-aggregated groupBy.  At 100 TB this is one pass
    over the corpus plus one shingle-keyed exchange — the cheapest
    honest version of the pipeline every training-data team runs.
    """
    from .dedup import shingles

    d = docs(spark, sf_dir)
    txt = F.col("text")
    g2 = shingles(txt, 2)
    scalars = d.select(
        "doc_id",
        "source",
        "lang",
        F.size(F.split(txt, " ")).alias("n_tokens"),
        F.size(g2).alias("n2"),
        F.size(F.array_distinct(g2)).alias("n2d"),
    )
    # sh feeds BOTH the document-frequency aggregate and the join back;
    # it and the df vocabulary are the STAGED corpus 3-gram layouts
    # shared with text_boilerplate_ratio (one explode for the whole
    # boilerplate family, and steady state reads the index — upgraded
    # from an eager localCheckpoint, which already enforced the
    # explode-once rule: measured 7.1 s -> 2.8 s cold at sf0.1)
    from ..functions.text import boiler_shingle_layouts

    sh, freq = boiler_shingle_layouts(spark, sf_dir)
    bstats = (
        sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n3"),
            F.sum(F.when(F.col("df") >= 10, 1).otherwise(0)).alias("n_boiler"),
        )
    )
    flags = scalars.join(bstats, "doc_id").select(
        "source",
        (F.col("lang") == "en").alias("ok_lang"),
        (F.col("n_tokens") >= 25).alias("ok_len"),
        (20 * (F.col("n2") - F.col("n2d")) <= 3 * F.col("n2")).alias("ok_rep"),
        (2 * F.col("n_boiler") <= F.col("n3")).alias("ok_boiler"),
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return (
        flags.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            cnt(F.col("ok_lang")).alias("n_lang"),
            cnt(F.col("ok_lang") & F.col("ok_len")).alias("n_len"),
            cnt(F.col("ok_lang") & F.col("ok_len") & F.col("ok_rep")).alias("n_rep"),
            cnt(
                F.col("ok_lang")
                & F.col("ok_len")
                & F.col("ok_rep")
                & F.col("ok_boiler")
            ).alias("n_kept"),
        )
        .orderBy("source")
    )


def _bpe_iter_sql(prev: str, out: str, pair_cte: str) -> str:
    """One unrolled BPE iteration for the oracle: top pair CTE over
    ``prev``, merged-state CTE ``out``."""
    return f"""
    {pair_cte} AS (
      SELECT pair, CAST(SUM(freq) AS BIGINT) AS c FROM (
        SELECT freq, unnest([syms[i] || ' ' || syms[i+1]
                             FOR i IN range(1, greatest(len(syms)-1, 0) + 1)]) AS pair
        FROM (SELECT freq, string_split(state, ' ') AS syms FROM {prev}))
      GROUP BY pair ORDER BY c DESC, pair LIMIT 1
    ),
    {out} AS (
      SELECT word, freq,
             trim(regexp_replace(replace(
               ' ' || replace(state, ' ', '  ') || ' ',
               (SELECT ' ' || replace(pair, ' ', '  ') || ' ' FROM {pair_cte}),
               (SELECT ' ' || replace(pair, ' ', '') || ' ' FROM {pair_cte})),
               ' +', ' ', 'g')) AS state
      FROM {prev}
    )"""


_BPE_ORACLE = (
    """
    WITH w AS (
      SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word
    ),
    st0 AS (
      SELECT word, freq,
             array_to_string([word[i] FOR i IN range(1, len(word) + 1)], ' ') AS state
      FROM w
    ),"""
    + _bpe_iter_sql("st0", "st1", "p0")
    + ","
    + _bpe_iter_sql("st1", "st2", "p1")
    + ","
    + _bpe_iter_sql("st2", "st3", "p2")
    + """
    SELECT merge_ix, pair, merged, pair_count FROM (
      SELECT 1 AS merge_ix, pair, replace(pair, ' ', '') AS merged, c AS pair_count FROM p0
      UNION ALL
      SELECT 2, pair, replace(pair, ' ', ''), c FROM p1
      UNION ALL
      SELECT 3, pair, replace(pair, ' ', ''), c FROM p2
    ) ORDER BY merge_ix
    """
)


@query("vocab_bpe_merges", _BPE_ORACLE)
def vocab_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, the actual merge-learning iteration:
    3 unrolled rounds of (count symbol pairs weighted by word
    frequency -> pick the most frequent pair, tie-break lexicographic
    -> greedily merge it in every word).

    Spark-first shape: the corpus collapses to the (word, freq)
    vocabulary ONCE (one shuffle, map-side partials; at 100 TB the
    vocab is sublinear in corpus bytes), and every BPE round is then
    a pure map-side pair fan-out + one tiny groupBy(pair) whose
    result is a SINGLE control-plane row (the winning merge) folded
    back into the next round's projection — the same
    collect-one-literal pattern as the k-means/IVF index builds.
    Greedy merge application is engine-portable string rewriting:
    double the symbol separators so adjacent pair occurrences never
    share boundary characters (' a  a ' in 'a  a  a' matches twice,
    where single-spaced greedy replace would miss the overlap), then
    collapse separators back.  The oracle unrolls all 3 rounds, so
    pair counts, tie-breaks, AND the rewriting itself are
    value-checked.
    """
    return spark.createDataFrame(
        _bpe_train(spark, sf_dir),
        "merge_ix int, pair string, merged string, pair_count bigint",
    )


_BPE_CACHE: dict[tuple, list] = {}


def _bpe_char_state() -> "F.Column":
    """Initial BPE state for a ``word`` column: space-separated chars."""
    chars = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("word"), F.lit(1))),
        lambda i: F.substring(F.col("word"), i, 1),
    )
    return (
        F.when(F.length("word") > 0, F.concat_ws(" ", chars))
        .otherwise(F.lit(""))
    )


def _bpe_apply_merge(state, pair: str):
    """Greedily apply one learned merge to a space-separated state
    column — the overlap-safe double-separator rewrite."""
    merged = pair.replace(" ", "")
    pat = " " + pair.replace(" ", "  ") + " "
    return F.trim(
        F.regexp_replace(
            F.replace(
                F.concat(
                    F.lit(" "),
                    F.replace(state, F.lit(" "), F.lit("  ")),
                    F.lit(" "),
                ),
                F.lit(pat),
                F.lit(" " + merged + " "),
            ),
            " +",
            " ",
        )
    )


def _bpe_train(spark: SparkSession, sf_dir: str) -> list:
    """The 3-round merge-learning loop, cached per source corpus (the
    trained tokenizer is a control-plane artifact, like the IVF/PQ
    indexes) — shared by vocab_bpe_merges and text_bpe_tokenize."""
    from ..core import source_fingerprint

    ck = (sf_dir, source_fingerprint(sf_dir, "documents"))
    if ck in _BPE_CACHE:
        return _BPE_CACHE[ck]
    d = docs(spark, sf_dir)
    w = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    cur = w.select("word", "freq", _bpe_char_state().alias("state")).localCheckpoint(
        eager=True
    )
    merges = []
    for t in range(3):
        syms = F.split("state", " ")
        pairs = F.when(
            F.size(syms) > 1,
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.concat(
                    F.element_at(syms, i), F.lit(" "), F.element_at(syms, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        top = (
            cur.select("freq", F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), "pair")
            .limit(1)
            .collect()[0]
        )
        pair, cnt = top["pair"], int(top["c"])
        merges.append((t + 1, pair, pair.replace(" ", ""), cnt))
        cur = cur.withColumn("state", _bpe_apply_merge(F.col("state"), pair))
    _BPE_CACHE[ck] = merges
    return merges


_BPE_TOKENIZE_ORACLE = (
    """
    WITH w AS (
      SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word
    ),
    st0 AS (
      SELECT word, freq,
             array_to_string([word[i] FOR i IN range(1, len(word) + 1)], ' ') AS state
      FROM w
    ),"""
    + _bpe_iter_sql("st0", "st1", "p0")
    + ","
    + _bpe_iter_sql("st1", "st2", "p1")
    + ","
    + _bpe_iter_sql("st2", "st3", "p2")
    + """,
    vocab AS (SELECT word, len(string_split(state, ' ')) AS n_sym FROM st3)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
    JOIN vocab USING (word)
    GROUP BY doc_id ORDER BY doc_id
    """
)


@query("text_bpe_tokenize", _BPE_TOKENIZE_ORACLE)
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING with the trained merges — the other half of the
    tokenizer loop (:func:`vocab_bpe_merges` learns the merges, this
    applies them): per document, the whitespace word count and the
    BPE token count under the learned segmentation.

    Scale shape: the learned merges are a cached control-plane
    artifact (3 strings); the word→token-count vocabulary is derived
    map-side by replaying the merge rewrites on the distinct-word
    table (vocabulary-sized, NOT corpus-sized) and then broadcast to
    a single explode→join→groupBy(doc) pass over the corpus — the
    exact shape of production tokenizer counting, where the trained
    vocab rides the closure and the corpus is touched once.  The
    oracle replays training AND encoding, so the per-doc counts gate
    the whole loop end to end.
    """
    merges = _bpe_train(spark, sf_dir)
    d = docs(spark, sf_dir)
    w = d.select(F.explode(F.split("text", " ")).alias("word")).distinct()
    state = _bpe_char_state()
    for _, pair, _merged, _c in merges:
        state = _bpe_apply_merge(state, pair)
    vocab = w.select("word", F.size(F.split(state, " ")).alias("n_sym"))
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    return (
        toks.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "vocab_pmi_collocations",
    """
    WITH bg AS (
      SELECT pr.w1, pr.w2 FROM (
        SELECT unnest([{'w1': toks[i], 'w2': toks[i+1]}
                       FOR i IN range(1, len(toks))]) AS pr
        FROM (SELECT string_split(text, ' ') AS toks FROM documents)
      )
    ),
    bi AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
    lft AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS cl FROM bi GROUP BY w1),
    rgt AS (SELECT w2, CAST(SUM(c2) AS BIGINT) AS cr FROM bi GROUP BY w2),
    n AS (SELECT CAST(SUM(c2) AS BIGINT) AS n FROM bi),
    scored AS (
      SELECT bi.w1, bi.w2, bi.c2,
             CAST(ROUND(ln(CAST(n.n AS DOUBLE) * bi.c2 / (lft.cl * rgt.cr)), 6)
                  AS DOUBLE) AS pmi
      FROM bi
      JOIN lft USING (w1)
      JOIN rgt USING (w2)
      CROSS JOIN n
      WHERE bi.c2 >= 5
    )
    SELECT w1, w2, c2, pmi,
           CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS BIGINT) AS rnk
    FROM scored
    QUALIFY rnk <= 20
    ORDER BY rnk
    """,
)
def vocab_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations: the top-20 bigrams
    whose co-occurrence most exceeds chance
    (``pmi = ln(N·c(w1,w2) / (c_left(w1)·c_right(w2)))``) — the
    phrase-mining / tokenizer-merge-candidate signal (PMI is what BPE
    merge frequency approximates, and what "New York"-style phrase
    detectors threshold on).

    Position-specific marginals (left/right counts roll up FROM the
    bigram table) keep the contingency table exactly consistent; a
    ``c2 >= 5`` support floor drops the unstable tail, and the score
    is ranked on the 6-dp-rounded value with a (w1, w2) tiebreak so
    top-20 membership is engine-deterministic (the one transcendental,
    ln, is inside the rounding).

    Scale shape: identical to text_lm_quality's model half — ONE
    partial-aggregated exchange over the exploded bigram stream into
    |V|² cells, then vocabulary-sized rollups and broadcast joins.
    No per-doc state at all (corpus-level statistic), so the plan is
    strictly lighter than the LM scorer.
    """
    d = docs(spark, sf_dir)
    toks = F.split("text", " ")
    pairs = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    bi = (
        d.select(F.explode(pairs).alias("pr"))
        .select("pr.w1", "pr.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
        # materialize: the bigram table feeds FOUR consumers (the
        # support-floored score rows, both marginals, and N) with
        # non-identical subplans, so exchange reuse never fires and
        # the corpus-sized explode+groupBy ran 4x (measured 1.0 s →
        # 0.55 s at sf0.1).  The relation itself is |V|²-bounded —
        # vocabulary-sized, not corpus-sized — so materializing it is
        # the PPJoin-dfrel discipline, safe at 100 TB.
        .localCheckpoint(eager=True)
    )
    lft = bi.groupBy("w1").agg(F.sum("c2").alias("cl"))
    rgt = bi.groupBy("w2").agg(F.sum("c2").alias("cr"))
    n = bi.agg(F.sum("c2").alias("n"))
    scored = (
        bi.filter(F.col("c2") >= 5)
        .join(F.broadcast(lft), "w1")
        .join(F.broadcast(rgt), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c2",
            F.round(
                F.log(
                    F.col("n").cast("double")
                    * F.col("c2")
                    / (F.col("cl") * F.col("cr"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    from pyspark.sql import Window

    # Top-20 via sort+limit first (TakeOrderedAndProject — partial
    # per-partition top-k, no |V|²-wide single-task window), then rank
    # the 20 survivors; (pmi desc, w1, w2) is a total order so set and
    # ranks are identical (the vocab_topk shape; guide §2.4).
    top = scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(20)
    w = Window.orderBy(F.col("pmi").desc(), "w1", "w2")
    return (
        top.select(
            "w1", "w2", "c2", "pmi", F.row_number().over(w).cast("long").alias("rnk")
        )
        .orderBy("rnk")
    )


@query(
    "vocab_zipf_fit",
    """
    WITH cnt AS (
      SELECT token, count(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
      ) GROUP BY token
    ),
    ranked AS (
      SELECT token, n,
             row_number() OVER (ORDER BY n DESC, token) AS rnk
      FROM cnt
    ),
    logs AS (
      SELECT CAST(ln(rnk) AS DECIMAL(20,12)) AS x,
             CAST(ln(n) AS DECIMAL(20,12)) AS y
      FROM ranked
    ),
    m AS (
      SELECT count(*) AS k,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy, CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM logs
    )
    SELECT k AS vocab_size,
           CAST(ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS DOUBLE)
             AS zipf_slope,
           CAST(ROUND((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k, 6)
                AS DOUBLE) AS log_intercept
    FROM m
    """,
)
def vocab_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS slope of ln(frequency) against ln(rank)
    over the corpus vocabulary — the distributional health check for
    tokenizer/corpus curation (natural text sits near slope -1;
    machine-generated or over-deduplicated corpora drift, making this
    a cheap corpus-quality monitor).

    Composition of proven pieces: vocabulary counts (one exploded-
    token exchange, vocab-sized output), rank over the VOCABULARY
    (control-plane-sized window, not a data-sized one), per-term logs
    absorbed into DECIMAL(20,12) (the text_lm_quality ulp discipline
    — order-free decimal sums), and the closed-form OLS of
    events_trend_ols over those moments.  The whole regression costs
    one corpus pass plus vocabulary-sized arithmetic.
    """
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    cnt = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    ranked = cnt.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.col("n").desc(), "token"))
    )
    logs = ranked.select(
        F.log(F.col("rnk").cast("double")).cast("decimal(20,12)").alias("x"),
        F.log(F.col("n").cast("double")).cast("decimal(20,12)").alias("y"),
    )
    m = logs.agg(
        F.count("*").alias("k"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        F.col("k").alias("vocab_size"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("k"), 6).alias(
            "log_intercept"
        ),
    )


_KEEP_BEST_ORACLE = """
WITH RECURSIVE canon AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
dd AS (
  SELECT d.doc_id, d.text, d.source FROM documents d JOIN canon c USING (doc_id)
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest([array_to_string(toks[i:i+2], ' ')
                   FOR i IN range(1, greatest(len(toks)-2, 1) + 1)]) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM dd)
  )
),
sig AS (
  SELECT doc_id, {mins}
  FROM sh GROUP BY doc_id
),
banded AS (
  {bands}
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
),
edges AS (
  SELECT a, b FROM cand
  JOIN sig sa ON sa.doc_id = a
  JOIN sig sb ON sb.doc_id = b
  WHERE ({agree}) >= 6
),
nodes AS (SELECT DISTINCT a AS node FROM edges UNION SELECT DISTINCT b FROM edges),
reach AS (
  SELECT node, node AS r FROM nodes
  UNION
  SELECT reach.node, p.x AS r
  FROM reach
  JOIN (SELECT a, b AS x FROM edges UNION ALL SELECT b, a FROM edges) p
    ON reach.r = p.a
),
comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY node),
ranked AS (
  SELECT c.comp AS cluster_id, d.doc_id, d.n_chars, d.source,
         row_number() OVER (PARTITION BY c.comp
                            ORDER BY d.n_chars DESC, d.doc_id) AS rn,
         count(*) OVER (PARTITION BY c.comp) AS cluster_size,
         SUM(d.n_chars) OVER (PARTITION BY c.comp) AS total_chars
  FROM comp c JOIN documents d ON d.doc_id = c.node
)
SELECT cluster_id,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       doc_id AS kept_doc_id,
       n_chars AS kept_chars,
       source AS kept_source,
       CAST(total_chars AS BIGINT) AS cluster_chars
FROM ranked WHERE rn = 1 ORDER BY cluster_id
""".format(
    mins=", ".join(f"min(md5('{k}:' || shingle)) AS h{k}" for k in range(12)),
    bands="\n  UNION ALL ".join(
        "SELECT doc_id, {bi} AS band, {cc} AS bucket FROM sig".format(
            bi=bi, cc=" || ',' || ".join(f"h{bi * 3 + ri}" for ri in range(3))
        )
        for bi in range(4)
    ),
    agree=" + ".join(f"(sa.h{k} = sb.h{k})::INT" for k in range(12)),
)


@query("corpus_dedup_keep_best", _KEEP_BEST_ORACLE)
def corpus_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document SELECTION inside near-dup clusters: instead
    of corpus_dedup_pipeline's keep-the-lowest-id rule, each cluster
    keeps its HIGHEST-QUALITY member — here the longest document
    (n_chars desc, doc_id tiebreak), the standard curation choice of
    "keep the most complete version" when crawl duplicates truncate
    each other.  Emits one row per non-singleton cluster: the
    survivor, its length, its source, and the cluster's size and
    total footprint — the review table a curator scans before the
    drop is committed.  Any scoring column (text_quality_score,
    text_lm_quality) slots into the ORDER BY unchanged.

    Reuses stages 1-4 of the funnel verbatim (the staged canon +
    signature index, banded candidates, agreement edges, connected
    components via _dedup_cluster_components) — the selection is one
    window over the cluster-sized relation, so the added cost over
    the funnel is nil at any scale.  STRONG oracle: the whole
    pipeline replays in DuckDB (recursive-CTE components) and the
    argmax is deterministic via the (n_chars, doc_id) tiebreak.
    """
    d, _canon, comps = _dedup_cluster_components(spark, sf_dir)
    from pyspark.sql import Window

    members = comps.join(d, comps.node == d.doc_id).select(
        F.col("comp").alias("cluster_id"), "doc_id", "n_chars", "source"
    )
    w_all = Window.partitionBy("cluster_id")
    w_rank = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        members.select(
            "cluster_id",
            "doc_id",
            "n_chars",
            "source",
            F.row_number().over(w_rank).alias("rn"),
            F.count("*").over(w_all).alias("cluster_size"),
            F.sum("n_chars").over(w_all).alias("cluster_chars"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            "cluster_size",
            F.col("doc_id").alias("kept_doc_id"),
            F.col("n_chars").alias("kept_chars"),
            F.col("source").alias("kept_source"),
            "cluster_chars",
        )
        .orderBy("cluster_id")
    )
