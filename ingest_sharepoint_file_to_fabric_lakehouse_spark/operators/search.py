"""Keyword search over the documents corpus: BM25 ranking via an
inverted-index-shaped plan (SURVEY.md §2 B.9 family — retrieval is the
query-side twin of the dedup/similarity curation ops, and the lexical
half of a RAG stack next to sim_topk_* / text_chunk_overlap).

Scale notes: the plan IS the inverted index — the exploded token
stream is filtered to query terms BEFORE any exchange (predicate on
the generator output, so the posting lists are built only for the
terms asked about), per-(term, doc) term frequencies partial-aggregate
map-side, and the per-term document frequencies + corpus length stats
are control-plane-sized relations that broadcast.  At 100 TB the
posting lists for a handful of query terms are a vanishing fraction of
the corpus; the only full-corpus pass is the one scan that feeds both
the doc-length projection and the filtered explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..core import docs, query

_BM25_TERMS = ("vector", "stream", "window")
_BM25_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
),
dl AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
),
stats AS (
  SELECT count(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl
),
tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM toks WHERE token IN ('vector', 'stream', 'window')
  GROUP BY doc_id, token
),
df AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token
),
scored AS (
  SELECT tf.doc_id,
         CAST(
           ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl * stats.n_docs / stats.sum_dl))
           AS DECIMAL(20,12)) AS s
  FROM tf
  JOIN df ON tf.token = df.token
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
),
ranked AS (
  SELECT doc_id,
         CAST(ROUND(CAST(SUM(s) AS DOUBLE), 6) AS DOUBLE) AS score,
         count(*) AS n_terms_hit
  FROM scored GROUP BY doc_id
)
SELECT doc_id, score, n_terms_hit,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
FROM ranked
ORDER BY rnk
LIMIT 20
"""


@query("search_bm25", _BM25_SQL)
def search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search: rank documents for a fixed query
    ('vector stream window'), k1=1.2, b=0.75, Lucene-style
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf (always positive, so
    corpus-frequent terms still contribute).

    Float-parity design: every input to the score is an integer
    (tf, dl, df, N, Σdl), the double arithmetic is the SAME expression
    tree on both engines (IEEE ops on identical operands are
    bit-identical), and the one transcendental — ln — is absorbed by a
    DECIMAL(20,12) cast per (doc, term) before the per-doc sum, so an
    engine ulp can't surface (the text_lm_quality pattern).  The
    decimal sum is order-independent; the final 6-dp rounding and the
    (score, doc_id) ranking are then bit-stable.

    Scale shape: see module docstring — query terms filter the
    exploded stream before any exchange (the posting-list build), the
    per-term df/idf table broadcasts, and the doc-length side rides
    the same corpus scan.  Top-k is a single window over the scored
    docs (bounded by docs containing ≥1 query term).
    """
    d = docs(spark, sf_dir)
    toks = F.split("text", " ")
    dl = d.select("doc_id", F.size(toks).alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        d.select("doc_id", F.explode(toks).alias("token"))
        .filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    F.lit(1)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(2.2))
                / (
                    F.col("tf")
                    + F.lit(1.2)
                    * (
                        F.lit(0.25)
                        + F.lit(0.75) * F.col("dl") * F.col("n_docs") / F.col("sum_dl")
                    )
                )
            )
            .cast("decimal(20,12)")
            .alias("s"),
        )
    )
    ranked = scored.groupBy("doc_id").agg(
        F.round(F.sum("s").cast("double"), 6).alias("score"),
        F.count("*").alias("n_terms_hit"),
    )
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        ranked.select(
            "doc_id", "score", "n_terms_hit", F.row_number().over(w).cast("long").alias("rnk")
        )
        .orderBy("rnk")
        .limit(20)
    )
