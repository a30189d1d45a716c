"""Training-data pipeline operators beyond the dedup/similarity core
(BASELINE north star): deterministic sampling & splits, PII scrubbing,
source-mixture weighting, radius similarity search.

Everything here is whole-stage-codegen expression work or one
partial-aggregated groupBy — map-side at 100 TB except the final tiny
per-stratum aggregates.

Portability note: sampling/split hashing uses a multiplicative hash in
plain BIGINT arithmetic (``(id * 2654435761) mod 2^32``, Knuth) instead
of engine hash functions — xxhash64/md5-hex-to-int don't line up across
engines, but integer arithmetic is bit-identical everywhere, so the
oracle can verify EXACT membership, not just counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import docs, query, t

_KNUTH = 2654435761
_M32 = 4294967296


def _mix32(col, salt: int = 0):
    """Portable deterministic 32-bit mix of a BIGINT column.

    The multiply runs in decimal(38,0): ``(id+salt)*K`` overflows
    bigint once id exceeds ~3.5e9 — ANSI Spark raises, DuckDB errors,
    and non-ANSI Spark would wrap silently while a 128-bit engine
    stays exact — found by the synthesized 10x sweep, whose replica
    ids sit at +9e9 (real corpus ids at 100 TB live well past 2^32).
    decimal(38,0) holds 2^63 * K ~ 2.4e28 exactly on both engines; the
    mod-2^32 result is cast back to BIGINT (always < 2^32).  The cast
    precedes the salt add so the add can't overflow either."""
    widened = (col.cast("decimal(38,0)") + F.lit(salt)) * F.lit(_KNUTH)
    return (widened % F.lit(_M32)).cast("long")


@query(
    "corpus_sample_stratified",
    f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE ((CAST(doc_id AS DECIMAL(38,0)) * {_KNUTH}) % {_M32}) % 1000 <
          CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 300 ELSE 500 END
    ORDER BY doc_id
    """,
)
def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-language rates (en 10%, de 30%,
    rest 50%) — the rebalancing step of corpus curation.  Deterministic
    hash-threshold sampling: no RNG state, stable under re-runs and
    partitioning, exact-membership verifiable.  Pure map-side filter."""
    d = t(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 100)
        .when(F.col("lang") == "de", 300)
        .otherwise(500)
    )
    return (
        d.filter(_mix32(F.col("doc_id")) % 1000 < rate)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@query(
    "text_dataset_split",
    f"""
    WITH b AS (
      SELECT *, ((CAST(doc_id AS DECIMAL(38,0)) + 9176) * {_KNUTH}) % {_M32} % 100
                  AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM b
    GROUP BY 1
    """,
)
def text_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by hash bucket
    (salted so it decorrelates from the sampling hash).  The id_checksum
    makes the oracle verify exact membership of each split, not just
    sizes.  Map-side assignment + one tiny aggregate."""
    d = t(spark, sf_dir, "documents")
    bucket = _mix32(F.col("doc_id"), salt=9176) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars", "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("doc_id").alias("id_checksum"),
        )
    )


@query(
    "text_pii_scrub",
    r"""
    WITH raw AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or call 555-01' || CAST(doc_id % 90 + 10 AS VARCHAR)
                  || ' id ' || CAST(CAST(doc_id AS DECIMAL(38,0)) * 7919 AS VARCHAR) AS t
      FROM documents
    )
    SELECT doc_id,
           right(
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                 '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
               '[0-9]{4,}', '<NUM>', 'g'),
             60) AS scrubbed_tail,
           len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
           len(regexp_extract_all(t, '[0-9]{3}-[0-9]{4}')) AS n_phones
    FROM raw
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: email / phone / long-number patterns replaced with
    typed placeholders, plus per-doc redaction counts — the standard
    pre-training scrub pass.  (The fixture corpus carries no PII, so a
    deterministic contact string derived from doc_id is appended on
    BOTH sides before scrubbing — the patterns then fire on every row.)
    Pure map-side regexp work, codegen end to end."""
    d = t(spark, sf_dir, "documents")
    raw = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or call 555-01"),
            (F.col("doc_id") % 90 + 10).cast("string"),
            F.lit(" id "),
            # decimal(38,0) multiply: bigint would wrap past id ~1.2e15
            # (the _mix32 overflow class); scale-0 decimals render
            # digits-only as strings on both engines
            (F.col("doc_id").cast("decimal(38,0)") * 7919).cast("string"),
        ).alias("t"),
    )
    email_pat = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    phone_pat = r"[0-9]{3}-[0-9]{4}"
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("t", email_pat, "<EMAIL>"), phone_pat, "<PHONE>"
        ),
        r"[0-9]{4,}",
        "<NUM>",
    )
    return raw.select(
        "doc_id",
        F.right(scrubbed, F.lit(60)).alias("scrubbed_tail"),
        F.size(F.regexp_extract_all("t", F.lit(email_pat), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(phone_pat), 0)).alias("n_phones"),
    )


@query(
    "corpus_mix_weights",
    """
    WITH s AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    )
    SELECT source, n_tokens,
           ROUND(CAST(n_tokens AS DOUBLE) / (SELECT SUM(n_tokens) FROM s), 6) AS actual_share,
           ROUND(0.05 / (CAST(n_tokens AS DOUBLE) / (SELECT SUM(n_tokens) FROM s)), 6)
             AS sample_factor
    FROM s
    ORDER BY source
    """,
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture weighting: per-source token share vs a uniform
    target mixture → the sampling multiplier a data loader applies to
    hit the target blend.  One partial-aggregated groupBy; the share
    normalization broadcasts a single total."""
    d = t(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("n_tokens")
    )
    total = s.agg(F.sum("n_tokens").alias("_tot"))
    share = F.col("n_tokens").cast("double") / F.col("_tot")
    return (
        s.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_tokens",
            F.round(share, 6).alias("actual_share"),
            F.round(F.lit(0.05) / share, 6).alias("sample_factor"),
        )
        .orderBy("source")
    )


@query(
    "sim_radius_search",
    """
    WITH e AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings
    ),
    q AS (SELECT v AS q_vec FROM e WHERE vec_id = 7)
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(q.q_vec, e.v), 6) AS cos_sim
    FROM e CROSS JOIN q
    WHERE e.vec_id <> 7 AND list_cosine_similarity(q.q_vec, e.v) >= 0.25
    ORDER BY vec_id
    """,
)
def sim_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) similarity search: every vector with cosine ≥ τ of
    the query — the recall-oriented complement of top-k.  JVM-side
    sequential fold (zip_with + aggregate) matches DuckDB's
    list_cosine_similarity bit-for-bit; broadcastable query row, pure
    map-side scan at scale (with IVF cells pruning candidates first —
    see sim_ivf_probe)."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = e.filter(F.col("vec_id") == 7).select(F.col("v").alias("q_vec"))
    dot = F.aggregate(
        F.zip_with("v", "q_vec", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    cos = dot / (norm(F.col("v")) * norm(F.col("q_vec")))
    return (
        e.filter(F.col("vec_id") != 7)
        .crossJoin(F.broadcast(q))
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= 0.25)
        .select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))
        .orderBy("vec_id")
    )


@query(
    "text_pack_sequences",
    """
    WITH c AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             SUM(len(string_split(text, ' ')))
               OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS start_tok
      FROM documents
    )
    SELECT doc_id,
           n_tokens AS n_tokens,
           CAST(COALESCE(start_tok, 0) AS BIGINT) AS start_tok,
           CAST(COALESCE(start_tok, 0) // 2048 AS BIGINT) AS first_seq,
           CAST((COALESCE(start_tok, 0) + n_tokens - 1) // 2048 AS BIGINT) AS last_seq,
           (CAST(COALESCE(start_tok, 0) // 2048 AS BIGINT)
              <> CAST((COALESCE(start_tok, 0) + n_tokens - 1) // 2048 AS BIGINT)) AS is_split
    FROM c
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate the corpus in doc_id
    order and chop the token stream every 2048 tokens; each doc learns
    its global token offset, first/last training sequence, and whether
    the chop splits it across two sequences.

    The global running offset is computed as a DISTRIBUTED two-phase
    prefix sum — the 100 TB shape, because a single `Window.orderBy`
    over the whole corpus would serialize on one task:

    1. range-repartition by doc_id; each partition computes its LOCAL
       cumulative sum with an in-partition window (parallel);
    2. per-partition token totals (one tiny row each) are prefix-summed
       on the driver and broadcast-joined back as partition offsets.

    The driver-side step sees #partitions rows, never data rows.  The
    result is bit-identical to the naive global window (asserted in
    tests) and to the oracle's single-window SQL.
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import spark_partition_id

    seq_len = 2048
    # Partition count scales with the cluster, not a literal: the
    # driver-side phase-2 prefix sum sees exactly one row per
    # partition, so cap it to keep that collect trivial even on a
    # 1000-executor cluster (4096 rows of two longs).
    n_parts = min(max(spark.sparkContext.defaultParallelism, 2), 4096)
    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
        .repartitionByRange(n_parts, "doc_id")
        .withColumn("_part", spark_partition_id())
    )
    local_w = Window.partitionBy("_part").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # EAGER materialization is load-bearing, not a cache hint:
    # repartitionByRange SAMPLES its range boundaries per execution,
    # and `local` feeds two actions (the phase-2 totals collect and
    # the final join).  Without a materialization boundary the two
    # executions can sample DIFFERENT boundaries, so the offsets
    # computed from one partition layout get joined onto another —
    # global prefixes silently lose/gain whole partitions' tokens
    # (caught by the sf0.1 cross-fixture sweep: 2,098 tokens missing
    # by doc 1000; sf0.01's samples happened to agree).  The
    # checkpoint freezes one layout for both consumers.
    local = d.withColumn(
        "local_prefix", F.coalesce(F.sum("n_tokens").over(local_w), F.lit(0))
    ).localCheckpoint(eager=True)
    # phase 2: tiny per-partition totals -> driver prefix sum -> broadcast.
    totals = (
        local.groupBy("_part").agg(F.sum("n_tokens").alias("part_total")).orderBy("_part").collect()
    )
    offsets, running = {}, 0
    for row in totals:
        offsets[row["_part"]] = running
        running += row["part_total"]
    off_df = spark.createDataFrame(
        __import__("pandas").DataFrame(
            {"_part": list(offsets), "part_offset": [offsets[p] for p in offsets]}
        ),
        "_part int, part_offset long",
    )
    packed = (
        local.join(F.broadcast(off_df), "_part")
        .withColumn("start_tok", (F.col("local_prefix") + F.col("part_offset")).cast("long"))
        .withColumn("first_seq", (F.col("start_tok") / seq_len).cast("long"))
        .withColumn(
            "last_seq", ((F.col("start_tok") + F.col("n_tokens") - 1) / seq_len).cast("long")
        )
        .withColumn("is_split", F.col("first_seq") != F.col("last_seq"))
    )
    return packed.select(
        "doc_id", "n_tokens", "start_tok", "first_seq", "last_seq", "is_split"
    )


@query(
    "text_decontaminate",
    """
    WITH ev AS (
      SELECT DISTINCT shingle FROM (
        SELECT unnest([array_to_string(toks[i:i+3], ' ')
                       FOR i IN range(1, greatest(len(toks)-3, 1) + 1)]) AS shingle
        FROM (SELECT string_split(text, ' ') AS toks FROM documents
              WHERE doc_id % 50 = 0)
      )
    ),
    tr AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest([array_to_string(toks[i:i+3], ' ')
                       FOR i IN range(1, greatest(len(toks)-3, 1) + 1)]) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
              WHERE doc_id % 50 <> 0)
      )
    )
    SELECT tr.doc_id, count(*) AS n_shared_ngrams
    FROM tr JOIN ev USING (shingle)
    GROUP BY tr.doc_id
    ORDER BY tr.doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs that share any
    word 4-gram with the held-out eval slice (doc_id % 50 == 0), with
    the shared-shingle count as evidence.  The filtered corpus is
    `training docs - these rows` (an anti-join on the result).

    Scale shape: eval shingles are a broadcast-side hash join input
    (eval sets are small by definition); training shingles dedup
    per-doc MAP-SIDE (``array_distinct`` before the explode — the
    (doc_id, shingle) distinct needs no shuffle because a shingle can
    only repeat within its own doc row) and hit the broadcast join
    executor-local, so the only exchange in the whole sweep is the
    final per-doc count over the tiny matched subset.  This is the
    standard contamination sweep (the 13-gram form of GPT-3's paper,
    word-4-gram here for fixture scale).
    """
    d = docs(spark, sf_dir)
    from ..operators.dedup import shingles

    ev = (
        d.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode(shingles(F.col("text"), 4)).alias("shingle"))
        .distinct()
    )
    tr = d.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text"), 4))).alias("shingle"),
    )
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
        .orderBy("doc_id")
    )


@query(
    "text_chunk_overlap",
    """
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    sized AS (
      SELECT doc_id, toks, n,
             CASE WHEN n <= 32 THEN 1
                  ELSE CAST((n - 32 + 23) // 24 AS INT) + 1 END AS n_chunks
      FROM d
    )
    SELECT doc_id, CAST(r.m AS INT) AS chunk_ix,
           CAST(LEAST(32, n - r.m*24) AS INT) AS chunk_tokens,
           md5(array_to_string(list_slice(toks, r.m*24 + 1, r.m*24 + 32), ' ')) AS chunk_fp
    FROM sized, range(0, 8) r(m)
    WHERE r.m < n_chunks
    ORDER BY doc_id, chunk_ix
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping chunking: every document is cut into
    32-token windows with stride 24 (8-token overlap), the standard
    retrieval-index preprocessing step.

    Pure map-side fan-out — tokens split once, window starts derived
    with integer arithmetic (``n_chunks = 1 + ceil((n-32)/24)``, exact
    in both engines), chunks materialized via sequence+transform+
    explode with zero shuffle and zero UDFs.  Each chunk carries an
    md5 fingerprint instead of its text so the output (and any
    downstream exact-dedup of chunks) stays narrow; at 100 TB this is
    the shape that feeds an embedding pipeline — a pure projection
    that scales with input bytes, no exchange until the (optional)
    chunk-level dedup groupBy.

    Reference scope: the reference moves whole files (A-2/A-3); the
    chunking stage is part of the training-data surface this engine
    adds (SURVEY.md §6).
    """
    C, S = 32, 24
    d = docs(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("toks"), F.size(F.split("text", " ")).alias("n")
    )
    sized = d.withColumn(
        "n_chunks",
        F.when(F.col("n") <= C, F.lit(1)).otherwise(
            F.floor((F.col("n") - C + (S - 1)) / S).cast("int") + 1
        ),
    )
    return (
        sized.select(
            "doc_id",
            "toks",
            "n",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_ix"),
        )
        .select(
            "doc_id",
            F.col("chunk_ix").cast("int").alias("chunk_ix"),
            F.least(F.lit(C), F.col("n") - F.col("chunk_ix") * S).cast("int").alias("chunk_tokens"),
            F.md5(
                F.array_join(F.slice(F.col("toks"), F.col("chunk_ix") * S + 1, C), " ").cast("binary")
            ).alias("chunk_fp"),
        )
        .orderBy("doc_id", "chunk_ix")
    )


@query(
    "text_duplicate_spans",
    """
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             unnest([md5(array_to_string(list_slice(toks, i, i + 15), ' '))
                     FOR i IN range(1, n - 14)]) AS h
      FROM d WHERE n >= 16
    ),
    dh AS (SELECT h FROM s GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
    agg AS (
      SELECT s.doc_id,
             CAST(count(*) AS BIGINT) AS n_spans,
             CAST(SUM(CASE WHEN dh.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_spans
      FROM s LEFT JOIN dh USING (h)
      GROUP BY s.doc_id
    )
    SELECT doc_id, n_spans, n_dup_spans,
           ROUND(n_dup_spans * 1.0 / n_spans, 6) AS dup_frac,
           (n_dup_spans * 2 <= n_spans) AS keep
    FROM agg ORDER BY doc_id
    """,
)
def text_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication audit (the Lee et al. 'Deduplicating
    Training Data Makes Language Models Better' primitive): every
    16-token window of every document is fingerprinted, a window is
    DUPLICATED if its fingerprint occurs in >= 2 distinct documents,
    and a document is dropped when more than half its windows are
    duplicated elsewhere in the corpus.

    Plan shape (the 100 TB suffix-array stand-in): stride-1 windows
    are a pure map-side fan-out (sequence+transform+explode over the
    token array, md5 fingerprints so rows stay narrow); the duplicated
    set is one hash aggregate keyed by fingerprint (map-side partial
    collapses within-partition repeats); the verdict is a fingerprint-
    keyed join back + one per-doc aggregate.  Three exchanges total,
    all over (hash, doc) pairs — never over text.  The keep rule is
    integer-exact (2*n_dup <= n_spans) so the gate is reproducible on
    any engine.
    """
    W = 16
    d = docs(spark, sf_dir).select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).alias("n"),
    ).filter(F.col("n") >= W)
    s = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - (W - 1)),
                lambda p: F.md5(
                    F.array_join(F.slice(F.col("toks"), p, W), " ").cast("binary")
                ),
            )
        ).alias("h"),
    )
    dh = (
        s.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h", F.lit(1).alias("isdup"))
    )
    agg = (
        s.join(dh, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.coalesce(F.col("isdup"), F.lit(0))).alias("n_dup_spans"),
        )
    )
    return agg.select(
        "doc_id",
        "n_spans",
        "n_dup_spans",
        F.round(F.col("n_dup_spans") / F.col("n_spans"), 6).alias("dup_frac"),
        (F.col("n_dup_spans") * 2 <= F.col("n_spans")).alias("keep"),
    ).orderBy("doc_id")


@query(
    "corpus_quality_weighted_sample",
    f"""
    WITH w AS (
      SELECT doc_id, source,
             least(900, greatest(100, n_chars * 5)) AS rate_permille
      FROM documents
    ),
    kept AS (
      SELECT doc_id, source, rate_permille,
             (((CAST(doc_id AS DECIMAL(38,0)) + 555) * {_KNUTH}) % {_M32})
               % 1000 < rate_permille AS keep
      FROM w
    )
    SELECT source,
           count(*) AS n_candidates,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN keep THEN doc_id ELSE 0 END) AS BIGINT)
             AS kept_id_checksum,
           CAST(SUM(rate_permille) AS BIGINT) AS expected_permille_mass
    FROM kept
    GROUP BY source ORDER BY source
    """,
)
def corpus_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMPORTANCE sampling for data mixing: each document's keep
    probability scales with a quality proxy (here document length,
    clamped to [10%, 90%] — any integer score column slots in), and
    membership is decided by the same deterministic hash-threshold
    trick as corpus_sample_stratified — ``mix32(doc_id) % 1000 <
    rate``.  This is the quality-weighted upsampling/downsampling step
    of modern data recipes (keep more of what scores well) with NO RNG
    state: re-runs, re-partitioning, and replays all keep the same
    documents, and the kept-id checksum makes the oracle verify exact
    membership, not just counts.  ``expected_permille_mass`` is the
    Horvitz-Thompson normalizer a weighted-loss trainer would use.

    Scale shape: the rate and the hash are both pure map-side
    projections of the row; the only exchange is the #sources-row
    summary.  At 100 TB this is a streaming scan — no sort, no state.
    """
    d = t(spark, sf_dir, "documents")
    rate = F.least(F.lit(900), F.greatest(F.lit(100), F.col("n_chars") * 5))
    keep = (_mix32(F.col("doc_id"), salt=555) % 1000) < rate
    return (
        d.select("doc_id", "source", rate.alias("rate_permille"), keep.alias("keep"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_candidates"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("doc_id")).otherwise(0)).alias(
                "kept_id_checksum"
            ),
            F.sum("rate_permille").alias("expected_permille_mass"),
        )
        .orderBy("source")
    )


_EPOCH_SALT = 7919  # 1000th prime — decorrelates per-epoch permutations

_SHUFFLE_SHARD_ORACLE = f"""
WITH x AS (
  SELECT d.doc_id, d.n_chars, e.epoch,
         ((CAST(d.doc_id AS DECIMAL(38,0)) + e.epoch * {_EPOCH_SALT})
           * {_KNUTH}) % {_M32} AS h
  FROM documents d CROSS JOIN (VALUES (1), (2)) e(epoch)
),
o AS (
  SELECT *, CAST(h AS HUGEINT) * 10000000000000000000 + doc_id AS ord,
         CAST(CAST(h AS BIGINT) >> 28 AS INT) AS shard
  FROM x
)
SELECT epoch, shard,
       count(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       arg_min(doc_id, ord) AS first_doc,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM o GROUP BY epoch, shard
ORDER BY epoch, shard
"""


@query("corpus_shuffle_shard", _SHUFFLE_SHARD_ORACLE)
def corpus_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the
    data-loader prep step of a training pipeline: give every document
    a pseudo-random position for the epoch, bucket the corpus into
    fixed training shards, and make the whole permutation a PURE
    FUNCTION of (doc_id, epoch) so retries, replays, and re-partitions
    reproduce byte-identical shards with zero RNG state (the
    ``corpus_sample_stratified`` portability discipline: Knuth
    multiplicative hash in decimal(38,0), exact on both engines at any
    id magnitude).  A new epoch is a new salt — a fresh decorrelated
    permutation, nothing reshuffled by hand.

    Emitted per (epoch, shard): doc count, payload volume, the shard's
    FIRST document under the shuffle order (min_by over the composite
    (h, doc_id) rank — the agg_min_max_by decimal-ord pattern, exact
    past bigint range), and an id checksum so the oracle verifies
    exact membership, not just counts.

    Scale shape: the hash, shard, and rank are pure map-side
    projections; the only exchange is the partial-aggregated
    #epochs x #shards summary.  At 100 TB the shard column is exactly
    what the loader-prep job ``partitionBy``s on when writing shards,
    and within-shard order is ``ORDER BY h`` inside each partition —
    a local sort per shard file, never a global one.
    """
    d = t(spark, sf_dir, "documents")
    epochs = spark.range(1, 3).select(F.col("id").cast("int").alias("epoch"))
    x = d.crossJoin(F.broadcast(epochs))
    h = (
        (F.col("doc_id").cast("decimal(38,0)") + F.col("epoch") * F.lit(_EPOCH_SALT))
        * F.lit(_KNUTH)
    ) % F.lit(_M32)
    ord_ = (
        h.cast("decimal(18,0)").cast("decimal(38,0)")
        * F.expr("CAST(10000000000000000000 AS DECIMAL(38,0))")
        + F.col("doc_id")
    )
    # Shard from the hash's HIGH bits (28-31): the Knuth multiplier is
    # ≡ 1 (mod 16), so low bits of h are (doc_id + salt·epoch) mod 16
    # verbatim — sequential ids would round-robin and each epoch would
    # be a pure rotation of the last.  Bits 28-31 are fully mixed.
    return (
        x.select(
            "epoch",
            F.shiftright(h.cast("long"), 28).cast("int").alias("shard"),
            "doc_id",
            "n_chars",
            ord_.alias("ord"),
        )
        .groupBy("epoch", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min_by("doc_id", F.col("ord")).alias("first_doc"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("epoch", "shard")
    )
