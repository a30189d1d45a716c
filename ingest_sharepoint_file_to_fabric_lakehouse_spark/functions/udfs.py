"""UDF / UDAF / UDTF surface (SURVEY.md §2 B.10) — the extension
points, each with a built-in-SQL oracle proving semantic equivalence.

Performance doctrine (north star): built-ins first; when Python is
unavoidable, Arrow-vectorized ``pandas_udf`` / ``applyInPandas`` /
``mapInPandas`` (batch transfer, numpy kernels) — never row-at-a-time
``udf`` in a hot path.  ``udf_python_scalar`` exists to document the
slow path, deliberately on a tiny dimension table.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

from ..core import query, t


@query(
    "udf_python_scalar",
    """
    SELECT p_partkey,
           lower(replace(p_name, '''', '_')) AS safe_name
    FROM part
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF: the reference's filename sanitizer
    (sharepoint_to_bronze_delta.py:208) — slow path, small table only."""

    @F.udf(returnType=StringType())
    def sanitize(name: str) -> str:
        return name.replace("'", "_").lower()

    return t(spark, sf_dir, "part").select("p_partkey", sanitize("p_name").alias("safe_name"))


@query(
    "udf_pandas_scalar",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    WHERE l_orderkey < 1000
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF (Series→Series numpy kernel)."""

    @pandas_udf(DoubleType())
    def disc_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_price("l_extendedprice", "l_discount").alias("disc_price"),
    )


@query(
    "udaf_pandas_grouped",
    """
    SELECT l_returnflag,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                       * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate UDAF via applyInPandas: quantity-weighted
    average price per return flag.

    Sums are exact: values are scaled by 10^4 to int64 (both columns
    have ≤4 decimal digits), products reduced with chunked int64
    partial sums (chunk sized so no chunk can overflow) combined as
    arbitrary-precision Python ints — matching the decimal-SQL oracle
    bit-for-bit, independent of partitioning (same discipline as
    core.dec), at numpy speed instead of a Python-int element loop.

    Skew note: groupBy(l_returnflag) has only a handful of groups, so
    parallelism == group count by construction — inherent to any
    grouped UDAF over few groups; the built-in decimal path
    (agg_group_sum) is the right tool when partial aggregation matters.
    """
    import numpy as np

    def _exact_sum(arr) -> int:
        """Exact sum of an int64 array: int64 chunk sums (chunk chosen
        so |chunk_sum| < 2^62 can't overflow), Python-int combine."""
        if len(arr) == 0:
            return 0
        m = int(np.abs(arr).max())
        chunk = max(1, (1 << 62) // max(m, 1))
        return sum(int(arr[i : i + chunk].sum()) for i in range(0, len(arr), chunk))

    def weighted(pdf: pd.DataFrame) -> pd.DataFrame:
        p = np.rint(pdf.l_extendedprice.to_numpy() * 10_000).astype("int64")
        w = np.rint(pdf.l_quantity.to_numpy() * 10_000).astype("int64")
        num = _exact_sum(p * w)  # scaled by 10^8; per-element products fit int64
        den = _exact_sum(w)  # scaled by 10^4
        # int/int division is correctly rounded — mirrors the oracle's
        # CAST(decimal AS DOUBLE) / CAST(decimal AS DOUBLE) exactly
        avg = (num / 10**8) / (den / 10**4)
        return pd.DataFrame(
            {
                "l_returnflag": [pdf.l_returnflag.iloc[0]],
                "weighted_avg_price": [round(avg, 6)],
            }
        )

    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice", "l_quantity")
    return li.groupBy("l_returnflag").applyInPandas(
        weighted, "l_returnflag string, weighted_avg_price double"
    )


@query(
    "udtf_map_in_pandas",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) AS n_bytes
    FROM documents
    """,
)
def udtf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition batch transform via mapInPandas — the distributed
    replacement for the reference's driver-side iterrows loop
    (sharepoint_to_bronze_delta.py:206)."""

    def tokenize(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf.doc_id,
                    "n_tokens": pdf.text.str.split(" ").str.len(),
                    "n_bytes": pdf.text.str.len(),
                }
            )

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(tokenize, "doc_id long, n_tokens int, n_bytes int")


@query(
    "udf_pandas_cosine",
    """
    WITH e AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings
    ),
    q AS (SELECT v AS q_vec FROM e WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id,
             ROUND(list_cosine_similarity(q.q_vec, e.v), 6) AS cos_sim
      FROM e CROSS JOIN q
      WHERE e.vec_id <> 0
    )
    SELECT vec_id, cos_sim FROM (
      SELECT vec_id, cos_sim,
             row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rnk
      FROM scored
    ) WHERE rnk <= 10
    """,
)
def udf_pandas_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batch numpy cosine kernel — the vectorized re-rank path
    for similarity search (B.9 meets B.10).

    numpy accumulates in float64; result rounded to 6 so pairwise-sum
    order differences vs the sequential SQL oracle can't surface.
    """
    import numpy as np

    e = t(spark, sf_dir, "embeddings")
    qvec = (
        e.filter(F.col("vec_id") == 0)
        .select(F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .collect()[0]["v"]
    )
    qarr = pd.Series(qvec).to_numpy()
    qnorm = float(np.sqrt((qarr * qarr).sum()))

    @pandas_udf(DoubleType())
    def cos(col: pd.Series) -> pd.Series:
        m = np.stack(col.to_numpy())
        sims = m.astype("float64") @ qarr / (np.sqrt((m.astype("float64") ** 2).sum(axis=1)) * qnorm)
        return pd.Series(sims)

    scored = (
        e.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cos("embedding"), 6).alias("cos_sim"))
    )
    top = scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(10)
    return top.select("vec_id", "cos_sim")


@query(
    "udf_cogrouped_asof",
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
def udf_cogrouped_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas`` — the third pandas API surface
    (scalar and grouped variants are covered above): both sides are
    hash-partitioned on user_id, each user's purchases and clicks
    arrive as a PAIR of Arrow batches, and ``pd.merge_asof`` performs
    the backward as-of merge per group.

    Same semantics (and the same oracle) as join_asof_latest, which
    realizes as-of relationally via union + window — this is the
    kernel-style alternative for logic genuinely easier in pandas.

    Scale shape — cogroup on a HASH BUCKET of the key, not the key
    itself: a per-user cogroup invoked the Python kernel once per
    user (~4 ms × 1500 users = 6+ s at sf0.1, and a kernel call per
    key at 100 TB is a non-starter), while ``pd.merge_asof(by=
    "user_id")`` already vectorizes the per-key as-of INSIDE one
    call.  64 buckets give the session full parallelism with ~64
    kernel invocations total (measured 6.3 s → ~1 s), per-bucket
    memory is corpus/64, and the exchange is still one hash
    partition pass per side.  Clicks are pre-deduped per (user, ts)
    relationally so the kernel never sees tie ambiguity.
    """
    import pandas as pd

    n_buckets = 64
    bkt = F.pmod(F.hash("user_id"), F.lit(n_buckets)).alias("bkt")
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value", bkt
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
        .select("user_id", "ts", "value", bkt)
    )

    cols = ["event_id", "user_id", "ts", "value", "asof_ts", "asof_value"]
    dtypes = {
        "event_id": "Int64",
        "user_id": "Int64",
        "ts": "datetime64[us]",
        "value": "float64",
        "asof_ts": "datetime64[us]",
        "asof_value": "float64",
    }

    def _typed_nulls(left: pd.DataFrame) -> pd.DataFrame:
        n = len(left)
        return pd.DataFrame(
            {
                c: (
                    left[c].reset_index(drop=True)
                    if c in left.columns
                    else pd.Series([None] * n, dtype=dtypes[c])
                )
                for c in cols
            }
        )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # Contract quirks of cogrouped applyInPandas the kernel MUST
        # tolerate: (a) an empty side arrives with NO columns at all;
        # (b) Catalyst prunes the INPUT columns to what the query
        # consumes — under COUNT(*) every column is pruned away and
        # only the output row CARDINALITY is observable, which for a
        # left as-of join is len(left).  Null padding must be TYPED
        # (NaT for timestamps, NA for ints): a bare float NaN column
        # fails the Arrow cast back to timestamp/long.
        if left.empty:
            return _typed_nulls(left)  # clicks-only bucket: emit nothing
        if "ts" not in left.columns or (len(right) > 0 and "ts" not in right.columns):
            return _typed_nulls(left)  # pruned invocation
        left = left.sort_values("ts", kind="mergesort")
        if right.empty:
            # a bucket with purchases but no clicks: typed empty right
            # so merge_asof still emits the NaT/NaN LEFT-join rows
            right = pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=left["user_id"].dtype),
                    "asof_ts": pd.Series([], dtype=left["ts"].dtype),
                    "asof_value": pd.Series([], dtype="float64"),
                }
            )
        else:
            right = (
                right.rename(columns={"ts": "asof_ts", "value": "asof_value"})
                .sort_values("asof_ts", kind="mergesort")
            )
        out = pd.merge_asof(
            left,
            right,
            left_on="ts",
            right_on="asof_ts",
            by="user_id",
            direction="backward",
        )
        return out[cols]

    return (
        purchases.groupBy("bkt")
        .cogroup(clicks.groupBy("bkt"))
        .applyInPandas(
            merge,
            "event_id long, user_id long, ts timestamp_ntz, value double, "
            "asof_ts timestamp_ntz, asof_value double",
        )
    )


@query(
    "udtf_lateral_python",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(len(ts) AS BIGINT) AS n_tokens,
           ts[1] AS first_token,
           ts[-1] AS last_token
    FROM toks
    ORDER BY doc_id
    """,
)
def udtf_lateral_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (Spark 4 ``@udtf``) applied laterally: one
    input row fans out to one row per token, then re-aggregates to
    per-doc stats — the table-function API surface, distinct from
    udtf_map_in_pandas (which is a partition-wise mapper, not a
    per-row lateral).

    Honest scale note: a Python UDTF is row-at-a-time across the
    Python boundary — the demo caps input at 50 docs, and anything
    hot-path does this with explode/split builtins (text.py) or an
    Arrow-batched kernel.  The UDTF's place at 100 TB is logic that
    genuinely needs per-row Python with variable fan-out (parsers,
    tokenizers with state) at modest row counts.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class SplitTokens:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    spark.udtf.register("split_tokens", SplitTokens)
    t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "_udtf_docs"
    )
    rows = spark.sql(
        """
        SELECT d.doc_id, s.pos, s.token
        FROM _udtf_docs d, LATERAL split_tokens(d.text) s
        """
    )
    return (
        rows.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.min_by("token", "pos").alias("first_token"),
            F.max_by("token", "pos").alias("last_token"),
        )
        .orderBy("doc_id")
    )
