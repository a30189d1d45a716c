"""MERGE (upsert) for parquet tables — realizes the reference's
declared-but-unimplemented Delta sink (`config.py:16`,
``/Tables/dbo/sales_transaction``).

delta-spark isn't available in this environment, so the engine ships a
portable MERGE built from a full-outer join; the same call site swaps
to ``DeltaTable.merge`` when Delta is on the classpath (import-gated
below).

Two write strategies, chosen by target layout:

* **Partitioned target** (:func:`merge_upsert_partitioned`): only the
  partitions present in the source are read (partition-pruned scan),
  merged, and rewritten via dynamic partition overwrite — a single
  write that replaces exactly the touched partition directories.
  Untouched partitions are never read or written.  This is the 100 TB
  path: a MERGE touching one day of a year-partitioned table costs one
  day, not the table.
* **Unpartitioned target** (:func:`merge_upsert`): full-outer-join
  merge staged to a temp directory (ONE write of the merged result),
  then swapped in with filesystem renames (target → backup, tmp →
  target) so a mid-swap failure leaves either the old or the new
  complete table, never a half-written one.  Staging/backup dirs are
  removed in a ``finally`` block.

The join shuffles both sides on the merge key — identical shuffle
shape to Delta's own MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pragma: no cover - delta not installed here
    from delta.tables import DeltaTable  # noqa: F401

    HAVE_DELTA = True
except ImportError:
    HAVE_DELTA = False


def write_table(df: DataFrame, path: str, part_col: str | None = None) -> None:
    """Seed a merge target: Delta format when delta-spark is on the
    classpath, plain parquet otherwise.  One seam, so the whole MERGE
    surface flips to real Delta by installing the package."""
    w = df.write.mode("overwrite")
    if part_col is not None:
        w = w.partitionBy(part_col)
    if HAVE_DELTA:  # pragma: no cover - delta not installed here
        w.format("delta").save(path)
    else:
        w.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a merge target written by :func:`write_table`.  A Delta
    table must NOT be read as bare parquet (stale versions' files
    would double-count), so the format is detected, not assumed."""
    if HAVE_DELTA and DeltaTable.isDeltaTable(spark, path):  # pragma: no cover
        return spark.read.format("delta").load(path)
    return spark.read.parquet(path)


def _merged_frame(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """MERGE semantics as a relational plan: matched → take source row,
    not-matched → keep target row / insert source row."""
    src = source.select(target.columns)  # align column order
    src_matched = F.col(f"s.{key}").isNotNull()
    return (
        target.alias("t")
        .join(src.alias("s"), F.col(f"t.{key}") == F.col(f"s.{key}"), "full")
        .select(
            *[
                F.when(src_matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
                for c in target.columns
            ]
        )
    )


def _fs(spark: SparkSession, path: str):
    """Hadoop FileSystem for ``path`` — rename/delete work on any
    HDFS-compatible store, not just the local FS."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    key: str,
) -> None:
    """MERGE INTO an *unpartitioned* target (see module doc: one
    staged write + rename swap; idempotent re-ingest semantics the
    reference lacks, SURVEY.md §4.1 "Incremental/exactly-once").

    When delta-spark is installed and the target is a Delta table,
    this is a real ``DeltaTable.merge`` — transactional, no rename
    dance needed; the portable full-outer-join path is the fallback.
    """
    if HAVE_DELTA and DeltaTable.isDeltaTable(spark, target_path):  # pragma: no cover
        (
            DeltaTable.forPath(spark, target_path)
            .alias("t")
            .merge(source.alias("s"), f"t.{key} = s.{key}")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return
    target = spark.read.parquet(target_path)
    merged = _merged_frame(target, source, key)

    tmp = target_path.rstrip("/") + "__merge_tmp"
    bak = target_path.rstrip("/") + "__merge_bak"
    fs, jtarget = _fs(spark, target_path)
    jtmp = spark._jvm.org.apache.hadoop.fs.Path(tmp)
    jbak = spark._jvm.org.apache.hadoop.fs.Path(bak)
    try:
        fs.delete(jtmp, True)
        fs.delete(jbak, True)
        merged.write.mode("overwrite").parquet(tmp)
        # swap: the only non-atomic window is between the two renames,
        # and a failure there leaves the complete old table at `bak`.
        if not fs.rename(jtarget, jbak):
            raise OSError(f"rename {target_path} -> {bak} failed")
        if not fs.rename(jtmp, jtarget):
            fs.rename(jbak, jtarget)  # roll back
            raise OSError(f"rename {tmp} -> {target_path} failed")
    finally:
        fs.delete(jtmp, True)
        fs.delete(jbak, True)


def merge_upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    key: str,
    part_col: str,
) -> None:
    """MERGE INTO a parquet target partitioned by ``part_col``:
    partition-pruned read of only the touched partitions, one dynamic
    partition overwrite write.

    Assumes ``part_col`` is stable per key (a row never migrates
    between partitions) — the standard partitioned-MERGE contract.
    ``part_col`` must be bounded-cardinality (it's a partition column),
    so collecting the touched-partition values is driver-safe.

    On a Delta target the same touched-partition predicate goes into
    the MERGE condition, so Delta's file pruning skips untouched
    partitions exactly like the parquet path's pruned read.
    """
    touched = [r[0] for r in source.select(part_col).distinct().collect()]
    if HAVE_DELTA and DeltaTable.isDeltaTable(spark, target_path):  # pragma: no cover
        in_list = ", ".join(repr(v) for v in touched)
        (
            DeltaTable.forPath(spark, target_path)
            .alias("t")
            .merge(
                source.alias("s"),
                f"t.{part_col} IN ({in_list}) AND t.{key} = s.{key}",
            )
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return
    target = spark.read.parquet(target_path).filter(F.col(part_col).isin(touched))
    merged = _merged_frame(target, source, key)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(part_col)
        .parquet(target_path)
    )
