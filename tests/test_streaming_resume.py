"""Streaming checkpoint RESUME semantics: a query killed between
micro-batches and restarted against the same checkpoint must process
only the unseen input and never double-count — the exactly-once
restart property a 100 TB deployment depends on (reference behavior:
`sharepoint_to_bronze_delta.py` restarts its whole driver script and
relies on the incremental anti-join; the engine's streaming path gets
the same guarantee from the offset log + idempotent epoch sinks).

Simulated restart: two SEPARATE StreamingQuery lifetimes over one
checkpoint dir.  Run 1 sees half the input files and drains
(AvailableNow); more files then arrive; run 2 reuses the checkpoint
and must emit exactly the new rows, with the union of epoch outputs
equal to a one-shot batch read of everything.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from ingest_sharepoint_file_to_fabric_lakehouse_spark.streaming.streams import (
    stage_event_files,
)


@pytest.fixture()
def scratch(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def _drain(spark, src, out, ckpt):
    schema = spark.read.parquet(src).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream.foreachBatch(
            lambda b, e: b.write.mode("overwrite").parquet(f"{out}/epoch={e}")
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_checkpoint_resume_processes_only_new_files(spark, sf_dir, scratch):
    staged = stage_event_files(spark, sf_dir)
    files = sorted(glob.glob(f"{staged}/*.parquet"))
    assert len(files) >= 4
    src = f"{scratch}/src"
    out = f"{scratch}/out"
    ckpt = f"{scratch}/ckpt"
    os.makedirs(src)

    # run 1: first half of the input, first query lifetime
    for f in files[:2]:
        shutil.copy2(f, src)
    _drain(spark, src, out, ckpt)
    run1_ids = {
        r.event_id for r in spark.read.parquet(out).select("event_id").collect()
    }
    first_half_ids = {
        r.event_id
        for f in files[:2]
        for r in spark.read.parquet(f).select("event_id").collect()
    }
    assert run1_ids == first_half_ids

    # "restart": new query lifetime, same checkpoint, new files landed
    for f in files[2:]:
        shutil.copy2(f, src)
    epochs_before = set(os.listdir(out))
    _drain(spark, src, out, ckpt)
    new_epochs = set(os.listdir(out)) - epochs_before
    assert new_epochs, "resume produced no new epochs"

    # run 2 processed ONLY the unseen files (offset log, no replay)
    run2_rows = [
        r.event_id
        for d in new_epochs
        for r in spark.read.parquet(f"{out}/{d}").select("event_id").collect()
    ]
    second_half_ids = {
        r.event_id
        for f in files[2:]
        for r in spark.read.parquet(f).select("event_id").collect()
    }
    assert set(run2_rows) == second_half_ids
    assert len(run2_rows) == len(second_half_ids), "duplicate rows after resume"

    # union of all epochs == one-shot batch read: exactly-once overall
    all_ids = [
        r.event_id for r in spark.read.parquet(out).select("event_id").collect()
    ]
    batch_ids = {
        r.event_id for r in spark.read.parquet(src).select("event_id").collect()
    }
    assert set(all_ids) == batch_ids
    assert len(all_ids) == len(batch_ids)

    # epoch ids continue across lifetimes (the offset log carried over)
    assert max(int(d.split("=")[1]) for d in new_epochs) > max(
        int(d.split("=")[1]) for d in epochs_before
    )


def test_checkpoint_replay_of_committed_epoch_is_idempotent(spark, sf_dir, scratch):
    """If the sink wrote epoch N but the driver died BEFORE the commit
    log recorded it, restart re-delivers epoch N to foreachBatch.  The
    overwrite-per-epoch layout makes that replay a no-op — simulated
    here by deleting the commit-log entry for the last epoch and
    draining again with files unchanged."""
    staged = stage_event_files(spark, sf_dir)
    files = sorted(glob.glob(f"{staged}/*.parquet"))
    src = f"{scratch}/src"
    out = f"{scratch}/out"
    ckpt = f"{scratch}/ckpt"
    os.makedirs(src)
    for f in files[:2]:
        shutil.copy2(f, src)
    _drain(spark, src, out, ckpt)
    before = {
        r.event_id for r in spark.read.parquet(out).select("event_id").collect()
    }

    # crash window: offsets for the last batch exist, its commit doesn't
    # (the hidden Hadoop .crc sibling must go too — a stale checksum
    # makes the replayed commit's rename fail and trips Spark's
    # concurrent-modification guard instead of the replay path)
    commits = sorted(
        (c for c in os.listdir(f"{ckpt}/commits") if not c.startswith(".")),
        key=int,
    )
    os.remove(f"{ckpt}/commits/{commits[-1]}")
    crc = f"{ckpt}/commits/.{commits[-1]}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    _drain(spark, src, out, ckpt)

    after = {
        r.event_id for r in spark.read.parquet(out).select("event_id").collect()
    }
    assert after == before, "epoch replay changed the committed output"


def test_python_stream_source_offset_resume(spark, scratch):
    """The Python streaming data source's offset log must survive a
    query restart: run 1 drains one micro-batch (availableNow stops at
    the first read()'s end offset), run 2 reuses the checkpoint and
    must continue FROM that offset — the union is exactly the full
    feed, nothing doubled, nothing skipped.  This is the engine-owned
    cursor the reference's re-list-everything loop lacks."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    feed = [(i, f"file{i}") for i in range(7)]

    class _R(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"seq": 0}

        def read(self, start):
            s = int(start["seq"])
            chunk = feed[s : s + 3]
            return iter(chunk), {"seq": s + len(chunk)}

        def readBetweenOffsets(self, start, end):
            return iter(feed[int(start["seq"]) : int(end["seq"])])

    class _Src(DataSource):
        @classmethod
        def name(cls):
            return "resume_test_feed"

        def schema(self):
            return "seq bigint, name string"

        def simpleStreamReader(self, schema):
            return _R()

    spark.dataSource.register(_Src)
    out, ckpt = f"{scratch}/out", f"{scratch}/ckpt"

    def run_once():
        def sink(df, eid):
            df.write.mode("overwrite").parquet(f"{out}/epoch={eid}")

        q = (
            spark.readStream.format("resume_test_feed")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # batch 0: seq 0-2
    first = {r.seq for r in spark.read.parquet(f"{out}/epoch=*").collect()}
    assert first == {0, 1, 2}, first
    run_once()  # restart: must resume at seq 3, not replay
    run_once()  # and again for the tail
    rows = spark.read.parquet(f"{out}/epoch=*").collect()
    seqs = sorted(r.seq for r in rows)
    assert seqs == list(range(7)), seqs  # complete, no duplicates
