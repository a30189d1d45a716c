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


def _drain_with(spark, src, out, ckpt, build, mode="append", nodata=True):
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.streaming.streams import run_stream_to_parquet

    schema = spark.read.parquet(src).schema
    stream = build(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    run_stream_to_parquet(
        stream, out, ckpt, mode=mode, src_dir=src, final_nodata_batch=nodata
    )


def test_dedup_state_survives_restart(spark, scratch):
    """dropDuplicates state must reload from the checkpoint across
    query lifetimes: ids seen before the restart, re-delivered after
    it, must be suppressed — the new epochs carry ONLY never-seen ids."""
    import pandas as pd

    src, out, ckpt = f"{scratch}/src", f"{scratch}/out", f"{scratch}/ckpt"
    os.makedirs(src)

    def land(name, ids, stamp):
        pd.DataFrame(
            {
                "event_id": ids,
                # micros, not pandas' default nanos — Spark's parquet
                # reader rejects TIMESTAMP(NANOS)
                "ts": pd.Series([pd.Timestamp("2024-01-01")] * len(ids)).astype(
                    "datetime64[us]"
                ),
            }
        ).to_parquet(f"{src}/{name}")
        os.utime(f"{src}/{name}", (stamp, stamp))

    def build(reader):
        return (
            reader.withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "3650 days")
            .dropDuplicates(["event_id"])
            .select("event_id")
        )

    land("a.parquet", list(range(1, 11)), 1_000_000_000)
    _drain_with(spark, src, out, ckpt, build, nodata=False)
    run1 = {r.event_id for r in spark.read.parquet(out).collect()}
    assert run1 == set(range(1, 11))

    epochs_before = set(os.listdir(out))
    # restart: the SAME ids arrive again plus five new ones
    land("b.parquet", list(range(1, 11)) + list(range(11, 16)), 1_000_000_001)
    _drain_with(spark, src, out, ckpt, build, nodata=False)
    new_rows = [
        r.event_id
        for d in set(os.listdir(out)) - epochs_before
        for r in spark.read.parquet(f"{out}/{d}").collect()
    ]
    assert sorted(new_rows) == [11, 12, 13, 14, 15], (
        "pre-restart ids re-emitted: dedup state was not resumed"
    )


def test_windowed_agg_state_survives_restart(spark, scratch):
    """An append-mode windowed aggregate whose window STRADDLES the
    restart must emit once, after the restart, with the TOTAL count —
    partial pre-restart counts live only in the state store."""
    import pandas as pd

    src, out, ckpt = f"{scratch}/src", f"{scratch}/out", f"{scratch}/ckpt"
    os.makedirs(src)

    def land(name, ts_list, stamp):
        pd.DataFrame(
            {
                "event_id": range(len(ts_list)),
                "ts": pd.Series(pd.to_datetime(ts_list)).astype("datetime64[us]"),
            }
        ).to_parquet(f"{src}/{name}")
        os.utime(f"{src}/{name}", (stamp, stamp))

    def build(reader):
        return (
            reader.withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").cast("timestamp_ntz").alias("ws"), "n")
        )

    # lifetime 1: three events in the 12:00 window — watermark can't
    # close it yet, so NOTHING emits; the count lives in state only
    land("a.parquet", ["2024-01-01 12:00:30", "2024-01-01 12:01:00", "2024-01-01 12:02:00"], 1_000_000_000)
    _drain_with(spark, src, out, ckpt, build)
    emitted_run1 = (
        [r for d in os.listdir(out) for r in spark.read.parquet(f"{out}/{d}").collect()]
        if os.path.isdir(out)
        else []
    )
    assert not [r for r in emitted_run1 if r.n], "window closed too early"

    # lifetime 2: two more events in the SAME window, then a sentinel
    # far enough ahead to close it
    land("b.parquet", ["2024-01-01 12:03:00", "2024-01-01 12:04:00", "2024-01-01 13:00:00"], 1_000_000_001)
    _drain_with(spark, src, out, ckpt, build)
    rows = [
        r
        for d in os.listdir(out)
        for r in spark.read.parquet(f"{out}/{d}").collect()
        if r.ws.hour == 12 and r.ws.minute == 0
    ]
    assert len(rows) == 1, f"straddling window emitted {len(rows)} times"
    assert rows[0].n == 5, (
        f"straddling window count {rows[0].n} != 5: pre-restart partial "
        "count lost (state not resumed)"
    )
