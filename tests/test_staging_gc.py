"""tools/staging_gc.py — LRU eviction of /tmp/sgdata staged artifacts.

The staging area accretes one artifact per fixture and per
parameterization with no eviction (round-10 verdict item 6); the GC
sweeps by the ``_SG_LASTUSE`` sidecar ``core.read_staged`` bumps.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import staging_gc  # noqa: E402


def _mk_artifact(base, fixture: str, name: str, size: int, lastuse: float) -> str:
    d = base / fixture / name
    d.mkdir(parents=True)
    (d / "part-00000.parquet").write_bytes(b"x" * size)
    (d / "_SUCCESS").write_bytes(b"")
    (d / staging_gc.FINGERPRINT).write_text("abc123")
    lu = d / staging_gc.LASTUSE
    lu.write_text(str(lastuse))
    os.utime(lu, (lastuse, lastuse))
    return str(d)


def test_scan_treats_artifact_dirs_as_atomic_units(tmp_path):
    a = _mk_artifact(tmp_path, "sf0.1", "idx_a", 10, 1000.0)
    # nested partition dir with its own parquet must not become a
    # second artifact
    os.makedirs(a + "/year=1998")
    with open(a + "/year=1998/part-0.parquet", "wb") as fh:
        fh.write(b"y" * 5)
    arts = staging_gc.scan(str(tmp_path))
    assert [x.path for x in arts] == [a]
    # includes the nested partition file (plus sidecar bytes)
    assert arts[0].bytes >= 15


def test_gc_budget_evicts_lru_first(tmp_path):
    old = _mk_artifact(tmp_path, "sf0.1", "idx_old", 100, 1000.0)
    mid = _mk_artifact(tmp_path, "sf0.1", "idx_mid", 100, 2000.0)
    new = _mk_artifact(tmp_path, "sf0.01", "idx_new", 100, 3000.0)
    report = staging_gc.gc(str(tmp_path), budget_bytes=250, now=4000.0)
    evicted = {e["path"] for e in report["evicted"]}
    assert evicted == {old}
    assert not os.path.exists(old)
    assert os.path.exists(mid) and os.path.exists(new)
    assert report["kept"] == 2


def test_gc_max_age_then_budget(tmp_path):
    now = 10 * 86400.0
    stale = _mk_artifact(tmp_path, "sf0.1", "idx_stale", 10, now - 8 * 86400)
    lru = _mk_artifact(tmp_path, "sf0.1", "idx_lru", 100, now - 2 * 86400)
    hot = _mk_artifact(tmp_path, "sf0.1", "idx_hot", 100, now - 60)
    report = staging_gc.gc(
        str(tmp_path), budget_bytes=150, max_age_days=7, now=now
    )
    evicted = {e["path"] for e in report["evicted"]}
    # stale went by age, lru by budget, hot survives
    assert evicted == {stale, lru}
    assert os.path.exists(hot)
    # empty fixture husks are pruned only when fully emptied
    assert os.path.isdir(tmp_path / "sf0.1")


def test_gc_dry_run_deletes_nothing(tmp_path):
    a = _mk_artifact(tmp_path, "sf0.1", "idx", 100, 1000.0)
    report = staging_gc.gc(str(tmp_path), budget_bytes=0, dry_run=True, now=2000.0)
    assert report["evicted"] and os.path.exists(a)


def test_gc_ignores_non_artifact_dirs(tmp_path):
    scratch = tmp_path / "sf0.1" / "checkpoints"
    scratch.mkdir(parents=True)
    (scratch / "state.bin").write_bytes(b"z" * 1000)
    report = staging_gc.gc(str(tmp_path), budget_bytes=0, now=2000.0)
    assert report["scanned"] == 0 and report["evicted"] == []
    assert os.path.exists(scratch / "state.bin")


def test_read_staged_bumps_lastuse(spark, tmp_path):
    """core.read_staged must advance the LRU clock so hot artifacts
    never look idle to the GC."""
    from ingest_sharepoint_file_to_fabric_lakehouse_spark import core

    path = str(tmp_path / "layout")
    spark.range(3).write.parquet(path)
    core.stamp_staging(path, "tok")
    lu = os.path.join(path, staging_gc.LASTUSE)
    os.utime(lu, (1000.0, 1000.0))
    core.read_staged(spark, path)
    assert os.stat(lu).st_mtime > 1000.0


def test_gc_sweeps_evicted_artifacts_aged_build_lock_siblings(tmp_path):
    """Evicting an artifact must also remove a crashed builder's aged
    lease files sitting BESIDE the dir (`<name>__build__merge_lock`
    and its .hb/.rel-/.stale- remnants) — but never a FRESH lock (an
    in-flight rebuild's lease)."""
    import time

    a = _mk_artifact(tmp_path, "sf0.1", "idx_locky", 100, 1000.0)
    old_ts = 1000.0
    aged = [a + "__build__merge_lock", a + "__build__merge_lock.hb",
            a + "__build__merge_lock.rel-dead"]
    for fp in aged:
        with open(fp, "w") as fh:
            fh.write("t")
        os.utime(fp, (old_ts, old_ts))
    # a FRESH lock beside the same evicted artifact = a live rebuild's
    # lease mid-flight; the age gate must leave it alone
    fresh = a + "__build__merge_lock.stale-live"
    with open(fresh, "w") as fh:
        fh.write("live")
    _mk_artifact(tmp_path, "sf0.1", "idx_keep", 100, time.time())
    report = staging_gc.gc(str(tmp_path), max_age_days=1.0)
    assert [e["path"] for e in report["evicted"]] == [a]
    for fp in aged:
        assert not os.path.exists(fp), fp
    assert os.path.exists(fresh)  # fresh lease file untouched
