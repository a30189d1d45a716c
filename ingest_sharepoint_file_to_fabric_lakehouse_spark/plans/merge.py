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
  then committed with the rename protocol below.

The join shuffles both sides on the merge key — identical shuffle
shape to Delta's own MERGE.

Commit protocol (unpartitioned path)
------------------------------------
Renames are atomic metadata operations on POSIX and HDFS-compatible
stores; writes are not.  The protocol makes every crash point
recoverable by construction:

1. ``recover_table`` — heal any prior crash (rules below), leaving a
   committed table and no stray dirs.
2. Stage: write the merged result to ``<target>__merge_tmp``.  Spark's
   committer drops a ``_SUCCESS`` marker only when the write finished —
   that marker is the staged table's completeness witness.
3. ``rename(target, <target>__merge_bak)`` — the old table is intact
   under a new name; the commit is now in flight.
4. ``rename(tmp, target)`` — THE commit point.  Before it, recovery
   rolls back; after it, the new table is live.
5. ``delete(bak)`` — post-commit cleanup.

Recovery rules (``recover_table``; also run by ``read_table``):

* target exists → committed.  Delete stray ``tmp`` (crash during/after
  step 2: old state) and stray ``bak`` (crash before step 5: new state).
* target missing, ``bak`` exists, ``tmp/_SUCCESS`` exists → crash
  between steps 3 and 4 with a COMPLETE staged table: roll forward
  (``rename(tmp, target)``, delete bak).
* target missing, ``bak`` exists, no ``tmp/_SUCCESS`` → staged table
  not provably complete: roll back (``rename(bak, target)``, delete
  tmp).
* target missing, no ``bak``, ``tmp`` exists → no commit ever started
  against a live table: delete tmp, report missing target.

Every state therefore reads back as either the complete OLD or the
complete NEW table — never torn (`tests/test_operators.py::
test_merge_upsert_crash_*` kills the writer at each step and asserts
exactly this).

Concurrency
-----------
* **Writers** are serialized by a lease file ``<target>__merge_lock``
  (:func:`_acquire_lock`): atomic create-if-absent (``FileSystem.
  create(overwrite=False)`` — atomic on HDFS-compatible stores), owner
  UUID inside, stale-lease takeover when the lock's mtime exceeds
  ``lock_ttl_sec`` (a crashed writer's lock ages out; takeover claims
  it by RENAMING it to a uniquified name first, so two takeover racers
  can't both free it — renames are atomic, only one wins).  A second
  live writer polls up to ``lock_wait_sec`` then raises
  :class:`MergeLockTimeout`.  A live writer's failure releases the
  lock in ``finally``; only process death leaves it, which is exactly
  the case the TTL covers.  Because the STAGE write is arbitrarily
  long, the writer re-verifies lease ownership (and re-arms the TTL)
  between staging and the destructive renames — a stage that outlived
  the TTL and lost its lease to a takeover ABORTS with
  :class:`MergeLockTimeout` instead of interleaving renames with the
  new owner (:func:`_hold_lease`).
* **Readers** are lock-free.  ``read_table`` runs recovery only when
  the target path is MISSING (a committed table needs none), so a
  reader can no longer delete a live writer's in-progress ``tmp`` or
  free its ``bak`` mid-commit.  The one remaining overlap — a reader
  arriving between steps 3 and 4 rolls the complete staged table
  forward itself — is tolerated by the writer: a failed step-4 rename
  re-probes the state and treats "target present, tmp gone" as its
  own commit having been completed by the recoverer.
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
    would double-count), so the format is detected, not assumed.

    Recovery runs ONLY when the target path is missing (one metadata
    ``exists`` probe when nothing is wrong): a present target is by
    protocol a complete committed table, and running the stray-dir
    sweep against it would race a LIVE writer — deleting its
    in-progress ``tmp`` between steps 2-3, or freeing its ``bak``
    between 3-4.  Stray-dir cleanup after a crash is merge_upsert's
    step-1 job, not the reader's.  A reader arriving after a mid-swap
    crash (target missing) still heals and sees a complete table."""
    if HAVE_DELTA and DeltaTable.isDeltaTable(spark, path):  # pragma: no cover
        return spark.read.format("delta").load(path)
    fs, jtarget = _fs(spark, path)
    if not fs.exists(jtarget):
        recover_table(spark, path)
    return spark.read.parquet(path)


class MergeLockTimeout(RuntimeError):
    """A concurrent MERGE holds the target's lease and did not release
    it within ``lock_wait_sec``.  The caller retries later — the lease
    holder is (by the TTL rule) a LIVE writer making progress."""


def _lock_path(spark: SparkSession, target_path: str):
    mk = spark._jvm.org.apache.hadoop.fs.Path
    return mk(target_path.rstrip("/") + "__merge_lock")


def _acquire_lock(
    spark: SparkSession,
    target_path: str,
    lock_ttl_sec: float,
    lock_wait_sec: float,
) -> str:
    """Take the target's writer lease.  Returns the owner token the
    caller must pass to :func:`_release_lock`.

    Atomic create-if-absent: ``FileSystem.create(path, False)`` on
    HDFS-compatible stores (atomic there by contract), but on the
    ``file://`` scheme that call is check-then-act (RawLocalFileSystem
    probes ``exists`` then opens — two simultaneous local writers can
    BOTH win, measured in the two-thread test), so the local scheme
    uses POSIX ``O_CREAT|O_EXCL`` which the kernel makes exclusive.
    A lock older than ``lock_ttl_sec`` belongs to a dead writer:
    takeover first RENAMES it to a uniquified stale name (atomic — of
    N racing takeover attempts exactly one rename succeeds; the losers
    go back to polling), then deletes the renamed file and retries the
    create.
    """
    import os
    import time
    import uuid

    fs, _ = _fs(spark, target_path)
    jlock = _lock_path(spark, target_path)
    local = fs.getUri().getScheme() == "file"
    token = uuid.uuid4().hex
    deadline = time.monotonic() + lock_wait_sec
    while True:
        try:
            if local:
                fd = os.open(
                    jlock.toUri().getPath(),
                    os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                )
                os.write(fd, token.encode())
                os.close(fd)
            else:  # pragma: no cover - needs a real HDFS-compatible store
                out = fs.create(jlock, False)
                out.write(bytearray(token.encode()))
                out.close()
            return token
        except Exception:
            pass  # lock present (or transient create race) — probe it
        try:
            age_sec = (
                time.time() * 1000.0 - fs.getFileStatus(jlock).getModificationTime()
            ) / 1000.0
        except Exception:
            continue  # vanished between create and stat — retry create
        if age_sec > lock_ttl_sec:
            stale = spark._jvm.org.apache.hadoop.fs.Path(
                jlock.toString() + ".stale-" + token
            )
            # atomic claim: one winner.  A losing racer's rename may
            # RAISE rather than return false (RawLocalFileSystem falls
            # back to copy on a vanished source and throws
            # FileNotFoundException) — both shapes mean "lost the
            # claim", both go back to the create loop.
            try:
                claimed = fs.rename(jlock, stale)
            except Exception:
                claimed = False
            if claimed:
                fs.delete(stale, False)
            continue
        if time.monotonic() >= deadline:
            raise MergeLockTimeout(
                f"merge lease on {target_path} held by a live writer for "
                f">{lock_wait_sec}s (lock age {age_sec:.1f}s, ttl {lock_ttl_sec}s)"
            )
        time.sleep(min(0.05, lock_wait_sec / 20.0 or 0.05))


def _hold_lease(spark: SparkSession, target_path: str, token: str) -> bool:
    """True iff the lease is still OURS; refreshes its mtime when so.

    Called between the (arbitrarily long) stage write and the
    destructive renames: a stage that outlives ``lock_ttl_sec`` makes
    the lease eligible for takeover, and if another writer claimed it
    the commit MUST abort — proceeding would reintroduce exactly the
    interleaved-rename race the lease exists to prevent.  The refresh
    re-arms the TTL so the remaining window (metadata renames, ~ms)
    never ages past it.
    """
    fs, _ = _fs(spark, target_path)
    jlock = _lock_path(spark, target_path)
    try:
        stream = fs.open(jlock)
        held = bytes(stream.readAllBytes()).decode()
        stream.close()
    except Exception:
        return False  # lock gone: taken over (and possibly released)
    if held != token:
        return False
    import time

    now_ms = int(time.time() * 1000)
    try:
        fs.setTimes(jlock, now_ms, now_ms)
    except Exception:
        pass  # refresh is best-effort; ownership is what matters
    return True


def _release_lock(spark: SparkSession, target_path: str, token: str) -> None:
    """Drop the lease IF still ours — after a TTL takeover the lock
    file belongs to the new owner and must not be deleted out from
    under them (ownership = the token written at create)."""
    fs, _ = _fs(spark, target_path)
    jlock = _lock_path(spark, target_path)
    try:
        stream = fs.open(jlock)
        held = bytes(stream.readAllBytes()).decode()
        stream.close()
        if held == token:
            fs.delete(jlock, False)
    except Exception:
        pass  # already gone (taken over + released) — nothing ours remains


class SimulatedCrash(RuntimeError):
    """Raised by ``merge_upsert``'s crash-injection hook: propagates
    without running ANY cleanup, leaving the exact on-disk state a
    ``kill -9`` at that point would (renames are metadata-atomic, so
    exception-without-cleanup and process death are indistinguishable
    to the filesystem)."""


def _paths(spark: SparkSession, target_path: str):
    fs, jtarget = _fs(spark, target_path)
    mk = spark._jvm.org.apache.hadoop.fs.Path
    base = target_path.rstrip("/")
    return fs, jtarget, mk(base + "__merge_tmp"), mk(base + "__merge_bak"), mk(
        base + "__merge_tmp/_SUCCESS"
    )


def recover_table(spark: SparkSession, target_path: str) -> str:
    """Heal a crashed :func:`merge_upsert` per the module-doc protocol.

    Returns which rule fired: ``"committed"`` (target intact, stray
    dirs removed), ``"rolled_forward"`` (complete staged table
    promoted), ``"rolled_back"`` (old table restored), or
    ``"missing"`` (no table and nothing recoverable).  Idempotent —
    every exit leaves a state where re-running is a no-op.
    """
    fs, jtarget, jtmp, jbak, jtmp_ok = _paths(spark, target_path)
    if fs.exists(jtarget):
        fs.delete(jtmp, True)
        fs.delete(jbak, True)
        return "committed"

    def _try_rename(src, why: str) -> None:
        # Two RECOVERERS can race the same crash state (e.g. two
        # readers both find the target missing).  The loser's rename
        # returns false or THROWS (local-FS copy fallback on the
        # vanished source); either way, the winner having restored the
        # target is success — only a still-missing target is an error.
        try:
            ok = fs.rename(src, jtarget)
        except Exception:
            ok = False
        if not ok and not fs.exists(jtarget):
            raise OSError(f"recovery rename {why} -> {target_path} failed")

    if fs.exists(jbak):
        if fs.exists(jtmp_ok):
            _try_rename(jtmp, "tmp")
            fs.delete(jbak, True)
            return "rolled_forward"
        fs.delete(jtmp, True)
        _try_rename(jbak, "bak")
        return "rolled_back"
    fs.delete(jtmp, True)
    return "missing"


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
    _crash: str | None = None,
    lock_ttl_sec: float = 600.0,
    lock_wait_sec: float = 60.0,
    _between_backup_and_commit=None,
    _after_stage=None,
) -> None:
    """MERGE INTO an *unpartitioned* target (see module doc: staged
    write + the documented atomic-rename commit protocol; idempotent
    re-ingest semantics the reference lacks, SURVEY.md §4.1
    "Incremental/exactly-once").

    When delta-spark is installed and the target is a Delta table,
    this is a real ``DeltaTable.merge`` — transactional, no rename
    dance needed; the portable commit-protocol path is the fallback.

    ``_crash`` is the test-only crash-injection hook: naming a step
    (``"after_stage_write"``, ``"after_backup_rename"``,
    ``"after_commit_rename"``) raises :class:`SimulatedCrash` right
    after it, skipping all subsequent rename-protocol steps — the
    on-disk table state a process kill at that instant leaves.  There
    is deliberately NO ``finally`` cleanup of tmp/bak: a crashed run's
    debris is healed by the NEXT ``recover_table`` (step 1), which is
    what makes the simulation faithful.  The writer LEASE, by
    contrast, IS released in ``finally`` — a live process's failure
    must free the lease immediately; only real process death leaves
    it, and that is precisely the case ``lock_ttl_sec``'s stale
    takeover exists for (forged-stale-lock test pins it).
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

    def crashpoint(step: str) -> None:
        if _crash == step:
            raise SimulatedCrash(step)

    token = _acquire_lock(spark, target_path, lock_ttl_sec, lock_wait_sec)
    try:
        # Step 1: heal any prior crash before reading the target.
        state = recover_table(spark, target_path)
        if state == "missing":
            raise FileNotFoundError(f"merge target does not exist: {target_path}")
        fs, jtarget, jtmp, jbak, _ = _paths(spark, target_path)
        target = spark.read.parquet(target_path)
        merged = _merged_frame(target, source, key)

        # Step 2: stage the merged table (Spark drops tmp/_SUCCESS on
        # completion — the roll-forward witness).
        merged.write.mode("overwrite").parquet(jtmp.toString())
        crashpoint("after_stage_write")
        if _after_stage is not None:  # test-only interleave
            _after_stage()
        # Lease checkpoint: the stage write is the long pole, and a
        # stage outliving lock_ttl_sec makes the lease stealable.
        # Verify ownership (and re-arm the TTL) BEFORE the destructive
        # renames — losing the lease here must abort, not interleave.
        if not _hold_lease(spark, target_path, token):
            raise MergeLockTimeout(
                f"merge lease on {target_path} lost during staging "
                f"(stage outlived lock_ttl_sec={lock_ttl_sec}); aborting "
                "before commit — another writer owns the table now"
            )
        # Step 3: move the old table aside (commit in flight).
        if not fs.rename(jtarget, jbak):
            raise OSError(f"rename {target_path} -> {jbak} failed")
        crashpoint("after_backup_rename")
        if _between_backup_and_commit is not None:  # test-only interleave
            _between_backup_and_commit()
        # Step 4: THE commit point.  A failed rename may RAISE rather
        # than return false (RawLocalFileSystem's copy fallback throws
        # FileNotFoundException on a vanished source) — both shapes
        # mean "rename didn't happen", so both fall into the re-probe.
        try:
            committed = fs.rename(jtmp, jtarget)
        except Exception:
            committed = False
        if not committed:
            # A lock-free READER arriving between steps 3 and 4 sees a
            # missing target and ROLLS OUR COMPLETE STAGE FORWARD
            # itself (read_table → recover_table).  Re-probe: target
            # present with tmp gone means OUR commit landed — finish
            # cleanup and succeed rather than raising over a merge
            # that actually committed.
            if fs.exists(jtarget) and not fs.exists(jtmp):
                fs.delete(jbak, True)
                return
            fs.rename(jbak, jtarget)  # roll back (same rule recovery applies)
            raise OSError(f"rename {jtmp} -> {target_path} failed")
        crashpoint("after_commit_rename")
        # Step 5: post-commit cleanup.
        fs.delete(jbak, True)
    finally:
        _release_lock(spark, target_path, token)


def merge_upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    key: str,
    part_col: str,
    lock_ttl_sec: float = 600.0,
    lock_wait_sec: float = 60.0,
) -> None:
    """MERGE INTO a parquet target partitioned by ``part_col``:
    partition-pruned read of only the touched partitions, one dynamic
    partition overwrite write.  Writers take the same lease as
    :func:`merge_upsert` — two concurrent dynamic overwrites touching
    the same partition would interleave at the file-commit level.

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
    token = _acquire_lock(spark, target_path, lock_ttl_sec, lock_wait_sec)
    try:
        target = spark.read.parquet(target_path).filter(F.col(part_col).isin(touched))
        merged = _merged_frame(target, source, key)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(part_col)
            .parquet(target_path)
        )
    finally:
        _release_lock(spark, target_path, token)
