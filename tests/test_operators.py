from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

import ingest_sharepoint_file_to_fabric_lakehouse_spark as engine

engine.load_all()


def test_asof_join_literal(spark):
    """As-of semantics on a hand-built case: latest right row ≤ left ts."""
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.joins import asof_join_latest

    left = spark.createDataFrame(
        [(1, 10, datetime(2024, 1, 1, 10, 0)), (2, 10, datetime(2024, 1, 1, 12, 0)),
         (3, 20, datetime(2024, 1, 1, 9, 0))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, datetime(2024, 1, 1, 9, 30), 1.0), (10, datetime(2024, 1, 1, 11, 0), 2.0),
         (20, datetime(2024, 1, 1, 10, 0), 9.0)],
        "k long, ts timestamp, v double",
    )
    out = asof_join_latest(left, right, "k", "ts", "ts", ["v"])
    got = {r.id: r.asof_v for r in out.collect()}
    assert got == {1: 1.0, 2: 2.0, 3: None}


def test_merge_upsert_literal(spark, tmp_path):
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.plans.merge import merge_upsert

    path = str(tmp_path / "target")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, name string, val double"
    ).write.parquet(path)
    source = spark.createDataFrame(
        [(2, "b2", 25.0), (3, "c", 30.0)], "id long, name string, val double"
    )
    merge_upsert(spark, path, source, "id")
    got = {r.id: (r.name, r.val) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0)}


def test_merge_upsert_null_source_column(spark, tmp_path):
    """A NULL in the source must overwrite (MERGE update), not be
    coalesced away."""
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.plans.merge import merge_upsert

    path = str(tmp_path / "target2")
    spark.createDataFrame([(1, "keep")], "id long, name string").write.parquet(path)
    merge_upsert(
        spark, path, spark.createDataFrame([(1, None)], "id long, name string"), "id"
    )
    assert spark.read.parquet(path).collect()[0].name is None


def test_ingest_incremental(spark, tmp_path):
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.sources.ingest import make_source_fixture, run_ingest

    src, bronze = str(tmp_path / "sp"), str(tmp_path / "bronze")
    make_source_fixture(src)
    log1 = run_ingest(spark, src, bronze)
    n1 = log1.count()
    assert n1 == 9  # 3+2+4 files
    assert log1.filter(F.col("status") != "ingested").count() == 0
    # quote sanitization (A-15)
    assert log1.filter(F.col("file_name") == "budget'24.csv").select("target_name").collect()[0][0] == "budget_24.csv"
    # archive names only where configured, timestamp-prefixed (A-16)
    arch = log1.filter(F.col("archive_name").isNotNull())
    assert arch.count() == 7  # finance(3) + shared(4)
    assert arch.filter(~F.col("archive_name").rlike("^[0-9]{12}_")).count() == 0
    # idempotent second run
    log2 = run_ingest(spark, src, bronze)
    assert log2.count() == n1
    # new file appears incrementally
    with open(f"{src}/finance/report_q3.csv", "wb") as f:
        f.write(b"id,amount\n5,500\n")
    log3 = run_ingest(spark, src, bronze)
    assert log3.count() == n1 + 1


def test_session_window_matches_manual_islands(spark, sf_dir):
    """session_window must agree with the lag+cumsum island rebuild."""
    native = engine.QUERIES["stream_session"](spark, sf_dir)
    e = engine.t(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.withColumn(
        "new_session",
        F.when(
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
            >= 300_000_000,
            1,
        )
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    islands = gaps.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    manual = islands.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"), F.count("*").alias("n_events")
    )
    a = {(r.user_id, r.session_start): r.n_events for r in native.collect()}
    b = {(r.user_id, r.session_start): r.n_events for r in manual.collect()}
    assert a == b


def test_simhash_close_docs_collide(spark):
    """Two docs differing by one word land within small Hamming distance."""
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.dedup import shingles  # noqa: F401

    base = "the quick brown fox jumps over the lazy dog " * 5
    docs = spark.createDataFrame(
        [(1, base + "alpha"), (2, base + "beta"), (3, "completely different words entirely here now")],
        "doc_id long, text string",
    )
    toks = docs.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok"))
    h = toks.withColumn("h", F.xxhash64("tok"))
    votes = h.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{b}")
            for b in range(64)
        ]
    )
    sig = votes.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
                for b in range(64)
            ],
            F.lit(0).cast("long"),
        ).alias("s"),
    )
    s = {r.doc_id: r.s for r in sig.collect()}
    mask = (1 << 64) - 1
    ham12 = bin((s[1] ^ s[2]) & mask).count("1")
    ham13 = bin((s[1] ^ s[3]) & mask).count("1")
    assert ham12 < ham13


def test_queries_all_return_rows_smoke(spark, sf_dir):
    """Every registered query runs at sf0.001 and yields a DataFrame
    with ≥0 rows and a stable schema (driver t1-style smoke)."""
    skip_slow = set()
    for key, fn in engine.QUERIES.items():
        if key in skip_slow:
            continue
        df = fn(spark, sf_dir)
        assert df.columns, key
        assert df.count() >= 0, key


def test_connected_components_known_graph(spark):
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.corpus import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (7, 7), (9, 8)], "a long, b long"
    )
    got = {r.node: r.comp for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7, 8: 8, 9: 8}


def test_cc_label_propagation_matches_unionfind(spark):
    """The distributed CC path must agree with driver union-find."""
    import random

    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.corpus import (
        _cc_label_propagation,
        connected_components,
    )

    rnd = random.Random(7)
    edge_list = [(rnd.randint(0, 40), rnd.randint(0, 40)) for _ in range(60)]
    edges = spark.createDataFrame(edge_list, "a long, b long")
    fast = {r.node: r.comp for r in connected_components(edges).collect()}
    dist = {r.node: r.comp for r in _cc_label_propagation(edges, 20).collect()}
    assert fast == dist


def test_merge_upsert_crash_at_every_step_never_torn(spark, tmp_path):
    """Kill the MERGE writer at each commit-protocol step (crash hook:
    the exception skips ALL cleanup, leaving the exact on-disk state a
    ``kill -9`` would) and assert the table reads back as either the
    complete OLD or the complete NEW state — never torn — and that a
    re-run completes the merge."""
    import pytest

    from ingest_sharepoint_file_to_fabric_lakehouse_spark.plans.merge import (
        SimulatedCrash,
        merge_upsert,
        read_table,
        recover_table,
    )

    old = {1: 10.0, 2: 20.0}
    new = {1: 10.0, 2: 25.0, 3: 30.0}
    expect_after_crash = {
        # staged but commit not started → recovery keeps the old table
        "after_stage_write": old,
        # between the renames with a complete (_SUCCESS) staged table
        # → recovery rolls FORWARD
        "after_backup_rename": new,
        # committed, cleanup pending → new table, bak swept
        "after_commit_rename": new,
    }
    for step, expected in expect_after_crash.items():
        path = str(tmp_path / f"crash_{step}")
        spark.createDataFrame(
            [(k, v) for k, v in old.items()], "id long, v double"
        ).write.parquet(path)
        src = spark.createDataFrame([(2, 25.0), (3, 30.0)], "id long, v double")
        with pytest.raises(SimulatedCrash):
            merge_upsert(spark, path, src, "id", _crash=step)
        # read_table runs recovery: complete old or complete new only
        got = {r.id: r.v for r in read_table(spark, path).collect()}
        assert got == expected, (step, got)
        # recovery is idempotent and leaves no debris
        assert recover_table(spark, path) == "committed"
        import os

        assert not [p for p in os.listdir(tmp_path) if "__merge_" in p], step
        # a re-run (the normal retry) always lands the merged state
        merge_upsert(spark, path, src, "id")
        got = {r.id: r.v for r in read_table(spark, path).collect()}
        assert got == new, step


def test_merge_upsert_recovery_rolls_back_incomplete_stage(spark, tmp_path):
    """Crash DURING the staged write (no _SUCCESS witness) with the
    commit in flight: recovery must roll back to the old table, never
    promote a half-written stage."""
    import os
    import shutil

    from ingest_sharepoint_file_to_fabric_lakehouse_spark.plans.merge import read_table, recover_table

    path = str(tmp_path / "rollback")
    spark.createDataFrame([(1, 1.0)], "id long, v double").write.parquet(path)
    # Forge the crash state by hand: old table moved to bak, tmp dir
    # present but WITHOUT _SUCCESS (write never finished).
    os.rename(path, path + "__merge_bak")
    os.makedirs(path + "__merge_tmp")
    with open(path + "__merge_tmp/part-00000.parquet", "wb") as fh:
        fh.write(b"torn")
    assert recover_table(spark, path) == "rolled_back"
    assert {r.id: r.v for r in read_table(spark, path).collect()} == {1: 1.0}
    assert not [p for p in os.listdir(tmp_path) if "__merge_" in p]
    shutil.rmtree(path)


def test_merge_upsert_cleans_staging_dirs(spark, tmp_path):
    """The rename-swap MERGE must leave no __merge_tmp/__merge_bak."""
    import os

    from ingest_sharepoint_file_to_fabric_lakehouse_spark.plans.merge import merge_upsert

    path = str(tmp_path / "target3")
    spark.createDataFrame([(1, 1.0)], "id long, v double").write.parquet(path)
    merge_upsert(spark, path, spark.createDataFrame([(2, 2.0)], "id long, v double"), "id")
    assert sorted(os.listdir(tmp_path)) == ["target3"]
    assert spark.read.parquet(path).count() == 2


def test_merge_partitioned_untouched_partition_byte_identical(spark, tmp_path):
    """Partition-scoped MERGE: an untouched partition's data files are
    byte-identical afterwards (never read, never rewritten)."""
    import pathlib

    from ingest_sharepoint_file_to_fabric_lakehouse_spark.plans.merge import (
        merge_upsert_partitioned,
    )

    path = str(tmp_path / "ptab")
    spark.createDataFrame(
        [(1, 1, 10.0), (2, 1, 20.0), (3, 2, 30.0), (4, 2, 40.0)],
        "id long, p int, v double",
    ).write.partitionBy("p").parquet(path)

    def part_files(p):
        return {
            f.name: f.read_bytes()
            for f in pathlib.Path(f"{path}/p={p}").glob("*.parquet")
        }

    before = part_files(1)
    source = spark.createDataFrame([(3, 2, 99.0), (5, 2, 50.0)], "id long, p int, v double")
    merge_upsert_partitioned(spark, path, source, "id", "p")
    assert part_files(1) == before  # untouched partition: same files, same bytes
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 99.0, 4: 40.0, 5: 50.0}


def test_cosine_block_kernel_chunked_matches_unchunked():
    """Skew guard: chunked matmul emits exactly the unchunked pair set
    on a hot-bucket fixture (300 rows ≫ block_rows=16)."""
    import numpy as np
    import pandas as pd

    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.dedup import (
        cosine_block_kernel,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(30, 8))
    # 300 vectors clustered around 30 centers → plenty of near-dups
    vecs = [base[i % 30] + rng.normal(scale=0.05, size=8) for i in range(300)]
    pdf = pd.DataFrame({"vec_id": range(300), "embedding": [v for v in vecs]})

    def canon(out):
        return sorted(map(tuple, out[["vec_a", "vec_b", "cosine"]].to_numpy().tolist()))

    chunked = canon(cosine_block_kernel(0.8, block_rows=16)(pdf))
    full = canon(cosine_block_kernel(0.8, block_rows=10**9)(pdf))
    assert len(full) > 100
    assert chunked == full


def test_agg_collect_array_variant(spark, sf_dir):
    """The array-typed collect stays covered here (the queries() entry
    emits joined strings for hashability)."""
    n = engine.t(spark, sf_dir, "nation")
    arr = (
        n.groupBy("n_regionkey")
        .agg(F.sort_array(F.collect_list("n_name")).alias("nations"))
        .collect()
    )
    strs = {r.n_regionkey: r.nations for r in engine.QUERIES["agg_collect"](spark, sf_dir).collect()}
    for r in arr:
        assert r.nations == sorted(r.nations)
        assert ",".join(r.nations) == strs[r.n_regionkey]


def test_ingest_reingests_modified_file(spark, tmp_path):
    """A file whose mtime changes is re-ingested (mtime in the
    anti-join key); unchanged files are not."""
    import os

    from ingest_sharepoint_file_to_fabric_lakehouse_spark.sources.ingest import (
        make_source_fixture,
        run_ingest,
    )

    src, bronze = str(tmp_path / "sp"), str(tmp_path / "bronze")
    make_source_fixture(src)
    n1 = run_ingest(spark, src, bronze).count()
    changed = os.path.join(src, "shared", "notes.txt")
    with open(changed, "ab") as f:
        f.write(b" (amended)")
    os.utime(changed, (4102444800, 4102444800))
    log = run_ingest(spark, src, bronze)
    assert log.count() == n1 + 1  # exactly the modified file re-ingested
    shas = (
        log.filter((F.col("folder_name") == "shared") & (F.col("file_name") == "notes.txt"))
        .select("content_sha256")
        .collect()
    )
    assert len(shas) == 2 and shas[0][0] != shas[1][0]


def test_minhash_mapside_signature_matches_explode_form(spark, sf_dir):
    """The map-side array_min(transform(...)) signature must equal the
    explode → groupBy → min(xxhash64(shingle, k)) formulation — guards
    the binary-lambda pitfall where a default-arg lambda binds the seed
    to the element index."""
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.dedup import shingles

    d = engine.t(spark, sf_dir, "documents").limit(50)
    sh = d.select("doc_id", shingles(F.col("text"), 3).alias("sh"))

    def mh(k):
        return lambda s: F.xxhash64(s, F.lit(k))

    mapside = sh.select(
        "doc_id", F.array(*[F.array_min(F.transform("sh", mh(k))) for k in range(4)]).alias("sig")
    )
    exploded = (
        d.select("doc_id", F.explode(shingles(F.col("text"), 3)).alias("shingle"))
        .groupBy("doc_id")
        .agg(F.array(*[F.min(F.xxhash64("shingle", F.lit(k))) for k in range(4)]).alias("sig"))
    )
    a = {r.doc_id: r.sig for r in mapside.collect()}
    b = {r.doc_id: r.sig for r in exploded.collect()}
    assert a == b
    # seeds differ → signatures differ (the index-bound bug made them equal)
    assert any(len(set(sig)) > 1 for sig in a.values())


def test_pack_sequences_distributed_prefix_equals_global_window(spark, sf_dir):
    """The two-phase (per-partition cumsum + broadcast offsets) prefix
    sum must be bit-identical to the naive single-task global window."""
    from pyspark.sql import Window

    packed = engine.QUERIES["text_pack_sequences"](spark, sf_dir)
    d = engine.t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = d.withColumn(
        "start_tok", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    )
    got = {r.doc_id: r.start_tok for r in packed.collect()}
    want = {r.doc_id: r.start_tok for r in naive.collect()}
    assert got == want


def test_decontaminate_flags_planted_overlap(spark, sf_dir):
    """A training doc sharing a 4-gram with an eval doc must be flagged
    with the exact shared-shingle count."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "alpha beta gamma delta epsilon",      # eval (id % 50 == 0)
                "alpha beta gamma delta unrelated",    # shares 1 4-gram
                "totally different words here now",    # clean
            ],
        }
    )
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.dedup import shingles

    ev = (
        sdf.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode(shingles(F.col("text"), 4)).alias("shingle"))
        .distinct()
    )
    tr = (
        sdf.filter(F.col("doc_id") % 50 != 0)
        .select("doc_id", F.explode(shingles(F.col("text"), 4)).alias("shingle"))
        .distinct()
    )
    out = {
        r.doc_id: r.n_shared_ngrams
        for r in tr.join(F.broadcast(ev), "shingle").groupBy("doc_id").agg(
            F.count("*").alias("n_shared_ngrams")
        ).collect()
    }
    # doc 1 shares: 'alpha beta gamma delta' plus the short tail
    # shingles 'delta epsilon'-side differ, and trailing <4-token
    # shingles ('gamma delta unrelated' vs 'gamma delta epsilon') don't
    # match — exactly one shared shingle.
    assert out == {1: 1}


def test_jaccard_prefix_keeps_exactly_at_threshold_pairs(spark, tmp_path):
    """PPJoin length/position filters must be integer-exact: float
    bounds (0.8*35 -> 28.000000000000004, ceil(4/9*63) -> 29) drop
    pairs whose Jaccard is EXACTLY tau=0.8.  Two such shapes:
    |a|=28, |b|=35, overlap=28 (kills float position filter) and
    |a|=4, |b|=5, overlap=4 (kills float length filter)."""
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.dedup import dedup_jaccard_prefix

    toks = [f"t{i:02d}" for i in range(36)]
    utoks = [f"u{i}" for i in range(6)]
    docs = [
        (1, " ".join(toks[:29])),  # 28 shingles, subset of doc 2
        (2, " ".join(toks)),       # 35 shingles
        (3, " ".join(utoks[:5])),  # 4 shingles, subset of doc 4
        (4, " ".join(utoks)),      # 5 shingles
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_jaccard_prefix(spark, str(tmp_path)).collect()
    }
    assert got == {(1, 2): 0.8, (3, 4): 0.8}


def test_jaccard_prefix_large_doc_fallback(spark, tmp_path):
    """Docs whose shingle count exceeds large_doc_cap must route
    through the join-count verification (no collect_list of the
    pathological doc) and still return the identical answer, including
    an exactly-at-threshold pair whose larger side is above the cap
    and a small pair that stays on the array path."""
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.dedup import dedup_jaccard_prefix

    toks = [f"t{i:02d}" for i in range(41)]
    utoks = [f"u{i}" for i in range(6)]
    vtoks = [f"v{i:02d}" for i in range(21)]
    docs = [
        (1, " ".join(toks)),        # 40 shingles (> cap)
        (2, " ".join(toks[:37])),   # 36 shingles (> cap), subset: J = 36/40 = 0.9
        (3, " ".join(utoks[:5])),   # 4 shingles, subset of doc 4
        (4, " ".join(utoks)),       # 5 shingles: J = 4/5 = 0.8 (array path)
        (5, " ".join(vtoks[:17])),  # 16 shingles (<= cap), subset of doc 6
        (6, " ".join(vtoks)),       # 20 shingles (> cap): J = 16/20 = 0.8 mixed pair
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    expected = {(1, 2): 0.9, (3, 4): 0.8, (5, 6): 0.8}
    split = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_jaccard_prefix(spark, str(tmp_path), large_doc_cap=16).collect()
    }
    assert split == expected
    # and the default (no split) path agrees
    plain = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_jaccard_prefix(spark, str(tmp_path)).collect()
    }
    assert plain == expected


def test_jaccard_prefix_hot_shingle_triggers_df_join_fallback(spark, tmp_path):
    """A shingle hotter than skew_df_threshold must flip the document-
    frequency attachment from the shingle-partitioned window (whole hot
    shingle on one task) to the broadcast join-back (no shuffle of the
    occurrence relation on shingle at all), without changing the
    answer."""
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.dedup import (
        _attach_shingle_df,
        dedup_jaccard_prefix,
    )
    from pyspark.sql import functions as F

    # 10 docs all containing the 'hot spot' shingle (df=10) + one
    # exactly-at-threshold pair that must survive both paths
    utoks = [f"u{i}" for i in range(6)]
    docs = [
        (i, "hot spot " + " ".join(f"x{i}k{j}" for j in range(4)))
        for i in range(1, 11)
    ]
    docs += [(21, " ".join(utoks[:5])), (22, " ".join(utoks))]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )

    # unit level: the helper switches paths at the threshold, and the
    # fallback plan really is window-free / broadcast-joined
    sh = spark.createDataFrame(
        [(d, s) for d in range(10) for s in ("hot spot", f"only{d}")],
        "doc_id long, shingle string",
    )
    dfrel = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    windowed, fb = _attach_shingle_df(sh, dfrel, skew_df_threshold=10)
    assert not fb
    assert "windowspecdefinition(shingle" in windowed._jdf.queryExecution().optimizedPlan().toString()
    joined, fb = _attach_shingle_df(sh, dfrel, skew_df_threshold=9)
    assert fb
    jplan = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(shingle" not in jplan
    assert windowed.subtract(joined).count() == 0 and joined.subtract(windowed).count() == 0

    # end to end: fallback-forced run returns the identical pairs
    expected = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_jaccard_prefix(spark, str(tmp_path)).collect()
    }
    assert (21, 22) in expected and expected[(21, 22)] == 0.8
    forced = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_jaccard_prefix(
            spark, str(tmp_path), skew_df_threshold=5
        ).collect()
    }
    assert forced == expected


def test_repetition_filter_flags_crafted_repetition(spark, tmp_path):
    """A doc that is one 2-gram over and over must be flagged; a doc of
    all-distinct tokens must keep."""
    docs = [
        (1, " ".join(["spam"] * 20)),          # every 2-gram identical
        (2, " ".join(f"w{i}" for i in range(20))),  # all 2-grams distinct
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.functions.text import text_repetition_filter

    rows = {r.doc_id: r for r in text_repetition_filter(spark, str(tmp_path)).collect()}
    assert rows[1].top_gram_frac == 1.0 and rows[1].keep is False
    assert rows[2].top_gram_frac == round(1 / 19, 6) and rows[2].keep is True
    assert rows[2].dup_gram_frac == 0.0


def test_dedup_pipeline_funnel_is_consistent(spark, sf_dir):
    """Per-source funnel must partition the doc count, and the kept set
    must contain at least one doc per connected near-dup cluster."""
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.corpus import corpus_dedup_pipeline

    rows = corpus_dedup_pipeline(spark, sf_dir).collect()
    assert rows, "empty funnel"
    for r in rows:
        assert r.n_docs == r.n_exact_dropped + r.n_near_dropped + r.n_kept
        assert r.n_kept >= 1


def test_approx_quantile_bounds_hold(spark, sf_dir):
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.aggregates import agg_approx_quantile

    rows = agg_approx_quantile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.approx_within_bounds is True
        assert r.med_qty <= r.p95_qty


def test_datasource_sharepoint_partitions_and_filters(spark, sf_dir):
    """The custom DataSource must plan one partition per folder, page
    through the finance listing, and drop the assets subfolder."""
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.sources.scans import scan_datasource_sharepoint

    rows = scan_datasource_sharepoint(spark, sf_dir).collect()
    assert [r.file_name for r in rows] == [
        "logo.png", "budget.xlsx", "report_q1.csv", "notes.txt",
    ]
    by_folder = {r.folder_name for r in rows}
    assert by_folder == {"finance", "assets", "shared"}
    # pagination delivered BOTH finance pages
    assert sum(r.folder_name == "finance" for r in rows) == 2


def test_additive_state_merge_replay_is_fenced(spark, tmp_path):
    """Re-delivering an epoch to the additive merge must be a no-op
    (the marker fence), while a NEW epoch must add - the exactly-once
    property the streaming key rests on."""
    from pyspark.sql import functions as F

    from ingest_sharepoint_file_to_fabric_lakehouse_spark.streaming.streams import (
        additive_state_merge,
    )

    state, commits = str(tmp_path / "state"), str(tmp_path / "commits")
    import os

    os.makedirs(commits, exist_ok=True)

    def partial(rows):
        return spark.createDataFrame(
            rows, "event_type string, n_events long, id_checksum long"
        ).groupBy("event_type").agg(
            F.sum("n_events").alias("n_events"),
            F.sum("id_checksum").alias("id_checksum"),
        )

    def read_state():
        return {
            r.event_type: (r.n_events, r.id_checksum)
            for r in spark.read.parquet(state).collect()
        }

    additive_state_merge(partial([("a", 2, 10)]), state, commits, 0)
    assert read_state() == {"a": (2, 10)}
    # replay epoch 0: fenced, no double-count
    additive_state_merge(partial([("a", 2, 10)]), state, commits, 0)
    assert read_state() == {"a": (2, 10)}
    # new epoch adds
    additive_state_merge(partial([("a", 1, 5), ("b", 3, 7)]), state, commits, 1)
    assert read_state() == {"a": (3, 15), "b": (3, 7)}


def test_gaps_islands_literal(spark):
    """Streak detection on a hand-built calendar: user 1 has runs
    [1-2 Jan] and [5-7 Jan] (longest 3 from the 5th); user 2 has one
    single-day run."""
    from datetime import datetime as dt

    ev = spark.createDataFrame(
        [
            (1, dt(2024, 1, 1, 9)), (1, dt(2024, 1, 1, 17)),  # dup same day
            (1, dt(2024, 1, 2, 9)),
            (1, dt(2024, 1, 5, 9)), (1, dt(2024, 1, 6, 9)), (1, dt(2024, 1, 7, 9)),
            (2, dt(2024, 1, 3, 9)),
        ],
        "user_id long, ts timestamp",
    )
    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    from pyspark.sql import Window

    rn = days.withColumn(
        "rn", F.row_number().over(Window.partitionBy("user_id").orderBy("day"))
    )
    streaks = (
        rn.withColumn("grp", F.date_sub(F.col("day"), F.col("rn")))
        .groupBy("user_id", "grp")
        .agg(F.count("*").alias("len"), F.min("day").alias("start"))
    )
    got = {
        (r.user_id, str(r.start)): r.len for r in streaks.collect()
    }
    assert got == {
        (1, "2024-01-01"): 2,
        (1, "2024-01-05"): 3,
        (2, "2024-01-03"): 1,
    }


def test_cms_estimate_dominates_exact(spark, sf_dir):
    """Count-min property: every estimate >= the exact count (sketch
    never undercounts), and equals it when the key's d=4 cells are
    collision-free."""
    rows = engine.QUERIES["agg_cms_portable"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_cms >= r.n_exact, (r.key, r.n_cms, r.n_exact)
        assert r.overcount == r.n_cms - r.n_exact
    # sanity: the sketch is not degenerate — with ~|keys|/w ≈ 5 keys
    # per cell the expected single-row overcount is ~N/w; the min over
    # d=4 independent rows must land well under that, so the MEAN
    # overcount stays below N/w (and far below N).
    n_total = sum(r.n_exact for r in rows)
    mean_over = sum(r.overcount for r in rows) / len(rows)
    assert mean_over <= n_total / 32, (mean_over, n_total)


def test_markov_transitions_rows_are_a_distribution(spark, sf_dir):
    """Transition rows partition each prev_type's outgoing mass:
    sum(n) per prev == n_from, and prob_ppm is the exact integer
    floor of n/n_from scaled to 1e6 (never exceeds 1e6 in total
    beyond rounding loss < n_types)."""
    rows = engine.QUERIES["events_markov_transitions"](spark, sf_dir).collect()
    assert rows
    by_prev: dict = {}
    for r in rows:
        by_prev.setdefault(r.prev_type, []).append(r)
        assert r.prob_ppm == (r.n * 1_000_000) // r.n_from
    for prev, grp in by_prev.items():
        n_from = grp[0].n_from
        assert all(g.n_from == n_from for g in grp)
        assert sum(g.n for g in grp) == n_from
        total_ppm = sum(g.prob_ppm for g in grp)
        assert 1_000_000 - len(grp) < total_ppm <= 1_000_000


def test_cooccurrence_lift_literal(spark):
    """Hand-built baskets: items 1,2 co-occur in 2 of 4 baskets
    (n_1=3, n_2=2) -> lift = (2*4)/(3*2) = 4/3 -> 1333333 ppm."""
    li = spark.createDataFrame(
        [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3), (13, 3)],
        "l_orderkey long, l_partkey long",
    )
    basket = li.select(
        F.col("l_orderkey").alias("bid"), F.col("l_partkey").alias("item")
    ).distinct()
    a, b = basket.alias("a"), basket.alias("b")
    pair = (
        a.join(b, (F.col("a.bid") == F.col("b.bid")) & (F.col("a.item") < F.col("b.item")))
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= 2)
    )
    got = {(r.item_a, r.item_b): r.n_pair for r in pair.collect()}
    assert got == {(1, 2): 2}
    # lift in exact ppm as the operator computes it
    assert (2 * 4 * 1_000_000) // (3 * 2) == 1333333


def test_bm25_ranks_term_dense_doc_first(spark, tmp_path):
    """A doc saturated with the query terms must outrank a doc with a
    single occurrence diluted by length, and a doc with none scores
    no row at all."""
    import shutil

    docs = spark.createDataFrame(
        [
            (1, "vector stream window vector stream window", "en", "s", 42),
            (2, "vector " + "pad " * 40, "en", "s", 200),
            (3, "pad pad pad pad", "en", "s", 15),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    for name in ("documents",):
        docs.write.mode("overwrite").parquet(f"{sf}/{name}.parquet")
    rows = engine.QUERIES["search_bm25"](spark, sf).collect()
    ranked = [r.doc_id for r in rows]
    assert ranked[0] == 1
    assert 3 not in ranked
    assert rows[0].n_terms_hit == 3


def test_dq_expectations_clean_table_passes(spark, sf_dir):
    """The TPC-H fixture satisfies every expectation; violation
    counts are all zero and n_rows matches the table."""
    rows = engine.QUERIES["dq_expectations"](spark, sf_dir).collect()
    assert len(rows) == 6
    n = engine.t(spark, sf_dir, "orders").count()
    for r in rows:
        assert r.n_violations == 0, r.rule
        assert r.passed
        assert r.n_rows == n


def test_dq_expectations_detects_planted_violations(spark, tmp_path):
    """Plant one violation per rule in a synthetic orders table and
    check each is counted: a dup key, a zero price, a bad status, an
    out-of-range date, and an orphan custkey."""
    from datetime import datetime as dt

    orders = spark.createDataFrame(
        [
            (1, 10, "O", 100.0, dt(1995, 1, 1), "1-URGENT"),
            (1, 10, "O", 100.0, dt(1995, 1, 2), "1-URGENT"),   # dup key
            (2, 10, "O", 0.0, dt(1995, 1, 3), "1-URGENT"),     # zero price
            (3, 10, "X", 100.0, dt(1995, 1, 4), "1-URGENT"),   # bad status
            (4, 10, "F", 100.0, dt(1885, 1, 5), "1-URGENT"),   # bad date
            (5, 99, "F", 100.0, dt(1995, 1, 6), "1-URGENT"),   # orphan cust
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    cust = spark.createDataFrame(
        [(10, "c", 1, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    sf = str(tmp_path / "sf")
    orders.write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    cust.write.mode("overwrite").parquet(f"{sf}/customer.parquet")
    got = {
        r.rule: r.n_violations
        for r in engine.QUERIES["dq_expectations"](spark, sf).collect()
    }
    assert got == {
        "orderkey_not_null": 0,
        "totalprice_positive": 1,
        "orderstatus_in_set": 1,
        "orderdate_in_range": 1,
        "orderkey_unique": 1,
        "custkey_references_customer": 1,
    }


def test_cumulative_distinct_literal(spark):
    """Running distinct over types A,B,A,C is 1,2,2,3."""
    from datetime import datetime as dt

    ev = spark.createDataFrame(
        [
            (1, dt(2024, 1, 1, 9, 0), 1, "A"),
            (1, dt(2024, 1, 1, 9, 1), 2, "B"),
            (1, dt(2024, 1, 1, 9, 2), 3, "A"),
            (1, dt(2024, 1, 1, 9, 3), 4, "C"),
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    from pyspark.sql import Window

    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id")
    got = [
        r.d
        for r in ev.select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("f"),
        )
        .select("event_id", F.sum("f").over(w_run).alias("d"))
        .orderBy("event_id")
        .collect()
    ]
    assert got == [1, 2, 2, 3]


def test_ohlc_bar_edges_literal(spark, tmp_path):
    """Within one hourly bucket: open = value at earliest (ts, id),
    close = value at latest, high/low = extremes."""
    from datetime import datetime as dt

    ev = spark.createDataFrame(
        [
            (2, dt(2024, 1, 1, 9, 5), 7, "m", 5.0, "{}"),
            (1, dt(2024, 1, 1, 9, 0), 7, "m", 3.0, "{}"),   # open (earliest ts)
            (3, dt(2024, 1, 1, 9, 5), 7, "m", 9.0, "{}"),   # close (same ts as id 2, higher id)
            (4, dt(2024, 1, 1, 9, 2), 7, "m", 1.0, "{}"),   # low
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sf = str(tmp_path / "sf")
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    rows = engine.QUERIES["events_resample_ohlc"](spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.open, r.high, r.low, r.close, r.n) == (3.0, 9.0, 1.0, 9.0, 4)
    assert r.volume == 18.0


def test_ewma_fold_literal(spark, tmp_path):
    """Values 2, 8, 4 in time order fold to 0.5*4 + 0.5*(0.5*8 + 0.5*2) = 4.5."""
    from datetime import datetime as dt

    ev = spark.createDataFrame(
        [
            (1, dt(2024, 1, 1, 9, 0), 5, "m", 2.0, "{}"),
            (2, dt(2024, 1, 1, 9, 1), 5, "m", 8.0, "{}"),
            (3, dt(2024, 1, 1, 9, 2), 5, "m", 4.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sf = str(tmp_path / "sf")
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    rows = engine.QUERIES["events_ewma"](spark, sf).collect()
    assert len(rows) == 1
    assert rows[0].ewma == 4.5
    assert rows[0].n_events == 3


def test_hybrid_rrf_fuses_both_arms(spark, sf_dir):
    """RRF scores decompose exactly into the two arms' integer
    contributions, docs ranked by both arms beat equal-rank docs
    found by one, and the output is the global top-10."""
    rows = engine.QUERIES["search_hybrid_rrf"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        expect = 0
        if r.rnk_lex is not None:
            expect += 1_000_000_000 // (60 + r.rnk_lex)
        if r.rnk_vec is not None:
            expect += 1_000_000_000 // (60 + r.rnk_vec)
        assert r.rrf_ppb == expect
        assert r.rnk_lex is not None or r.rnk_vec is not None
    scores = [r.rrf_ppb for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_link_prediction_excludes_existing_edges(spark, sf_dir):
    """Predicted links are non-adjacent in the strong-link graph,
    scores decompose as exact integer ppm of n_common/n_union, and
    every pair shares at least one neighbor."""
    rows = engine.QUERIES["graph_link_prediction"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.a < r.b
        assert r.n_common >= 1
        assert r.n_union >= r.n_common
        assert r.jaccard_ppm == (r.n_common * 1_000_000) // r.n_union


def test_ab_ttest_matches_scipy_free_reference(spark, tmp_path):
    """Literal two-arm fixture: Welch t computed by hand.
    click = [2, 4] (mean 3, var 2), view = [1, 1, 1] (mean 1, var 0)
    -> t = (3-1)/sqrt(2/2 + 0/3) = 2.0."""
    from datetime import datetime as dt

    rows = [
        (1, dt(2024, 1, 1), 1, "click", 2.0, "{}"),
        (2, dt(2024, 1, 1), 1, "click", 4.0, "{}"),
        (3, dt(2024, 1, 1), 2, "view", 1.0, "{}"),
        (4, dt(2024, 1, 1), 2, "view", 1.0, "{}"),
        (5, dt(2024, 1, 1), 2, "view", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sf = str(tmp_path / "sf")
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    r = engine.QUERIES["events_ab_ttest"](spark, sf).collect()[0]
    assert (r.n_a, r.n_b) == (2, 3)
    assert r.mean_a == 3.0 and r.mean_b == 1.0
    assert r.t_stat == 2.0


def test_rfm_segments_partition_customers(spark, sf_dir):
    """The 8 RFM segments partition the customer base exactly and
    monetary totals add up to the full order book."""
    rows = engine.QUERIES["orders_rfm_segments"](spark, sf_dir).collect()
    segs = {r.segment for r in rows}
    assert segs <= {f"R{r}F{f}M{m}" for r in (0, 1) for f in (0, 1) for m in (0, 1)}
    o = engine.t(spark, sf_dir, "orders")
    assert sum(r.n_customers for r in rows) == o.select("o_custkey").distinct().count()
    total = sum(r.total_monetary for r in rows)
    expect = o.agg(F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)).collect()[0][0]
    assert abs(total - float(expect)) < 0.5


def test_ohlc_bars_merge_to_coarser_grain(spark, sf_dir):
    """Bars are mergeable state: hourly bars re-aggregated to daily
    (open = min_by over bucket, close = max_by, extremes/volume fold)
    must equal OHLC computed directly at daily grain — the continuous-
    aggregate invariant that makes hierarchical rollups free."""
    ev = engine.t(spark, sf_dir, "events")
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.core import dec, money

    def ohlc(grain):
        b = ev.select(
            "event_type",
            F.date_trunc(grain, "ts").cast("timestamp_ntz").alias("bucket"),
            (
                F.unix_micros(F.col("ts").cast("timestamp")).cast("decimal(38,0)")
                * F.lit(1_000_000_000)
                + F.col("event_id")
            ).alias("ord"),
            dec("value").alias("v"),
        )
        return b.groupBy("event_type", "bucket").agg(
            F.min_by("v", F.col("ord")).alias("open"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.max_by("v", F.col("ord")).alias("close"),
            F.count("*").alias("n"),
            F.sum("v").alias("volume"),
        )

    hourly = ohlc("hour")
    merged = (
        hourly.withColumn("day", F.date_trunc("day", "bucket").cast("timestamp_ntz"))
        .groupBy("event_type", "day")
        .agg(
            F.min_by("open", F.col("bucket")).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", F.col("bucket")).alias("close"),
            F.sum("n").alias("n"),
            F.sum("volume").alias("volume"),
        )
    )
    direct = ohlc("day").withColumnRenamed("bucket", "day")
    cols = ["event_type", "day", "open", "high", "low", "close", "n", "volume"]
    a = {tuple(r[c] for c in cols[:2]): tuple(r[c] for c in cols[2:]) for r in merged.collect()}
    b = {tuple(r[c] for c in cols[:2]): tuple(r[c] for c in cols[2:]) for r in direct.collect()}
    assert a == b


def test_trend_ols_literal_slope(spark, tmp_path):
    """Daily counts 1,2,3 on days 0,1,2 -> slope exactly 1 (1e6 ppm)."""
    from datetime import datetime as dt

    rows = []
    eid = 0
    for day, n in [(1, 1), (2, 2), (3, 3)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, dt(1995, 1, day, 9), 1, "m", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sf = str(tmp_path / "sf")
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    r = engine.QUERIES["events_trend_ols"](spark, sf).collect()[0]
    assert r.slope_ppm == 1_000_000


def test_corr_moments_matches_numpy(spark, sf_dir):
    """Closed-form correlation equals numpy's corrcoef to 5 dp."""
    import numpy as np

    li = engine.t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    got = {
        r.l_returnflag: r.corr_qty_price
        for r in engine.QUERIES["agg_corr_moments"](spark, sf_dir).collect()
    }
    pdf = li.toPandas()
    for flag, sub in pdf.groupby("l_returnflag"):
        expect = np.corrcoef(sub.l_quantity, sub.l_extendedprice)[0, 1]
        assert abs(got[flag] - expect) < 1e-5, (flag, got[flag], expect)


def test_attribution_lasttouch_literal(spark, tmp_path):
    """Purchase at day 8 after a view at day 1 is within the 7-day
    lookback (credited), a purchase 8 days after the last touch is
    unattributed, and a same-timestamp touch is eligible."""
    from datetime import datetime as dt

    rows = [
        (1, dt(2024, 1, 1, 9), 1, "view", 0.0, "{}"),
        (2, dt(2024, 1, 8, 9), 1, "purchase", 10.0, "{}"),   # within 7d of view
        (3, dt(2024, 2, 1, 9), 2, "click", 0.0, "{}"),
        (4, dt(2024, 2, 12, 9), 2, "purchase", 20.0, "{}"),  # 11d later: unattributed
        (5, dt(2024, 3, 1, 9), 3, "view", 0.0, "{}"),
        (6, dt(2024, 3, 1, 9), 3, "purchase", 30.0, "{}"),   # same ts: eligible
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sf = str(tmp_path / "sf")
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    got = {
        r.channel: (r.n_purchases, r.attributed_revenue)
        for r in engine.QUERIES["events_attribution_lasttouch"](spark, sf).collect()
    }
    assert got == {"view": (2, 40.0), "unattributed": (1, 20.0)}


def test_bfs_distances_are_shortest_paths(spark, sf_dir):
    """BFS invariants: the root is at distance 0; every node at
    distance d>0 has an in-edge from some node at distance d-1 and no
    in-edge from any node at distance < d-1 (else it would have been
    found earlier)."""
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.graph import _trade_edges_cached

    rows = engine.QUERIES["graph_bfs_reachability"](spark, sf_dir).collect()
    dist = {r.node: r.dist for r in rows}
    assert min(dist.values()) == 0
    dedges = _trade_edges_cached(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    thr = dedges.agg(F.expr("(3 * sum(w)) div (2 * count(*))").alias("t")).collect()[0].t
    strong = {(r.src, r.dst) for r in dedges.filter(F.col("w") >= thr).collect()}
    preds = {}
    for s, d in strong:
        preds.setdefault(d, set()).add(s)
    for node, d in dist.items():
        if d == 0:
            continue
        pd_dists = [dist[p] for p in preds.get(node, set()) if p in dist]
        assert pd_dists and min(pd_dists) == d - 1, (node, d, pd_dists)


def test_heavy_hitters_sketch_filter_is_lossless(spark, sf_dir):
    """The sketch-guided plan equals the naive exact GROUP BY +
    HAVING — the CMS row filter admits a superset (never drops a true
    heavy key), and the exact HAVING removes the false positives."""
    got = {
        (r.l_partkey, r.n_lines)
        for r in engine.QUERIES["agg_heavy_hitters_exact"](spark, sf_dir).collect()
    }
    li = engine.t(spark, sf_dir, "lineitem")
    c = li.groupBy("l_partkey").agg(F.count("*").alias("n"))
    s = c.agg(F.sum("n").alias("tot"), F.count("*").alias("k")).collect()[0]
    thr = (3 * s.tot) // (2 * s.k)
    naive = {
        (r.l_partkey, r.n) for r in c.filter(F.col("n") >= thr).collect()
    }
    assert got == naive and got


def test_grid_nearest_equals_naive_theta_join(spark, sf_dir):
    """The 3x3 grid plan is lossless for radius-bounded nearest: it
    must equal the naive all-pairs distance join it avoids."""
    got = {
        (r.c_custkey, r.nearest_suppkey, r.dist2)
        for r in engine.QUERIES["geo_grid_nearest"](spark, sf_dir).collect()
    }
    cust = (
        engine.t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 500)
        .select(
            "c_custkey",
            ((F.col("c_custkey") * 37) % 1000).alias("x"),
            ((F.col("c_custkey") * 73) % 1000).alias("y"),
        )
    )
    supp = engine.t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 41) % 1000).alias("sx"),
        ((F.col("s_suppkey") * 79) % 1000).alias("sy"),
    )
    d2 = (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx")) + (
        F.col("y") - F.col("sy")
    ) * (F.col("y") - F.col("sy"))
    naive = (
        cust.crossJoin(supp)
        .withColumn("d2", d2)
        .filter(F.col("d2") <= 150 * 150)
        .groupBy("c_custkey")
        .agg(
            F.min_by("s_suppkey", F.col("d2") * F.lit(100_000) + F.col("s_suppkey")).alias("s"),
            F.min("d2").cast("long").alias("dd"),
        )
    )
    expect = {(r.c_custkey, r.s, r.dd) for r in naive.collect()}
    assert got == expect and got


def test_interval_overlap_banded_equals_theta(spark, sf_dir):
    """The banded interval-overlap plan must equal the naive theta
    join (bands with dedup are lossless: overlapping intervals always
    share at least one band when bands >= interval length... verified
    by construction here via direct comparison)."""
    got = {
        (r.user_a, r.user_b, r.n_overlaps, r.total_overlap_s)
        for r in engine.QUERIES["join_interval_overlap"](spark, sf_dir).collect()
    }
    from pyspark.sql import Window as W

    ev = engine.t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.withColumn(
            "new_s",
            F.when(
                F.lag("ts").over(w).isNull()
                | (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
                    > 30 * 60 * 1_000_000
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)))
        .groupBy("user_id", "sid")
        .agg(
            F.unix_seconds(F.min("ts").cast("timestamp")).alias("s"),
            F.unix_seconds(F.max("ts").cast("timestamp")).alias("e"),
        )
    )
    a, b = sess.alias("a"), sess.alias("b")
    naive = (
        a.join(
            b,
            (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        )
        .select(
            F.col("a.user_id").alias("ua"),
            F.col("b.user_id").alias("ub"),
            (F.least(F.col("a.e"), F.col("b.e")) - F.greatest(F.col("a.s"), F.col("b.s"))).alias("ov"),
        )
        .groupBy("ua", "ub")
        .agg(F.count("*").alias("n"), F.sum("ov").cast("long").alias("tov"))
    )
    expect = {(r.ua, r.ub, r.n, r.tov) for r in naive.collect()}
    assert got == expect and got


def test_null_safe_join_matches_null_bucket(spark, sf_dir):
    """The NULL key group must appear and its pair count must equal
    |A_null| x |B_null| (nulls match each other, not drop)."""
    rows = {r.k: r.n_pairs for r in engine.QUERIES["join_null_safe_eq"](spark, sf_dir).collect()}
    a_null = (
        engine.t(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") < 300) & (F.col("c_nationkey") % 7 == 3))
        .count()
    )
    b_null = (
        engine.t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") % 7 == 3).count()
    )
    assert rows.get("NULL") == a_null * b_null
    assert a_null * b_null > 0


def test_zipf_fit_slope_is_negative_and_exact_on_literal(spark, tmp_path):
    """A frequency table 8,4,2,1 over ranks 1..4 is exactly
    log-linear with slope -3/2 / log-spacing... verified numerically:
    ln(freq) = ln(8) - slope*ln(rank) fit must recover the least-
    squares slope of that series."""
    import numpy as np

    docs = spark.createDataFrame(
        [(1, " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"]), "en", "s", 10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    docs.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    r = engine.QUERIES["vocab_zipf_fit"](spark, sf).collect()[0]
    x = np.log(np.arange(1, 5))
    y = np.log(np.array([8.0, 4.0, 2.0, 1.0]))
    slope = ((len(x) * (x * y).sum() - x.sum() * y.sum())
             / (len(x) * (x * x).sum() - x.sum() ** 2))
    assert r.vocab_size == 4
    assert abs(r.zipf_slope - round(slope, 6)) < 2e-6
    assert r.zipf_slope < 0


def test_open_backlog_sweep_equals_direct_count(spark, sf_dir):
    """The sweep-line backlog must equal the direct per-day interval
    count on sampled days (and the final day must close to 0 open)."""
    rows = engine.QUERIES["orders_open_backlog"](spark, sf_dir).collect()
    assert rows[-1].n_open == 0
    iv = engine.t(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("s"),
        F.expr("date_add(cast(o_orderdate as date), cast(7 + (o_orderkey % 21) as int))").alias("e"),
    )
    for r in rows[:: max(1, len(rows) // 5)]:
        direct = iv.filter((F.col("s") <= F.lit(r.day)) & (F.col("e") > F.lit(r.day))).count()
        assert direct == r.n_open, (r.day, direct, r.n_open)


def test_batch_sessionization_matches_native_session_window(spark, sf_dir):
    """Cross-surface consistency: the lag-gap + running-sum
    sessionization (events_session_stats) must produce the same
    session count as Spark's native session_window over the same
    floored-second timeline.  The key starts a new session when
    diff > 1800s (i.e. merges diff <= 1800), which is session_window
    semantics with an 1801-second gap."""
    row = engine.QUERIES["events_session_stats"](spark, sf_dir).collect()[0]
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "user_id",
            F.timestamp_seconds(
                F.unix_timestamp(F.col("ts").cast("timestamp"))
            ).alias("fts"),
        )
    )
    native = (
        ev.groupBy(F.session_window("fts", "1801 seconds"), "user_id")
        .count()
        .count()
    )
    assert row["n_sessions"] == native


def test_resize_kernel_matches_naive_gather(spark):
    """The numpy nearest-neighbor resize must equal a per-pixel naive
    loop with the documented floor mapping sy=(ty*h) div th,
    sx=(tx*w) div tw — pinned here so a vectorization change can't
    silently shift the sampling grid (the SQL oracle would catch it at
    fixture dims only; this covers odd shapes incl. upscale)."""
    import numpy as np

    from ingest_sharepoint_file_to_fabric_lakehouse_spark.functions.multimodal import resize_images

    rng_cases = [(5, 3, 1, 2, 2), (7, 11, 3, 4, 6), (2, 2, 3, 5, 7), (16, 12, 3, 8, 6)]
    rows = []
    for i, (w, h, c, tw, th) in enumerate(rng_cases):
        buf = bytes((x * 7 + y * 13 + ch * 31 + i) % 251 for y in range(h) for x in range(w) for ch in range(c))
        rows.append((f"img{i}", buf, w, h, c))
    # all cases share (tw, th) per call — group by target dims
    for tw, th in {(cs[3], cs[4]) for cs in rng_cases}:
        sel = [(n, b, w, h, c) for (n, b, w, h, c), cs in zip(rows, rng_cases) if (cs[3], cs[4]) == (tw, th)]
        df = spark.createDataFrame(
            sel, "path string, content binary, width int, height int, n_channels int"
        )
        got = {r.path: bytes(r.content) for r in resize_images(df, tw, th).collect()}
        for (name, buf, w, h, c) in sel:
            img = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, c)
            want = bytes(
                int(img[(ty * h) // th, (tx * w) // tw, ch])
                for ty in range(th)
                for tx in range(tw)
                for ch in range(c)
            )
            assert got[name] == want, (name, tw, th)


def test_simhash_tokenset_permutation_invariance(spark):
    """The invariant dedup_simhash_stats' oracle rests on: the SimHash
    signature is a pure function of the DISTINCT token set, so word
    permutations and repetitions of the same vocabulary must land in
    the same bucket at Hamming 0 — regardless of the hash function."""
    import pandas as pd

    texts = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "epsilon delta gamma beta alpha"),          # permutation
        (2, "alpha alpha beta beta gamma delta epsilon"),  # repetition
        (3, "alpha beta gamma delta zeta"),              # different set
    ]
    pdf = pd.DataFrame({"doc_id": [t[0] for t in texts], "text": [t[1] for t in texts],
                        "lang": "en", "source": "t", "n_chars": [len(t[1]) for t in texts]})
    import os
    import tempfile

    d = tempfile.mkdtemp()
    pdf.to_parquet(f"{d}/documents.parquet", index=False)
    import ingest_sharepoint_file_to_fabric_lakehouse_spark as eng

    pairs = {(r.doc_a, r.doc_b, r.hamming) for r in eng.QUERIES["dedup_simhash"](spark, d).collect()}
    assert (0, 1, 0) in pairs and (0, 2, 0) in pairs and (1, 2, 0) in pairs, pairs
    # doc 3 must NOT be Hamming-0 with the others (one token differs)
    assert all(hm != 0 for a, b, hm in pairs if 3 in (a, b)), pairs


def test_edit_distance_blocked_matches_bruteforce(spark, sf_dir):
    """The Ed-Join prefix filter must lose NO true pair: compare the
    blocked operator against brute-force all-pairs Levenshtein over
    the same slice (completeness end-to-end, not just precision)."""
    import ingest_sharepoint_file_to_fabric_lakehouse_spark as eng

    got = {
        (r.doc_a, r.doc_b, r.edit_dist)
        for r in eng.QUERIES["dedup_edit_distance_blocked"](spark, sf_dir).collect()
    }
    base = (
        eng.t(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 7 < 3) & (F.col("doc_id") < 2000))
        .select("doc_id", F.lower(F.substring("text", 1, 40)).alias("title"))
    )
    a, b = base.alias("a"), base.alias("b")
    brute = {
        (r.doc_a, r.doc_b, r.edit_dist)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.title"), F.col("b.title")).cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 2)
        .collect()
    }
    assert got == brute and got, (len(got), len(brute))


def test_edit_distance_degenerate_keys_use_short_bucket(spark):
    """Keys with <= q*d distinct grams can be within distance d while
    sharing NO gram — the prefix join alone would miss them; the
    all-pairs short bucket must catch them."""
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.dedup import (
        _edit_distance_pairs,
    )

    rows = [
        (0, "ab"),   # 1 distinct gram: {ab}
        (1, "cd"),   # 1 distinct gram: {cd} — ed(ab,cd)=2, zero shared grams
        (2, "abcdefgh"),  # long key, far from both
    ]
    base = spark.createDataFrame(rows, "doc_id long, title string").withColumn(
        "tl", F.length("title")
    )
    got = {
        (r.doc_a, r.doc_b, r.edit_dist)
        for r in _edit_distance_pairs(base).collect()
    }
    assert got == {(0, 1, 2)}, got


def test_edit_distance_blocked_adversarial_small_alphabet(spark):
    """Completeness torture: 240 seeded-random keys over alphabet {a,b}
    of length 0..12 — maximal gram collisions, many degenerate (<= q*d
    distinct grams) keys, ties everywhere in the (df, gram) order.
    The prefix+short-bucket union must equal brute force exactly."""
    import random

    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.dedup import (
        _edit_distance_pairs,
    )

    rng = random.Random(20260815)
    # lengths 0..12: under q=3 / d=2, keys up to 8 chars carry <= q*d
    # distinct grams (short bucket) while longer ones take the prefix
    # path — both branches dense with collisions and df ties
    rows = [
        (i, "".join(rng.choice("ab") for _ in range(rng.randint(0, 12))))
        for i in range(240)
    ]
    base = spark.createDataFrame(rows, "doc_id long, title string").withColumn(
        "tl", F.length("title")
    )
    got = {
        (r.doc_a, r.doc_b, r.edit_dist)
        for r in _edit_distance_pairs(base).collect()
    }
    a, b = base.alias("a"), base.alias("b")
    brute = {
        (r.doc_a, r.doc_b, r.edit_dist)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.title"), F.col("b.title")).cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 2)
        .collect()
    }
    assert got == brute and len(got) > 100, (len(got), len(brute))


def test_corpus_shuffle_shard_is_deterministic_and_epoch_decorrelated(spark, sf_dir):
    """The training-order shuffle must be a pure function of
    (doc_id, epoch): re-runs reproduce identical shards (no RNG
    state), and a new epoch is a genuinely different permutation —
    different shard membership, not just a relabel."""
    import ingest_sharepoint_file_to_fabric_lakehouse_spark as engine

    a = engine.QUERIES["corpus_shuffle_shard"](spark, sf_dir).collect()
    b = engine.QUERIES["corpus_shuffle_shard"](spark, sf_dir).collect()
    assert a == b

    e1 = {r.shard: r.id_checksum for r in a if r.epoch == 1}
    e2 = {r.shard: r.id_checksum for r in a if r.epoch == 2}
    assert len(e1) > 1 and len(e2) > 1
    # epochs shuffle docs into different shard memberships
    assert e1 != e2
    # …and not merely a relabel/rotation of the same membership: no
    # shard-label permutation maps epoch-1 onto epoch-2, i.e. the
    # MULTISET of per-shard (n_docs, id_checksum) signatures differs.
    s1 = sorted((r.n_docs, r.id_checksum) for r in a if r.epoch == 1)
    s2 = sorted((r.n_docs, r.id_checksum) for r in a if r.epoch == 2)
    assert s1 != s2, "epoch-2 shards are a pure relabel of epoch-1"
    # but each epoch partitions the SAME corpus: totals conserved
    assert sum(e1.values()) == sum(e2.values())
    assert sum(r.n_docs for r in a if r.epoch == 1) == sum(
        r.n_docs for r in a if r.epoch == 2
    )


def test_pagerank_driver_equals_distributed(spark, sf_dir):
    """The hybrid's two paths must agree exactly: the driver loop
    replicates the distributed decimal(28,14) accumulation bit-for-bit
    (double contrib -> HALF_UP quantize -> exact decimal sum ->
    decimal->double), so forcing the distributed branch must reproduce
    the driver branch's rows, 6-dp-rounded ranks included."""
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators import graph as G

    driver = sorted(
        map(tuple, engine.QUERIES["graph_pagerank"](spark, sf_dir).collect())
    )
    edges = G._trade_edges_cached(spark, sf_dir)
    prev_w = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        dist = sorted(map(tuple, G._pagerank_body(spark, edges).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_w)
    assert driver == dist
    assert len(driver) > 0


def test_jaccard_prefix_shuffle_fallback_matches_broadcast(spark, tmp_path, monkeypatch):
    """The candidate join's broadcast hint is gated on the staged pa
    row count (_SG_META 'pa_rows') — corpus-proportional relations
    must never broadcast unconditionally.  Forcing the cap to 0 takes
    the shuffle-join fallback; its survivors must be value-identical
    to the broadcast shape's."""
    import ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.dedup as dd

    toks = [f"t{i:02d}" for i in range(40)]
    docs = [
        (1, " ".join(toks[:29])),
        (2, " ".join(toks[:35])),
        (3, " ".join(toks[2:31])),
        (4, " ".join(toks[5:20])),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    broadcast = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dd.dedup_jaccard_prefix(spark, str(tmp_path)).collect()
    }
    monkeypatch.setattr(dd, "_JACCARD_BROADCAST_PA_CAP", 0)
    shuffled = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dd.dedup_jaccard_prefix(spark, str(tmp_path)).collect()
    }
    assert broadcast and shuffled == broadcast


def test_pagerank_parity_on_random_graphs(spark):
    """The driver/distributed parity must hold on graphs OUTSIDE the
    pinned fixture — the repr()-based double->decimal conversion claims
    bit-exact agreement with Spark's BigDecimal.valueOf on ARBITRARY
    contribution values, including near-half-way quantize ties the
    nation graph never produces.  Ten seeded random weighted digraphs,
    both branches collected and compared exactly (6-dp ranks AND the
    deterministic rank order)."""
    import random as _random

    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators import graph as G

    prev_w = spark.conf.get("spark.sql.shuffle.partitions")
    for seed in range(10):
        rnd = _random.Random(seed)
        n = rnd.randint(2, 12)
        nodes = [f"n{i:02d}" for i in range(n)]
        seen = set()
        rows = []
        for _ in range(rnd.randint(1, 4 * n)):
            s, d = rnd.choice(nodes), rnd.choice(nodes)
            if s != d and (s, d) not in seen:
                seen.add((s, d))
                rows.append((s, d, rnd.randint(1, 10**6)))
        if not rows:
            continue
        edges = spark.createDataFrame(rows, "src string, dst string, w long")
        driver = sorted(map(tuple, G._pagerank_driver(spark, edges).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        try:
            dist = sorted(map(tuple, G._pagerank_body(spark, edges).collect()))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_w)
        assert driver == dist, f"seed={seed}: driver/distributed diverge"
