"""Plan-shape budget — a lockfile for physical-plan regressions.

Correctness gates catch wrong ANSWERS; the bench catches wall-clock
only at fixture scale, where an extra exchange over tiny data is
invisible.  This tool records, per key, the plan-shape numbers that
DO matter at 100 TB — exchange count and per-table FileScan count in
the executed plan — into ``tools/plan_budget.json``, and in check
mode fails any key that EXCEEDS its recorded budget (fewer is fine
and auto-tightens on the next --record).

Workflow:
    python tools/plan_budget.py --record   # refresh the lockfile
    python tools/plan_budget.py            # check current vs lockfile

``--execute`` runs each query (noop-collect) first and reads the
FINAL adaptive plan — without it the shape is the pre-AQE static plan
(isFinalPlan=false), which never reflects runtime broadcast demotions
or skew-join splits.  ``--out=PATH`` redirects the lockfile, so
scale-probe shapes (e.g. the synthesized 10x set, where a planner
regression shows up as a LOST broadcast) live beside the fixture
lockfile instead of overwriting it: per the round-10 verdict the
TPC-H heads' 10x shapes are pinned in tools/plan_budget_x10.json.

Shapes also record join-node counts by strategy; check mode fails a
key whose BroadcastHashJoin count DROPPED or whose SortMergeJoin /
ShuffledHashJoin / BroadcastNestedLoopJoin count ROSE vs its budget —
the lost-broadcast regression the exchange count alone can miss (a
broadcast demoted to SMJ adds exchanges on both sides, but only if
neither side was already exchange-adjacent).

A key over budget means a change added an exchange or a table rescan
the author didn't notice — exactly the regression class the round-7
scan audit found by hand (7 hidden lineitem scans in one plan).
New keys (absent from the lockfile) are reported and recorded, never
failed.  Plans are built at sf0.001: exchange/scan counts are
sf-independent by construction (AQE coalesces partition counts, not
exchange nodes).
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
BUDGET_PATH = os.path.join(REPO, "tools", "plan_budget.json")


_JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
)


def shape_of(df, execute: bool = False) -> dict:
    if execute:
        # Materialize so AdaptiveSparkPlan finalizes; the collected
        # rows are discarded — only the plan is read.
        df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = Counter(re.findall(r"(\w+)\.parquet", plan))
    joins = {n: len(re.findall(rf"\b{n}\b", plan)) for n in _JOIN_NODES}
    return {
        "exchanges": plan.count("Exchange "),
        "scans": dict(sorted(scans.items())),
        "joins": {k: v for k, v in joins.items() if v},
    }


def main() -> None:
    record = "--record" in sys.argv
    execute = "--execute" in sys.argv
    out_path = BUDGET_PATH
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
            if not os.path.isabs(out_path):
                out_path = os.path.join(REPO, out_path)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        # generated-class cache sized to the registry: the default
        # 100-entry LRU evicts every plan in a 257-plan session and
        # re-pays janino compilation per re-execution (SCALE.md,
        # long-session ops #3)
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("plan_budget")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import ingest_sharepoint_file_to_fabric_lakehouse_spark as engine

    engine.load_all()

    budget = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            budget = json.load(f)

    current, over, new_keys, errors = {}, [], [], []
    for key, fn in engine.QUERIES.items():
        if only and key not in only:
            continue
        try:
            current[key] = shape_of(fn(spark, sf_dir), execute=execute)
        except Exception as exc:
            errors.append(key)
            print(f"ERR  {key}: {str(exc)[:100]}")
            continue
        if key not in budget:
            new_keys.append(key)
            continue
        b, c = budget[key], current[key]
        overruns = []
        if c["exchanges"] > b["exchanges"]:
            overruns.append(f"exchanges {b['exchanges']} -> {c['exchanges']}")
        for tbl, n in c["scans"].items():
            if n > b["scans"].get(tbl, 0):
                overruns.append(f"{tbl} scans {b['scans'].get(tbl, 0)} -> {n}")
        # join-strategy drift (only when the budget recorded joins):
        # losing a broadcast or gaining a shuffle-side join is the
        # planner regression exchange counts can miss.
        bj, cj = b.get("joins"), c.get("joins", {})
        if bj is not None:
            if cj.get("BroadcastHashJoin", 0) < bj.get("BroadcastHashJoin", 0):
                overruns.append(
                    "BroadcastHashJoin "
                    f"{bj.get('BroadcastHashJoin', 0)} -> "
                    f"{cj.get('BroadcastHashJoin', 0)}"
                )
            for n in ("SortMergeJoin", "ShuffledHashJoin",
                      "BroadcastNestedLoopJoin"):
                if cj.get(n, 0) > bj.get(n, 0):
                    overruns.append(f"{n} {bj.get(n, 0)} -> {cj.get(n, 0)}")
        if overruns:
            over.append(key)
            print(f"OVER {key}: {'; '.join(overruns)}")

    if record or new_keys:
        merged = dict(budget)
        merged.update(current)
        with open(out_path, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        if new_keys:
            print(f"recorded {len(new_keys)} new keys")
        if record:
            print(f"lockfile refreshed: {len(merged)} keys")
    print(
        f"\n== {len(current) - len(over)} ok, {len(over)} over budget, "
        f"{len(new_keys)} new, {len(errors)} errors =="
    )
    if over and not record:
        sys.exit(1)


if __name__ == "__main__":
    main()
