"""Measured scaling probe for the Ed-Join blocked edit-distance path.

The generic scale smoke synthesizes Nx corpora by replicating docs at
doc_id offsets the edit-distance key's slice filter excludes, so it
would measure a FLAT no-op for this key.  This probe instead feeds
``_edit_distance_pairs`` seeded-random title corpora of N, 4N, 10N
keys directly (constant near-dup density: every 40th key is a planted
1-edit variant of its predecessor) and records warm wall-time growth
into ``tools/edist_scale_probe.json``.

At constant duplicate density the candidate volume of the prefix join
grows ~linearly (each key contributes q*d+1 postings; bucket sizes
grow with N but candidate pairs are bounded by posting-list joins on
RARE grams), so warm ratios should track N, not N^2 — the claim the
JSON records.

Usage: python tools/edist_scale_probe.py [base_n]
"""

from __future__ import annotations

import json
import os
import random
import string
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def corpus(n: int):
    rng = random.Random(99)
    rows = []
    prev = None
    for i in range(n):
        if prev is not None and i % 40 == 39:
            # planted 1-edit near-dup of the previous key
            j = rng.randrange(len(prev))
            title = prev[:j] + rng.choice(string.ascii_lowercase) + prev[j + 1 :]
        else:
            title = "".join(
                rng.choice(string.ascii_lowercase + "  ") for _ in range(40)
            )
        rows.append((i, title))
        prev = title
    return rows


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.dedup import (
        _edit_distance_pairs,
    )

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", str(os.cpu_count()))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    out = {"base_n": base_n, "points": {}}
    for mult in (1, 4, 10):
        n = base_n * mult
        base = spark.createDataFrame(
            corpus(n), "doc_id long, title string"
        ).withColumn("tl", F.length("title"))
        # cold pass builds the staged index frames; warm pass is the
        # steady state (same discipline as the main scale smoke)
        t0 = time.time()
        rows_cold = _edit_distance_pairs(base).count()
        cold = time.time() - t0
        t0 = time.time()
        rows_warm = _edit_distance_pairs(base).count()
        warm = time.time() - t0
        out["points"][str(mult)] = {
            "n": n,
            "pairs": rows_warm,
            "cold_s": round(cold, 3),
            "warm_s": round(warm, 3),
        }
        assert rows_cold == rows_warm
        print(f"x{mult}: n={n} pairs={rows_warm} cold={cold:.2f}s warm={warm:.2f}s")
    p = out["points"]
    out["warm_ratio_x4"] = round(p["4"]["warm_s"] / p["1"]["warm_s"], 2)
    out["warm_ratio_x10"] = round(p["10"]["warm_s"] / p["1"]["warm_s"], 2)
    with open(os.path.join(REPO, "tools", "edist_scale_probe.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "points"}))


if __name__ == "__main__":
    main()
