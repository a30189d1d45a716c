"""Measured scaling probe for the Ed-Join blocked edit-distance path.

The generic scale smoke synthesizes Nx corpora by replicating docs at
doc_id offsets the edit-distance key's slice filter excludes, so it
would measure a FLAT no-op for this key.  This probe instead feeds
``_edit_distance_pairs`` generated title corpora of N, 4N, 10N keys
(constant near-dup density: every 40th key is a planted 1-edit
variant of its predecessor) and records warm wall-time growth into
``tools/edist_scale_probe.json``.

TWO regimes, because candidate volume is sum over grams of
df_prefix(g)^2 — the blocking is only selective while prefix grams
stay RARE:

* ``zipf``    — titles are 5 words Zipf-sampled from a seeded 5000-word
  vocabulary: the production regime (real text keeps a long tail of
  rare grams at any corpus size).  Expected ~linear warm growth.
* ``uniform`` — 40 uniform-random chars per key: the adversarial
  no-rare-grams corpus.  Past n ~ |alphabet|^q / (q*d+1) every bucket
  is dense and candidates grow ~n^2/|gram space| — inherent to ANY
  q-gram blocking when all keys are equidistant, and the reason q=3
  (not 2) is the default.  Planted-dup recall stays 100% either way;
  only the candidate-volume cost degrades.

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


def _vocab(rng: random.Random, n: int = 5000):
    return [
        "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(3, 8)))
        for _ in range(n)
    ]


def corpus(n: int, mode: str):
    rng = random.Random(99)
    vocab = _vocab(rng) if mode == "zipf" else None
    # Zipf ranks: weight 1/r over the vocab (favours a dense head but
    # keeps a long rare tail, like real text)
    weights = [1.0 / r for r in range(1, len(vocab) + 1)] if vocab else None
    rows = []
    prev = None
    for i in range(n):
        if prev is not None and i % 40 == 39:
            # substitute with a character DIFFERENT from the original so
            # every planted pair is a true 1-edit variant, never an
            # accidental exact duplicate (~1/26 odds with the full
            # alphabet, which slightly overstated near-dup density)
            j = rng.randrange(len(prev))
            alt = string.ascii_lowercase.replace(prev[j], "")
            title = prev[:j] + rng.choice(alt) + prev[j + 1 :]
        elif mode == "zipf":
            title = " ".join(rng.choices(vocab, weights=weights, k=5))[:40]
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
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    out = {"base_n": base_n, "regimes": {}}
    for mode in ("zipf", "uniform"):
        pts = {}
        for mult in (1, 4, 10):
            n = base_n * mult
            base = spark.createDataFrame(
                corpus(n, mode), "doc_id long, title string"
            ).withColumn("tl", F.length("title"))
            t0 = time.time()
            rows_cold = _edit_distance_pairs(base).count()
            cold = time.time() - t0
            # warm = min of 2 passes after the cold one (the shared
            # host carries co-tenant load spikes; min is spike-robust)
            warm, rows_warm = float("inf"), rows_cold
            for _ in range(2):
                t0 = time.time()
                rows_warm = _edit_distance_pairs(base).count()
                warm = min(warm, time.time() - t0)
            assert rows_cold == rows_warm
            pts[str(mult)] = {
                "n": n,
                "pairs": rows_warm,
                "cold_s": round(cold, 3),
                "warm_s": round(warm, 3),
            }
            print(
                f"{mode} x{mult}: n={n} pairs={rows_warm} "
                f"cold={cold:.2f}s warm={warm:.2f}s"
            )
        out["regimes"][mode] = {
            "points": pts,
            "warm_ratio_x4": round(pts["4"]["warm_s"] / pts["1"]["warm_s"], 2),
            "warm_ratio_x10": round(pts["10"]["warm_s"] / pts["1"]["warm_s"], 2),
        }
    with open(os.path.join(REPO, "tools", "edist_scale_probe.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(
        json.dumps(
            {
                m: {k: v for k, v in r.items() if k != "points"}
                for m, r in out["regimes"].items()
            }
        )
    )


if __name__ == "__main__":
    main()
