"""Per-key timing harness for perf work: mirrors bench.py's session
config (heap, Kryo, code cache, /dev/shm local dir, calibration) but
times only the keys given on argv, N passes each, printing min/median.

Usage: python tools/time_keys.py [--sf DIR] [--passes N] key [key ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .config(
            "spark.local.dir",
            "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
        )
        .appName("time-keys")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()
    e.entry(spark).collect()  # warmup

    calib_t0 = time.time()
    spark.range(2_000_000_000).selectExpr("sum(xxhash64(id) % 1000000) s").collect()
    print(f"calib {time.time() - calib_t0:.3f}s", file=sys.stderr)

    for key in args.keys:
        if key not in qs:
            print(f"{key}: UNKNOWN KEY", file=sys.stderr)
            continue
        times = []
        for _ in range(args.passes):
            spark.sparkContext._jvm.System.gc()
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            t0 = time.time()
            n = qs[key](spark, args.sf).count()
            times.append(time.time() - t0)
        print(
            f"{key}: min={min(times):.3f} med={statistics.median(times):.3f} "
            f"all={[round(t, 3) for t in times]} rows={n}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
