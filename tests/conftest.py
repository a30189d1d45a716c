from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        # generated-class cache sized to the registry: the default
        # 100-entry LRU evicts every plan in a 257-plan session and
        # re-pays janino compilation per re-execution (SCALE.md,
        # long-session ops #3)
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("ingest-sharepoint-file-to-fabric-lakehouse-spark-tests")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
