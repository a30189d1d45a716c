"""recommended_session_conf is the single source of truth for the
long-session ops conf (SCALE.md; r15 verdict ask #6): bench.py,
tests/conftest.py, tools/check_oracle.py and tools/plan_budget.py all
consume it instead of repeating the literals.  These tests pin (a) the
contract of the function itself and (b) that the test session fixture
actually CARRIES the conf — i.e. conftest really consumed it.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from ingest_sharepoint_file_to_fabric_lakehouse_spark.core import (  # noqa: E402
    recommended_session_conf,
)


def test_conf_contract():
    conf = recommended_session_conf()
    # the codegen class cache is THE long-session knob (100-entry LRU
    # default re-pays janino compile per re-execution on a full-registry
    # session); it is static, so it must come from this dict at build
    # time — never from prep()
    assert conf["spark.sql.codegen.cache.maxEntries"] == "10000"
    assert conf["spark.sql.session.timeZone"] == "UTC"
    assert conf["spark.sql.adaptive.enabled"] == "true"
    assert conf["spark.sql.execution.arrow.pyspark.enabled"] == "true"
    assert "spark.sql.shuffle.partitions" not in conf  # only when asked
    assert recommended_session_conf(8)["spark.sql.shuffle.partitions"] == "8"
    assert recommended_session_conf("32")["spark.sql.shuffle.partitions"] == "32"


def test_session_fixture_carries_the_recommended_conf(spark):
    for k, v in recommended_session_conf(4).items():
        assert spark.conf.get(k) == v, f"session dropped {k}"


def test_harnesses_consume_the_single_source():
    """No harness may re-introduce the literal: the conf name appears in
    bench/conftest/check_oracle/plan_budget only via the import."""
    for path in (
        "/root/repo/bench.py",
        "/root/repo/tests/conftest.py",
        "/root/repo/tools/check_oracle.py",
        "/root/repo/tools/plan_budget.py",
        "/root/repo/tools/time_keys.py",
    ):
        src = open(path).read()
        assert "recommended_session_conf" in src, path
        assert "codegen.cache.maxEntries" not in src, (
            f"{path} re-hardcodes the codegen cache literal instead of "
            "consuming recommended_session_conf"
        )


def test_prep_is_memoized_until_marked_dirty(spark):
    """r16: prep() pins once per application and skips its seven py4j
    conf.set round trips on later calls — UNLESS a conf-mutating query
    (join_runtime_bloom's toggles) marked the session dirty, in which
    case the very next prep must re-pin the defaults."""
    from ingest_sharepoint_file_to_fabric_lakehouse_spark import core

    core.prep(spark)  # ensure pinned
    # memo active: an external (harness-level) mutation is NOT repaired
    # by a plain prep call...
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    core.prep(spark)
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    # ...but a dirty mark forces the re-pin (the engine's own mutators
    # either restore in finally or call mark_conf_dirty)
    core.mark_conf_dirty(spark)
    core.prep(spark)
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "10MB"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"

def test_mark_conf_dirty_is_per_application(spark):
    """r17 (ADVICE fix): the dirty mark must not be a process-global —
    marking session A dirty may not consume a mark another session
    relies on, and prep() on B must not clear A's mark.  The mark is
    now 'discard this app from the pinned set', so other apps' pins
    survive and this app's next prep re-pins."""
    from ingest_sharepoint_file_to_fabric_lakehouse_spark import core

    core.prep(spark)  # ensure pinned
    core._PREP_PINNED.add("some-other-application-id")
    core.mark_conf_dirty(spark)
    assert "some-other-application-id" in core._PREP_PINNED
    assert spark.sparkContext.applicationId not in core._PREP_PINNED
    core._PREP_PINNED.discard("some-other-application-id")
    core.prep(spark)  # re-pin for the rest of the suite
    assert spark.sparkContext.applicationId in core._PREP_PINNED
