"""PySpark-native analytics engine with the capabilities of
``csetiawanaxexcellence/ingest-sharepoint-file-to-fabric-lakehouse`` (see SURVEY.md), rebuilt
Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the events stream, Arrow-vectorized UDFs only where
built-ins can't express the semantics.
"""

from __future__ import annotations

import importlib

from .core import ORACLES, QUERIES, prep, t

_MODULES = [
    "plans.flagship",
    "plans.layout",
    "plans.scd",
    "operators.projections",
    "operators.joins",
    "operators.aggregates",
    "operators.windows",
    "operators.sorts_sets",
    "operators.reshape",
    "operators.corpus",
    "operators.search",
    "operators.spatial",
    "operators.analytics",
    "operators.quality",
    "operators.graph",
    "operators.dedup",
    "operators.similarity",
    "operators.pipeline",
    "functions.scalars",
    "functions.text",
    "functions.udfs",
    "functions.multimodal",
    "sources.scans",
    "sources.sinks",
    "sources.ingest",
    "streaming.batch_equiv",
    "streaming.streams",
]


def load_all() -> None:
    """Import every operator module, populating QUERIES/ORACLES."""
    for m in _MODULES:
        importlib.import_module(f"{__name__}.{m}")


__all__ = ["QUERIES", "ORACLES", "load_all", "prep", "t"]
