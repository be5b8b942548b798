"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in :mod:`petropandas_spark.registry`; this module
only adapts them to the driver's three-function surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:  # robust to being imported from any cwd
    sys.path.insert(0, _REPO)

from petropandas_spark.registry import build_registry  # noqa: E402

_REGISTRY = build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full garnet pipeline (clean → APFU → Droop Fe3+ →
    site allocation → Locock end-members) on sf0.001 pseudo-garnet rows."""
    return _REGISTRY["garnet_end_members"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark_fn for name, spec in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted for non-SQL ops)."""
    return {
        name: spec.oracle
        for name, spec in _REGISTRY.items()
        if spec.oracle is not None
    }
