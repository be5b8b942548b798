"""Named sample datasets (S7) — the five tables the reference bundles and
loads at import (``/root/reference/src/petropandas/data/__init__.py:1-33``):
``avgpelite``, ``bulk``, ``grt_profile``, ``minerals``, ``sazava``.

Shipped as parquet under ``petropandas_spark/data/`` (regenerated from the
published CSVs by ``tools/make_datasets.py``; parquet keeps types stable
and reads natively in Spark).  Unlike the reference, nothing loads at
import time — datasets are lazy Spark reads, so importing the package
never touches the filesystem.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

NAMES = ("avgpelite", "bulk", "grt_profile", "minerals", "sazava")

# reference row counts (header-less), asserted by tests/test_io.py
ROWS = {
    "avgpelite": 1,
    "bulk": 9,
    "grt_profile": 99,
    "minerals": 315,
    "sazava": 14,
}

_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def load(spark: SparkSession, name: str) -> DataFrame:
    """Load a bundled dataset by name as a Spark DataFrame."""
    if name not in NAMES:
        raise KeyError(f"unknown dataset {name!r}; available: {NAMES}")
    return spark.read.parquet(os.path.join(_DATA_DIR, f"{name}.parquet"))


def load_petro(spark: SparkSession, name: str):
    """Load a bundled dataset pre-ingested as a :class:`PetroFrame`
    (clean-on-read: oxide columns typed, metadata preserved)."""
    from petropandas_spark.frame import PetroFrame

    return PetroFrame.ingest(load(spark, name))
