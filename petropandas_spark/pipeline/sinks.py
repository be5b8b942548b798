"""Curated-corpus materialization: the write side of the training-data
pipeline.

At 100 TB the layout you write is as important as the plan that computes
it: downstream consumers (trainers, samplers, per-language jobs) read
back along partition boundaries, so the writers here encode the three
layouts that matter —

  * ``write_partitioned`` — Hive-style directory partitioning on
    low-cardinality keys (lang, split): readers get partition pruning
    for free (``WHERE lang = 'en'`` never opens other directories).
  * ``write_sharded`` — fixed-size training shards: repartition by a
    deterministic hash of the id column so shard membership is stable
    across runs, cap ``maxRecordsPerFile`` so a trainer can stream
    fixed-size files; optionally sort within partitions so each shard
    is locally ordered (better scan locality + compression).
  * ``write_bucketed`` (in :mod:`petropandas_spark.io`) — pre-shuffled
    bucket layout for repeated co-located joins.

All three write parquet via the normal committer: the writers add no
driver-side loops and no extra shuffles beyond the one explicit
``repartition`` that defines the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    """Hive-partitioned parquet: one directory per distinct partition
    key.  Use for low-cardinality routing keys only (lang, split, date)
    — a high-cardinality key would explode into millions of tiny files.
    """
    (df.write.mode(mode).partitionBy(*partition_cols).parquet(path))


def write_sharded(df: DataFrame, path: str, id_col: str,
                  n_shards: int, max_records_per_file: int | None = None,
                  sort_within: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    """Deterministic training shards: rows route to shards by
    ``xxhash64(id) % n_shards`` (stable across runs and cluster sizes —
    unlike round-robin ``repartition(n)``, re-running on different
    parallelism reproduces the same shard membership), with an optional
    within-shard sort and a per-file record cap.
    """
    shard = (F.xxhash64(F.col(id_col)) % n_shards + n_shards) % n_shards
    out = df.repartition(n_shards, shard.alias("__shard"))
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    writer = out.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def read_partition_pruned(spark, path: str, **equals) -> DataFrame:
    """Read back a partitioned corpus with explicit partition filters —
    a thin helper that keeps the pruning predicate next to the read so
    the scan never lists non-matching directories."""
    df = spark.read.parquet(path)
    for col, val in equals.items():
        df = df.filter(F.col(col) == F.lit(val))
    return df
