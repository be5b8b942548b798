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


def backfill_partitions(df: DataFrame, path: str,
                        partition_cols: list[str]) -> None:
    """Idempotent backfill: rewrite ONLY the partitions present in
    ``df``, leaving every other partition untouched (dynamic partition
    overwrite).  This is how a corrected day/source is reprocessed at
    100 TB — re-running the job for 2024-01-03 must not truncate the
    other 3 years.  Static overwrite (the default) would drop the whole
    table root; the dynamic mode scopes the delete to the partitions
    the frame actually writes."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    # conf.get(key, None) returns None when the key was never set on the
    # session, so the restore must UNSET in that case — re-setting would
    # leave dynamic overwrite active for every later writer in the session.
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        (df.write.mode("overwrite")
         .partitionBy(*partition_cols).parquet(path))
    finally:
        if prev is not None:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)


def read_jsonl_documents(spark, path: str, schema: str | None = None,
                         id_col: str = "doc_id") -> DataFrame:
    """Ingest a JSON-lines corpus (the interchange format most crawled /
    curated text corpora arrive in).  An explicit schema skips Spark's
    whole-file inference pass — at 100 TB schema inference is a full
    extra scan, so production callers should always pass one.  Rows
    whose JSON is malformed land in ``_corrupt_record`` (PERMISSIVE
    mode) instead of failing the job; filter or route them explicitly.
    When an explicit schema is given, ``_corrupt_record STRING`` is
    appended automatically if absent — PERMISSIVE mode only routes
    malformed lines into that column when the schema declares it;
    without it they silently become all-NULL rows.
    """
    reader = spark.read
    if schema is not None:
        if isinstance(schema, str):
            if "_corrupt_record" not in schema:
                schema = schema.rstrip() + ", _corrupt_record STRING"
        elif all(f.name != "_corrupt_record" for f in schema.fields):
            from pyspark.sql.types import StringType, StructField, StructType
            schema = StructType(list(schema.fields)
                                + [StructField("_corrupt_record",
                                               StringType())])
        reader = reader.schema(schema)
    df = reader.json(path)
    if id_col not in df.columns:
        raise ValueError(f"jsonl corpus lacks required id column {id_col!r}")
    return df


def compact_parquet(spark, src: str, dst: str,
                    target_file_mb: int = 512,
                    sort_within: list[str] | None = None) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(bytes / target_file_mb)`` files.  Streaming micro-batch
    landings and per-executor writes leave thousands of KB-sized files;
    scan cost at 100 TB is dominated by file-open overhead long before
    bytes, so periodic compaction is part of any corpus landing zone.
    Returns the number of output files requested.  Uses the source's
    on-disk size (driver-side listing, no data scan) to pick the file
    count; an optional within-file sort restores locality for
    downstream range predicates."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src)
    fs = p.getFileSystem(conf)
    # overwrite-while-lazily-reading the same directory would truncate
    # the source before the scan runs; Spark's self-overwrite detection
    # can be bypassed by trailing slashes / relative paths / symlinks,
    # so compare fully-resolved URIs ourselves.
    src_q = fs.makeQualified(p).toUri().normalize()
    dst_q = fs.makeQualified(jvm.org.apache.hadoop.fs.Path(dst)) \
        .toUri().normalize()
    same = str(src_q).rstrip("/") == str(dst_q).rstrip("/")
    if not same and str(src_q).startswith("file:") \
            and str(dst_q).startswith("file:"):
        import os
        same = (os.path.realpath(str(src_q)[5:])
                == os.path.realpath(str(dst_q)[5:]))
    if same:
        raise ValueError(
            f"compact_parquet: src and dst resolve to the same location "
            f"({src_q}); write to a new directory and swap afterwards")
    total_bytes = fs.getContentSummary(p).getLength()
    n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    out = df.repartition(int(n_files))
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    out.write.mode("overwrite").parquet(dst)
    return int(n_files)


def read_partition_pruned(spark, path: str, **equals) -> DataFrame:
    """Read back a partitioned corpus with explicit partition filters —
    a thin helper that keeps the pruning predicate next to the read so
    the scan never lists non-matching directories."""
    df = spark.read.parquet(path)
    for col, val in equals.items():
        df = df.filter(F.col(col) == F.lit(val))
    return df
