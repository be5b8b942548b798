"""Streaming corpus ingestion: continuous document arrival → dedup
against the historical store → partitioned parquet landing.

The batch curation operators (``pipeline/dedup``, ``pipeline/sinks``)
have streaming twins here with the same semantics:

  * ``read_documents_stream`` — file-source stream over a documents
    directory (each micro-batch = newly landed files; at scale this is
    the object-store notification pattern, bounded by
    ``maxFilesPerTrigger``);
  * ``dedup_against_store`` — drop arrivals whose content hash already
    exists in a STATIC historical signature store (stream-static
    left-anti join: the static side is re-read per micro-batch, planned
    as a broadcast for a signature table that fits, and never requires
    stream-side state);
  * ``dedup_within_stream`` — additionally drop re-arrivals inside the
    stream itself via ``dropDuplicatesWithinWatermark`` on the content
    hash (bounded state: entries expire with the watermark);
  * ``write_partitioned_stream`` — exactly-once landing into
    Hive-partitioned parquet (``partitionBy(lang)``) with a checkpoint;
    downstream batch readers get partition pruning on day one.
"""

from __future__ import annotations

from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def read_documents_stream(spark, path: str,
                          max_files_per_trigger: int | None = None):
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format("parquet").load(path)


def content_hashed(df):
    """Stable content identity: md5 of the exact text bytes."""
    return df.withColumn("content_hash", F.md5(F.col("text")))


def dedup_against_store(stream_df, store_df):
    """Stream-static anti-join: keep only documents whose content hash is
    absent from the historical store.  ``store_df`` is a static frame
    (e.g. the signature column of the curated corpus); Spark re-plans
    the join each micro-batch, so a growing store is picked up on the
    next trigger without restarting the query."""
    sigs = store_df.select(
        F.col("content_hash").alias("__seen_hash")
    ).distinct()
    s = content_hashed(stream_df)
    return s.join(
        F.broadcast(sigs),
        s.content_hash == F.col("__seen_hash"),
        "left_anti",
    )


def dedup_within_stream(stream_df, arrival_col: str = "arrival_ts",
                        delay: str = "10 minutes"):
    """Drop duplicate content arriving WITHIN the stream: state is
    bounded by the watermark (an entry is forgotten once the watermark
    passes its arrival time — re-arrivals beyond the horizon are a
    storage-level dedup job's problem, not stream state)."""
    s = content_hashed(stream_df)
    if arrival_col not in s.columns:
        s = s.withColumn(arrival_col, F.current_timestamp())
    return s.withWatermark(arrival_col, delay).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def write_partitioned_stream(df, path: str, checkpoint: str,
                             partition_cols: list[str] = ("lang",)):
    """Exactly-once partitioned parquet landing; drain with
    ``availableNow`` in tests, leave running in production."""
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(*partition_cols)
        .trigger(availableNow=True)
        .start()
    )
