"""JSONL corpus ingestion — the read side of the training-data pipeline.

Web-scale text corpora arrive as JSON-lines (Common Crawl derivatives,
Dolma, RedPajama shards): one document object per line, schema drift and
truncated lines included.  The ingest contract here is the engine's
standard dirty-data contract (docs/robustness.md): **a malformed line
loses its row — into a quarantine frame, never silently and never by
aborting the job.**

Spark-first shape, sized for 100 TB of shards:

  * ``spark.read.text`` + ``from_json`` with an EXPLICIT schema — schema
    inference is a full extra pass over the data (at 100 TB, an extra
    100 TB scan) and is non-deterministic under drift; callers state
    what they expect.  Text sources split by line, so the scan
    parallelizes like any file source.
  * malformed-line detection via a corrupt-record field inside the
    ``from_json`` FUNCTION schema — the (good, quarantine) split is two
    narrow filters over the same scan.  Two rejected alternatives, both
    measured/hit: the reader-level ``columnNameOfCorruptRecord`` route
    (Spark disallows any query whose pruned schema is the corrupt
    column alone [UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN]
    — exactly what a quarantine consumer does; the documented
    workaround is ``cache()``, a non-starter at corpus scale) and bare
    ``from_json IS NULL`` (PERMISSIVE from_json yields PARTIAL structs
    for malformed lines, silently promoting truncated records into the
    good frame).
  * Quarantine carries the raw line so a fix-up job can re-parse without
    re-reading the shard set.

Reference scope note: the reference package has no streaming/corpus
ingestion surface — this module is part of the LLM-pipeline extension
(SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: default document schema matching the testdata ``documents`` table
DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("source", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("text", T.StringType()),
])

_CORRUPT = "__corrupt_record"


def _parse_split(raw: DataFrame, schema: T.StructType
                 ) -> tuple[DataFrame, DataFrame]:
    """Shared batch/stream split over a ``value``-columned text frame.

    from_json in PERMISSIVE mode yields PARTIAL structs for malformed
    lines (whatever prefix parsed), so "struct IS NULL" under-detects;
    the corrupt-record field inside the FUNCTION schema captures the
    raw text on any parse failure — and being a function column, the
    scan-level corrupt-only-query restriction doesn't apply.

    Whitespace-only lines are dropped before the parse (neither good
    nor quarantine — see read_jsonl's contract note).

    Parser strictness (r9 advisor finding — the cross-engine contract):
    Jackson's default leniencies would silently accept lines a strict
    RFC 8259 parser (DuckDB's yyjson, most downstream consumers)
    rejects, making "good" engine-defined.  Two pins close the common
    divergences:

    * ``allowSingleQuotes=false`` — ``{'k': 1}`` is not JSON; it
      quarantines (Jackson's DEFAULT accepts it).
    * a structural guard: a good line must end with ``}`` plus
      optional whitespace — Jackson stops at the first complete root
      object and
      ignores trailing bytes (``{"k":1} trailing`` parses!), so
      trailing-garbage lines are forced into quarantine where strict
      parsers already put them.

    * an exactly-one-root guard (r10 ADVICE — the one leniency that
      DISCARDED user bytes instead of quarantining them): two
      concatenated root objects ``{..}{..}`` end with ``}`` so the
      structural guard passes, and Jackson silently keeps only the
      FIRST root.  A regex alone cannot decide this (``}{`` may sit
      inside a string literal), so the regex ``\\}\\s*\\{`` is only a
      cheap prefilter and the PARSER issues the verdict: the line
      bracketed as ``[`` line ``]`` must parse as a JSON array — a
      second root inside the brackets is a missing-comma syntax
      error.  Lines without the ``}<ws>{`` byte pattern skip the
      second parse entirely, and a non-object second root (``{..}[1]``,
      ``{..}"s"``, ``{..}1``) already dies at the end-with-``}``
      guard, so object-object is the only shape the probe must catch.

    Residual engine-defined edges, kept OUT of the pinned fixture and
    documented here (test_ingest pins each direction): a trailing
    comma ``{"k": 1,}`` (yyjson accepts, Jackson rejects → quarantine
    HERE, good under a lenient reader); lone surrogate escapes
    ``"\\ud800"`` (Jackson accepts → good HERE, yyjson rejects)."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    parsed = raw.where(F.length(F.trim("value")) > 0).select(
        F.col("value"),
        F.from_json(
            "value", full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT,
             "allowSingleQuotes": "false"},
        ).alias("j"),
    )
    # the guard regex allows trailing WHITESPACE after the brace (CRLF
    # shards leave \r on every line; Jackson and yyjson both ignore it)
    multi_root = (
        F.col("value").rlike(r"\}\s*\{")
        & F.from_json(
            F.concat(F.lit("["), F.col("value"), F.lit("]")),
            "array<struct<__probe:string>>",
            {"mode": "PERMISSIVE", "allowSingleQuotes": "false"},
        ).isNull()
    )
    bad = (
        F.col("j").isNull()
        | F.col(f"j.{_CORRUPT}").isNotNull()
        | ~F.col("value").rlike(r"\}\s*$")
        | multi_root
    )
    good = parsed.where(~bad).select(
        *[F.col(f"j.`{f.name}`").alias(f.name) for f in schema.fields])
    quarantine = parsed.where(bad).select(F.col("value").alias("raw_line"))
    return good, quarantine


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType = DOC_SCHEMA,
               ) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines shards into ``(good, quarantine)``.

    ``good`` has exactly *schema*'s columns; ``quarantine`` is
    ``(raw_line)`` for every line that failed to parse — truncated
    JSON, bare text, **and parseable objects with a type-drifted
    non-STRING field** (PERMISSIVE ``from_json`` sets the
    corrupt-record column on field drift, so e.g. ``"doc_id": "abc"``
    quarantines the whole line, carrying the raw text for a typed
    fix-up pass rather than silently nulling the value).  Missing or
    explicitly-null fields are NOT drift — they land in ``good`` as
    NULLs; STRING-typed fields accept any token (``from_json``
    stringifies numbers, booleans and subtrees) and so never drift a
    line.  Whitespace-only lines are DISCARDED from both frames —
    blank lines are conventional shard separators, not documents, so
    they are neither data nor an error.  Use
    :func:`petropandas_spark.pipeline.validation` constraints for
    value-level policing of the good frame.  Both frames are narrow
    filters over the text scan; neither shuffles.
    """
    raw = spark.read.text(path)
    return _parse_split(raw, schema)


def read_jsonl_stream(spark: SparkSession, path: str,
                      schema: T.StructType = DOC_SCHEMA,
                      ) -> tuple[DataFrame, DataFrame]:
    """Structured-Streaming twin of :func:`read_jsonl`: watch a landing
    directory of JSONL shards, same (good, quarantine) split per
    micro-batch — new shards land continuously at ingest scale, and a
    malformed line must not kill the stream any more than a batch job.
    Feed ``good`` into the :mod:`petropandas_spark.streaming.corpus`
    dedup/decontamination twins; sink ``quarantine`` beside the corpus
    for fix-up."""
    raw = spark.readStream.text(path)
    return _parse_split(raw, schema)


def write_jsonl(df: DataFrame, path: str, n_shards: int | None = None,
                mode: str = "overwrite") -> None:
    """Write a corpus frame back out as JSONL shards (interchange with
    non-Spark consumers; parquet via :mod:`sinks` remains the
    performance format).  ``n_shards`` caps the file count the same way
    a trainer's loader expects."""
    out = df.repartition(n_shards) if n_shards else df
    out.write.mode(mode).json(path)
