"""Data validation & profiling — Deequ-style single-pass checks.

At 100 TB the only affordable shape for data-quality verification is ONE
aggregate job per table: every metric and every constraint is expressed
as an aggregate expression, Catalyst fuses them into a single scan with
map-side partials, and the result is one row.  N separate "check" jobs
that each rescan the table are N× the IO for zero extra information.

Two public surfaces:

* :func:`profile` — per-column statistics (rows, nulls, distinct,
  min/max) in long format.  ``approx=True`` swaps exact
  ``COUNT(DISTINCT)`` (which shuffles every distinct value — fine at
  test SF, expensive at 100 TB) for HyperLogLog++
  ``approx_count_distinct`` whose state is O(1) per column.
* :func:`check` — declarative constraints (not-null, unique, range,
  set-membership, regex, cross-field SQL predicates), all folded into
  the same single aggregate; returns violation counts per constraint.

The registered query surface (``documents_profile``,
``documents_constraints`` in ``registry.py``) carries the same
semantics as shared Spark/DuckDB SQL so the driver's oracle can verify
them hash-exactly — everything is integer counts, no FP-order hazard.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile(df: DataFrame, cols: list[str] | None = None,
            approx: bool = False) -> DataFrame:
    """Per-column profile in long format:
    ``(col, n_rows, n_nulls, n_distinct, min_v, max_v)`` — min/max as
    BIGINT for integral columns, NULL otherwise.

    Single Aggregate job: all metrics for all columns are computed in
    one scan (exact-distinct adds Catalyst's Expand for the per-column
    distinct streams; ``approx=True`` keeps it a plain one-pass partial
    aggregate and is the 100 TB default).
    """
    cols = cols or df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(
            (F.approx_count_distinct(c) if approx
             else F.count_distinct(F.col(c))).alias(f"nd_{c}")
        )
        if isinstance(fields[c], (T.ByteType, T.ShortType,
                                  T.IntegerType, T.LongType)):
            aggs.append(F.min(c).cast("long").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("long").alias(f"mx_{c}"))
        else:
            aggs.append(F.lit(None).cast("long").alias(f"mn_{c}"))
            aggs.append(F.lit(None).cast("long").alias(f"mx_{c}"))
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in cols
    )
    return one.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack}) AS (col, nn, nd, mn, mx)",
    ).selectExpr(
        "col", "n_rows",
        "n_rows - nn AS n_nulls",
        "nd AS n_distinct",
        "mn AS min_v", "mx AS max_v",
    )


@dataclass(frozen=True)
class Constraint:
    """One named constraint compiled to an aggregate violation count."""
    name: str
    violation: "F.Column"  # boolean column: True = row violates


def not_null(col: str) -> Constraint:
    return Constraint(f"not_null_{col}", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Constraint:
    c = F.col(col)
    return Constraint(f"in_range_{col}",
                      c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))))


def accepted_values(col: str, values: list) -> Constraint:
    c = F.col(col)
    return Constraint(f"accepted_values_{col}",
                      c.isNotNull() & ~c.isin(values))


def matches(col: str, regex: str) -> Constraint:
    c = F.col(col)
    return Constraint(f"matches_{col}",
                      c.isNotNull() & ~c.rlike(regex))


def satisfies(name: str, predicate_sql: str) -> Constraint:
    """Cross-field predicate, e.g. ``n_chars = length(text)`` — the
    violation is its negation (NULL-safe: NULL predicate counts as a
    violation, matching SQL's failed-check semantics)."""
    return Constraint(name,
                      ~F.coalesce(F.expr(predicate_sql), F.lit(False)))


def unique(col: str) -> Constraint:
    # marker — handled via count vs count_distinct in check()
    return Constraint(f"unique_{col}", F.lit(None))


def check(df: DataFrame, constraints: list[Constraint]) -> dict[str, int]:
    """Run every constraint in ONE aggregate job; returns
    ``{constraint_name: violation_count}`` (0 = holds).  Uniqueness is
    folded into the same job as ``COUNT(col) - COUNT(DISTINCT col)``
    (over-count of duplicate rows beyond the first)."""
    aggs = []
    for k in constraints:
        if k.name.startswith("unique_"):
            col = k.name[len("unique_"):]
            aggs.append(
                (F.count(col) - F.count_distinct(F.col(col)))
                .alias(k.name)
            )
        else:
            aggs.append(
                F.sum(F.when(k.violation, 1).otherwise(0))
                .cast("long").alias(k.name)
            )
    row = df.agg(*aggs).first()
    return {k.name: int(row[k.name] or 0) for k in constraints}


def assert_valid(df: DataFrame, constraints: list[Constraint]) -> None:
    """Raise ``ValueError`` listing every violated constraint."""
    bad = {k: v for k, v in check(df, constraints).items() if v > 0}
    if bad:
        raise ValueError(f"constraint violations: {bad}")


# ---------------------------------------------------------------------------
# Word rarity — corpus-frequency quality score (unigram-LM stand-in)
# ---------------------------------------------------------------------------

def word_rarity(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document mean corpus frequency of its words — the integer
    cousin of unigram-LM perplexity (rare-word-heavy docs score low,
    boilerplate scores high).  Returns
    ``(doc_id, n_tokens, sum_freq, avg_word_freq)``.

    Scale shape (the production path; the registered SQL mirrors the
    semantics but lets each engine plan it):

    1. tokenize → per-(doc, word) counts ``c`` — map-side combinable,
       and it shrinks the join input from token *occurrences* to
       distinct (doc, word) pairs (a big factor on natural text where
       stopwords repeat).
    2. corpus count per word as a WINDOW sum over the pair table
       (``SUM(c) OVER (PARTITION BY w)``) instead of a
       vocab-build + self-join — the naive two-branch join recomputes
       the tokenize scan (ReuseExchange does not canonicalize the two
       aggregate branches together), whereas the window keeps the
       whole job one linear pipeline: ONE scan, three exchanges,
       asserted in ``test_plan_quality.py``.
    3. re-aggregate per doc: ``sum(c)`` tokens, ``sum(c * cnt)``
       weighted frequency.  All BIGINT — exact under any partitioning.

    Skew note: the window's ``PARTITION BY w`` concentrates a
    universal stopword's pairs (≤ one per document) in one partition.
    If a single word's pair count outgrows a partition at extreme
    scale, swap stage 2 for the vocab equi-join + AQE skew split; at
    the pair-table sizes the collapse in stage 1 produces, the window
    is the faster plan.
    """
    from pyspark.sql import Window

    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " +")).alias("w"),
    )
    pairs = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    win = pairs.withColumn("cnt", F.sum("c").over(Window.partitionBy("w")))
    return (win.groupBy("doc_id")
            .agg(F.sum("c").alias("n_tokens"),
                 F.sum(F.col("c") * F.col("cnt")).alias("sum_freq"))
            .withColumn(
                "avg_word_freq",
                F.col("sum_freq").cast("double")
                / F.col("n_tokens").cast("double")))
