"""Learned quality filtering: a fastText-style hashed-bag-of-ngrams
linear classifier (Joulin et al. 2017, "Bag of Tricks for Efficient
Text Classification") as pure built-in expressions — the standard
model-based document scorer a curation funnel runs after the heuristic
gates (doc_quality / Gopher repetition / CCNet cross-entropy).

The model here is a FIXED closed-form weight table
(``w(b) = (b·2654435761) % 2001 − 1000``, Knuth's multiplicative
constant as the seed) so the scorer is fully deterministic and
oracle-checkable; a production deployment replaces the closed form
with trained weights as an ``n_buckets``-row broadcast dimension and
the plan shape is unchanged.  Registry twin: the dual-dialect
``_doc_quality_classifier_sql`` (driver-verified hash-exact), whose
expressions this module mirrors term for term.

At 100 TB: one tokenize pass (a single index explosion yields BOTH the
unigram and the bigram at each position), a codegen'd md5/arithmetic
projection, one partial-agg groupBy(doc_id) — the same linear-scan
shape as doc_stats.  No UDF, no shuffle beyond the final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def classifier_scores(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      n_buckets: int = 1024) -> DataFrame:
    """Score each document with the hashed-ngram linear model.

    Returns ``(id, n_ngrams, quality_logit, keep)`` where
    ``quality_logit = Σ w(bucket(ngram)) / (1000·n_ngrams)`` (the mean
    weight on the rational ±1 scale) and ``keep = 1`` iff the logit is
    positive.  All-integer accumulation — the one double division is
    the final normalization, so scores are bit-stable across engines
    and partitionings."""
    w = F.split(
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), " +", " "),
        " ",
    )
    tok = df.select(F.col(id_col), w.alias("w"))
    expd = tok.select(
        id_col, "w", F.explode(F.expr("sequence(1, size(w))")).alias("i")
    )
    ngs = expd.select(
        id_col,
        F.explode(F.expr(
            "array(element_at(w, i), "
            "IF(i < size(w), "
            "concat(element_at(w, i), ' ', element_at(w, i + 1)), "
            "NULL))"
        )).alias("ng"),
    ).where("ng IS NOT NULL AND ng != ''")
    wgt = ngs.select(
        id_col,
        F.expr(
            f"((CAST(conv(substr(md5(ng), 1, 3), 16, 10) AS BIGINT)"
            f" % {n_buckets}) * 2654435761) % 2001 - 1000"
        ).alias("wgt"),
    )
    return wgt.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        (F.sum("wgt").cast("double")
         / (F.lit(1000.0) * F.count(F.lit(1)))).alias("quality_logit"),
        F.when(F.sum("wgt") > 0, 1).otherwise(0).alias("keep"),
    )


def weight_table(spark, n_buckets: int = 1024) -> DataFrame:
    """The classifier model AS A DIMENSION: ``(bucket, wgt)`` rows —
    here generated from the closed form so the table variant is
    bit-equal to :func:`classifier_scores` (pytest-pinned); a real
    deployment loads TRAINED weights with this schema and nothing else
    changes.  At any realistic size (fastText default 2M buckets ×
    8 bytes) the table broadcasts."""
    return spark.range(n_buckets).selectExpr(
        "id AS bucket", "(id * 2654435761) % 2001 - 1000 AS wgt")


def classifier_scores_table(df: DataFrame, weights: DataFrame,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            n_buckets: int = 1024) -> DataFrame:
    """:func:`classifier_scores` with the weights joined from a
    ``weights`` dimension (``bucket BIGINT, wgt BIGINT``) instead of
    computed inline — the production shape for trained models.  The
    join is an explicit broadcast hash join on ``bucket`` (plan-gated),
    so the corpus-side plan is unchanged: one tokenize pass, one
    partial-agg exchange.  Unseen buckets (absent rows) contribute
    weight 0 — the sparse-model convention."""
    w = F.split(
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), " +", " "),
        " ",
    )
    tok = df.select(F.col(id_col), w.alias("w"))
    expd = tok.select(
        id_col, "w", F.explode(F.expr("sequence(1, size(w))")).alias("i")
    )
    ngs = expd.select(
        id_col,
        F.explode(F.expr(
            "array(element_at(w, i), "
            "IF(i < size(w), "
            "concat(element_at(w, i), ' ', element_at(w, i + 1)), "
            "NULL))"
        )).alias("ng"),
    ).where("ng IS NOT NULL AND ng != ''")
    bucketed = ngs.select(
        id_col,
        F.expr(
            f"CAST(conv(substr(md5(ng), 1, 3), 16, 10) AS BIGINT)"
            f" % {n_buckets}"
        ).alias("bucket"),
    )
    joined = bucketed.join(F.broadcast(weights), "bucket", "left") \
        .withColumn("wgt", F.coalesce("wgt", F.lit(0)))
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        (F.sum("wgt").cast("double")
         / (F.lit(1000.0) * F.count(F.lit(1)))).alias("quality_logit"),
        F.when(F.sum("wgt") > 0, 1).otherwise(0).alias("keep"),
    )


def quality_filter(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   n_buckets: int = 1024) -> DataFrame:
    """The corpus with model-REJECTED documents removed: an anti-join
    of the input against the classifier's explicit rejections — the
    shape a funnel composes between decontamination and landing.

    Anti-join against ``keep = 0`` rather than semi-join against
    ``keep = 1``: a document that produces ZERO ngrams (empty /
    whitespace-only / NULL text) has no ``classifier_scores`` row at
    all — the model never scored it, so this filter must not silently
    remove it (length-based gates like ``doc_quality`` own that
    decision).  Only documents the model explicitly rejected drop.

    NULL ``id_col`` rows follow the same retention rule by the same
    mechanism: a NULL id never equi-matches in the anti-join, so such
    rows are always RETAINED here (under the old semi-join spelling
    they were dropped).  This is deliberate — a NULL id is an identity
    problem, not a quality verdict, and identity hygiene belongs to the
    ingest/validation layer (``corpus_ingest_jsonl`` quarantines,
    ``validation.expect_unique_keys``), not a quality gate."""
    rejected = classifier_scores(df, text_col, id_col, n_buckets) \
        .where("keep = 0").select(id_col)
    return df.join(rejected, id_col, "anti")
