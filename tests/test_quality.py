"""Learned quality classifier (pipeline/quality.py): the library
scorer must equal the dual-dialect SQL anchor bit-for-bit (that anchor
is what the DuckDB driver oracle re-derives), and the filter must be a
semi-join that keeps exactly the keep=1 documents."""

from __future__ import annotations

import pytest

from petropandas_spark.pipeline.quality import (
    classifier_scores,
    quality_filter,
)
from petropandas_spark.registry import _doc_quality_classifier_sql

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_classifier_library_equals_sql_anchor(spark, docs):
    lib = classifier_scores(docs).orderBy("doc_id").collect()
    docs.createOrReplaceTempView("documents")
    try:
        sql = spark.sql(
            _doc_quality_classifier_sql(False)
        ).orderBy("doc_id").collect()
    finally:
        spark.catalog.dropTempView("documents")
    assert lib == sql
    assert len(lib) > 0


def test_classifier_score_contract(docs):
    rows = classifier_scores(docs).collect()
    for r in rows:
        assert -1.0 <= r["quality_logit"] <= 1.0  # mean of ±1000/1000
        assert r["keep"] == (1 if r["quality_logit"] > 0 else 0)
        assert r["n_ngrams"] >= 1


def test_classifier_edge_texts(spark):
    """Empty / all-space texts produce no ngrams and drop out; a
    single-word doc scores on its unigram alone; leading/trailing
    spaces do not change the score (the r11 empty-token lesson)."""
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "  hello   world  "), (3, ""),
         (4, "   "), (5, "solo")],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: (r["n_ngrams"], r["quality_logit"])
           for r in classifier_scores(df).collect()}
    assert set(got) == {1, 2, 5}
    assert got[1] == got[2]  # whitespace-normalization invariance
    assert got[5][0] == 1  # one unigram, no bigram


def test_classifier_table_variant_bit_equal_and_broadcast(spark, docs):
    """The trained-weights production shape: joining the weights as a
    broadcast dimension must be bit-equal to the inline closed form,
    plan a BroadcastHashJoin, and keep the corpus side at one scan."""
    from petropandas_spark.pipeline.quality import (
        classifier_scores_table,
        weight_table,
    )

    tbl = classifier_scores_table(docs, weight_table(spark))
    assert tbl.orderBy("doc_id").collect() == \
        classifier_scores(docs).orderBy("doc_id").collect()
    plan = tbl._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert plan.count("Scan parquet") == 1  # executed plan: tree only


def test_classifier_table_unseen_buckets_weight_zero(spark):
    """A sparse model (missing bucket rows) scores unseen ngrams 0 —
    never NULL-poisons the per-doc sum."""
    from petropandas_spark.pipeline.quality import classifier_scores_table

    df = spark.createDataFrame([(1, "hello world")],
                               "doc_id LONG, text STRING")
    empty = spark.createDataFrame([], "bucket BIGINT, wgt BIGINT")
    rows = classifier_scores_table(df, empty).collect()
    assert rows[0]["quality_logit"] == 0.0
    assert rows[0]["keep"] == 0


def test_quality_filter_semi_join(docs):
    scores = classifier_scores(docs)
    n_keep = scores.where("keep = 1").count()
    kept = quality_filter(docs)
    assert kept.count() == n_keep
    assert kept.columns == docs.columns
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quality_filter_keeps_unscored_docs(spark, docs):
    """A zero-ngram document (empty / whitespace / NULL text) has no
    classifier_scores row — the model never scored it, so the filter
    must NOT silently remove it (only explicit keep=0 rejections drop).
    Pinned per the r12 advisory."""
    extra = spark.createDataFrame(
        [(900001, ""), (900002, "     "), (900003, None)],
        "doc_id LONG, text STRING")
    augmented = docs.select("doc_id", "text").unionByName(extra)
    scored_ids = {r["doc_id"]
                  for r in classifier_scores(augmented).collect()}
    assert not scored_ids & {900001, 900002, 900003}
    kept_ids = {r["doc_id"] for r in quality_filter(augmented).collect()}
    assert {900001, 900002, 900003} <= kept_ids
    rejected = {r["doc_id"] for r in
                classifier_scores(augmented).where("keep = 0").collect()}
    assert kept_ids == ({r["doc_id"] for r in augmented.collect()}
                        - rejected)
