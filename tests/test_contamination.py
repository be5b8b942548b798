"""Contamination detection: brute-force equivalence + plan shape."""

from __future__ import annotations

import pytest

from petropandas_spark.pipeline import contamination


def _plan(df, mode="simple") -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def _py_ngrams(text: str, n: int) -> set[str]:
    toks = text.lower().split()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "completely unrelated content about mineral chemistry and spark"),
    (3, "eval question one asks about the quick brown fox jumps over"),
    (4, "short doc"),
]
EVAL = [
    (100, "quiz: the quick brown fox jumps over the lazy dog answer"),
    (101, "what is the capital of france paris obviously everyone knows"),
]


@pytest.fixture(scope="module")
def frames(spark):
    c = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    e = spark.createDataFrame(EVAL, ["doc_id", "text"])
    return c, e


def test_matches_bruteforce(frames):
    c, e = frames
    n = 5
    eval_grams: dict[int, set[str]] = {
        i: _py_ngrams(t, n) for i, t in EVAL
    }
    expected = {}
    for i, t in CORPUS:
        grams = _py_ngrams(t, n)
        shared = set().union(
            *[grams & g for g in eval_grams.values()]
        ) if eval_grams else set()
        hit = {j for j, g in eval_grams.items() if grams & g}
        if shared:
            expected[i] = (len(shared), len(hit))
    got = {
        r.doc_id: (r.n_shared_ngrams, r.n_eval_docs_hit)
        for r in contamination.contaminated_docs(c, e, n=n).collect()
    }
    assert got == expected
    assert 1 in got and 2 not in got  # planted overlap found, clean doc kept


def test_short_docs_produce_no_ngrams(frames):
    c, _ = frames
    out = contamination.ngram_hashes(c, n=5)
    assert out.filter("doc_id = 4").count() == 0


def test_decontaminate_removes_only_contaminated(frames):
    c, e = frames
    kept = {r.doc_id for r in
            contamination.decontaminate(c, e, n=5).collect()}
    bad = {r.doc_id for r in
           contamination.contaminated_docs(c, e, n=5).collect()}
    assert kept == {i for i, _ in CORPUS} - bad


def test_collision_join_broadcasts_eval_side(frames):
    c, e = frames
    plan = _plan(contamination.contaminated_docs(c, e, n=5))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # hot path stays codegen'd: no interpreted higher-order lambdas
    assert "lambdafunction" not in _plan(
        contamination.ngram_hashes(c, n=5), "formatted"
    ).lower()


def test_gram_size_probe_memoized_per_plan(frames):
    """The __n probe is a one-row driver action; per-micro-batch callers
    (decontaminate_ingest_stream) must pay it once per eval plan, not
    once per call — the second contaminated_docs over the same frame
    must answer from the cache without touching the data."""
    c, e = frames
    contamination._GRAM_N_CACHE.clear()
    eh = contamination.eval_ngram_hashes(e, n=5)
    contamination.contaminated_docs(c, n=5, eval_hashes=eh).collect()
    assert len(contamination._GRAM_N_CACHE) == 1
    # poison head() so any re-probe of the data is loud
    import pyspark.sql

    orig = pyspark.sql.DataFrame.head
    def boom(self, *a, **k):  # noqa: ANN001
        raise AssertionError("probe re-ran despite cache")
    pyspark.sql.DataFrame.head = boom
    try:
        contamination.contaminated_docs(c, n=5, eval_hashes=eh).collect()
        # the mismatch guard still fires from the cached value
        with pytest.raises(ValueError, match="built with"):
            contamination.contaminated_docs(c, n=7, eval_hashes=eh)
    finally:
        pyspark.sql.DataFrame.head = orig


def test_gram_size_cache_invalidates_on_file_rewrite(spark, frames,
                                                     tmp_path):
    """A stale cached gram size DEFEATS the n-mismatch guard (silently
    matches nothing — contaminated docs sail through), so rewriting the
    eval_hashes file at the same path with a different gram size must
    re-probe: the cache key carries the input-file fingerprint, not just
    the path-based semanticHash."""
    _, e = frames
    p = str(tmp_path / "eval_hashes.parquet")
    contamination.clear_gram_size_cache()
    contamination.eval_ngram_hashes(e, n=5).write.mode(
        "overwrite").parquet(p)
    eh1 = spark.read.parquet(p)
    assert contamination._probe_gram_size(eh1) == 5
    # same path, different gram size — a long-lived driver scenario
    contamination.eval_ngram_hashes(e, n=3).write.mode(
        "overwrite").parquet(p)
    eh2 = spark.read.parquet(p)
    assert contamination._probe_gram_size(eh2) == 3
