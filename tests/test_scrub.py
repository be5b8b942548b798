"""PII scrubbing on planted fixtures (the synthetic corpus carries no
PII, so correctness is asserted on constructed rows)."""

from __future__ import annotations

import pytest

from petropandas_spark.pipeline import scrub

ROWS = [
    (1, "contact me at jane.doe+spam@example.co.uk for details"),
    (2, "call 555-123-4567 or +1 (408) 555-1234 tomorrow"),
    (3, "server at 192.168.1.100 responded; pi is 3.14159 though"),
    (4, "nothing sensitive here, just the number 42 and year 2024"),
    (5, "mixed: bob@corp.io, 650-555-0199, and 10.0.0.1 in one line"),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text"])


def test_scrub_masks_each_category(df):
    out = {r.doc_id: r.text for r in scrub.scrub_pii(df).collect()}
    assert "|||EMAIL|||" in out[1] and "jane" not in out[1]
    assert out[2].count("|||PHONE|||") == 2 and "4567" not in out[2]
    assert "|||IP|||" in out[3] and "192.168" not in out[3]
    # pi survives the IP pattern; plain integers survive the phone pattern
    assert "3.14159" in out[3]
    assert out[4] == ROWS[3][1]
    for token in ("|||EMAIL|||", "|||PHONE|||", "|||IP|||"):
        assert token in out[5]


def test_scrub_category_selection(df):
    out = {r.doc_id: r.text
           for r in scrub.scrub_pii(df, categories=["email"]).collect()}
    assert "|||EMAIL|||" in out[1]
    assert "555-123-4567" in out[2]  # phones untouched


def test_scrub_stats_counts(df):
    got = {r.doc_id: (r.n_email, r.n_phone, r.n_ip)
           for r in scrub.scrub_stats(df).collect()}
    assert got[1] == (1, 0, 0)
    assert got[2] == (0, 2, 0)
    assert got[3] == (0, 0, 1)
    assert got[4] == (0, 0, 0)
    assert got[5] == (1, 1, 1)


def test_scrub_is_narrow_projection(df):
    out = scrub.scrub_pii(df)
    plan = out._jdf.queryExecution().explainString(
        out._sc._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("simple"))
    assert "Exchange" not in plan
    assert "Python" not in plan  # stays JVM-side
