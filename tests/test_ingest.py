"""JSONL ingestion: malformed lines quarantine, never abort, roundtrip."""

from __future__ import annotations

import json

import pytest

from petropandas_spark.pipeline import ingest


@pytest.fixture()
def shard(tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "source": "web", "lang": "en",
                    "text": "hello world"}),
        json.dumps({"doc_id": 2, "source": "web", "lang": "de",
                    "text": "hallo welt"}),
        '{"doc_id": 3, "source": "web", "lang": "en", "text": "trunca',
        "not json at all",
        json.dumps({"doc_id": 4, "source": "books", "lang": "en",
                    "text": "fine"}),
    ]
    p = tmp_path / "shard.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_malformed_lines_quarantine_not_abort(spark, shard):
    good, quarantine = ingest.read_jsonl(spark, shard)
    g = {r.doc_id for r in good.collect()}
    assert g == {1, 2, 4}
    q = [r.raw_line for r in quarantine.collect()]
    assert len(q) == 2
    # the raw line survives verbatim for a fix-up pass
    assert any(l.startswith('{"doc_id": 3') for l in q)
    assert "not json at all" in q
    # one scan feeds both frames; neither side shuffles or runs Python
    for df in (good, quarantine):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        for py_stage in ("ArrowEvalPython", "BatchEvalPython",
                         "MapInPandas"):
            assert py_stage not in plan


def test_type_drifted_objects_quarantine(spark, tmp_path):
    """The pinned drift contract (r8 advisor finding): a PARSEABLE
    object whose non-STRING field carries an uncoercible token
    quarantines the WHOLE line (raw text kept for fix-up) — from_json's
    strict typing rejects string/float/bool/object tokens for BIGINT;
    STRING fields accept any token (stringified); missing/null fields
    are NOT drift."""
    lines = [
        '{"doc_id": 1, "source": "web", "lang": "en", "text": "ok"}',
        '{"doc_id": "abc", "source": "web", "lang": "en", "text": "x"}',
        '{"doc_id": "123", "source": "web", "lang": "en", "text": "x"}',
        '{"doc_id": 2.5, "source": "web", "lang": "en", "text": "x"}',
        '{"doc_id": {"n": 1}, "source": "web", "lang": "en", "text": "x"}',
        '{"doc_id": 2, "source": 7, "lang": "en", "text": "x"}',
        '{"doc_id": null, "lang": "en"}',
        '{"doc_id": 99999999999999999999}',
    ]
    p = tmp_path / "drift.jsonl"
    p.write_text("\n".join(lines) + "\n")
    good, quarantine = ingest.read_jsonl(spark, str(p))
    g = {r.doc_id: r.source for r in good.collect()}
    # 1 clean, 2 with a stringified numeric source, None-keyed null row
    assert g == {1: "web", 2: "7", None: None}
    q = sorted(r.raw_line for r in quarantine.collect())
    assert len(q) == 5
    assert all(l.startswith('{"doc_id": ') for l in q)
    assert not any('"doc_id": 1,' in l or '"doc_id": 2,' in l for l in q)


def test_strict_json_pins_and_engine_defined_edges(spark, tmp_path):
    """The r10 parser-strictness contract (r9 advisor finding), both
    halves:

    PINNED (cross-engine agreed, in the committed fixture): a
    single-quoted object is NOT JSON (allowSingleQuotes=false →
    quarantine); an object followed by trailing garbage fails the
    end-with-'}' structural guard (Jackson alone would parse the first
    root object and silently accept) → quarantine; a NaN doc_id token
    quarantines as type drift.

    PINNED since r11 (r10 ADVICE — the one leniency that DISCARDED
    user bytes): two concatenated root objects end with '}' so the
    structural guard passes and Jackson would silently keep only the
    FIRST root — the exactly-one-root probe ('[' line ']' must parse
    as an array) now quarantines them, agreeing with yyjson.  A '}{'
    INSIDE a string literal must NOT trip the probe (the regex is only
    a prefilter; the parser issues the verdict).

    ENGINE-DEFINED (documented at _parse_split, kept OUT of the pinned
    fixture — this test pins OUR side's placement so a silent behavior
    change surfaces): trailing comma → Jackson rejects → quarantine
    here (a lenient yyjson reader calls it good); lone surrogate
    escape → Jackson accepts → GOOD here (yyjson rejects)."""
    lines = [
        '{"doc_id": 1, "source": "web", "lang": "en", "text": "ok"}',
        # pinned strictness
        "{'doc_id': 2, 'text': 'single quotes'}",
        '{"doc_id": 3, "text": "trailing"} garbage',
        '{"doc_id": NaN, "text": "nan token"}',
        '{"doc_id": 5, "text": "first"}{"doc_id": 6, "text": "second"}',
        '{"doc_id": 8, "text": "brace pair }{ inside a string"}',
        '{"doc_id": 9, "text": "first"} {"doc_id": 10, "text": "ws gap"}',
        # engine-defined edges (our side pinned)
        '{"doc_id": 4, "text": "trailing comma",}',
        '{"doc_id": 7, "text": "lone surrogate \\ud800"}',
    ]
    p = tmp_path / "strict.jsonl"
    p.write_text("\n".join(lines) + "\n")
    good, quarantine = ingest.read_jsonl(spark, str(p))
    g = {r.doc_id for r in good.collect()}
    q = [r.raw_line for r in quarantine.collect()]
    assert g == {1, 7, 8}
    assert len(q) == 6
    assert any(l.startswith("{'doc_id': 2") for l in q)   # single quotes
    assert any(l.endswith("} garbage") for l in q)        # trailing bytes
    assert any("NaN" in l for l in q)                     # drifted token
    assert any(l.endswith(',}') for l in q)               # trailing comma
    assert any('"doc_id": 5' in l for l in q)             # multi-root
    assert any('"doc_id": 9' in l for l in q)             # multi-root + ws


def test_good_frame_feeds_the_pipeline(spark, shard):
    """The ingested frame drops straight into the corpus operators."""
    from petropandas_spark.pipeline import dedup

    good, _ = ingest.read_jsonl(spark, shard)
    fp = dedup.exact_duplicates(good, text_col="text", id_col="doc_id")
    assert fp.count() == 3  # one row per doc, no duplicate texts


def test_jsonl_roundtrip(spark, shard, tmp_path):
    good, _ = ingest.read_jsonl(spark, shard)
    out = str(tmp_path / "out")
    ingest.write_jsonl(good, out, n_shards=2)
    back, quarantine = ingest.read_jsonl(spark, out + "/*.json")
    assert quarantine.count() == 0
    a = {tuple(r) for r in good.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_streaming_twin_matches_batch(spark, shard, tmp_path):
    """read_jsonl_stream: same split per micro-batch; a malformed line
    must not kill the stream."""
    good, quarantine = ingest.read_jsonl_stream(
        spark, shard.rsplit("/", 1)[0])
    gq = (good.writeStream.format("memory").queryName("ing_good")
          .outputMode("append")
          .option("checkpointLocation", str(tmp_path / "ck1")).start())
    qq = (quarantine.writeStream.format("memory").queryName("ing_bad")
          .outputMode("append")
          .option("checkpointLocation", str(tmp_path / "ck2")).start())
    try:
        gq.processAllAvailable()
        qq.processAllAvailable()
        got = {r.doc_id for r in spark.sql(
            "SELECT doc_id FROM ing_good").collect()}
        bad = spark.sql("SELECT raw_line FROM ing_bad").count()
    finally:
        gq.stop()
        qq.stop()
    assert got == {1, 2, 4}
    assert bad == 2
