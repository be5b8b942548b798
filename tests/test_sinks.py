"""Corpus sink layout tests: partition pruning, shard determinism, AQE
skew-join handling."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from petropandas_spark.pipeline import sinks

SF = "/root/testdata/sf0.001"


def _plan(df, mode="formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_partitioned_write_prunes_on_read(spark, docs, tmp_path):
    path = str(tmp_path / "by_lang")
    sinks.write_partitioned(docs, path, ["lang"])
    # one directory per language
    langs = {d for d in os.listdir(path) if d.startswith("lang=")}
    n_langs = docs.select("lang").distinct().count()
    assert len(langs) == n_langs
    back = sinks.read_partition_pruned(spark, path, lang="en")
    plan = _plan(back)
    # the filter must be a partition filter on the scan, not a row filter
    assert "PartitionFilters: [" in plan and "lang" in plan.split(
        "PartitionFilters:"
    )[1].splitlines()[0]
    assert back.count() == docs.filter("lang = 'en'").count()


def test_sharded_write_is_deterministic(spark, docs, tmp_path):
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    sinks.write_sharded(docs, p1, "doc_id", n_shards=4,
                        sort_within=["doc_id"])
    # second run with different session parallelism: same membership
    sinks.write_sharded(docs.repartition(13), p2, "doc_id", n_shards=4,
                        sort_within=["doc_id"])

    def membership(path):
        files = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet")
        )
        out = {}
        for i, f in enumerate(files):
            for r in spark.read.parquet(os.path.join(path, f)).collect():
                out[r.doc_id] = i
        return len(files), out

    n1, m1 = membership(p1)
    n2, m2 = membership(p2)
    assert n1 == n2
    # same doc -> same shard file index regardless of input partitioning
    assert m1 == m2


def test_sharded_write_caps_records_per_file(spark, docs, tmp_path):
    path = str(tmp_path / "capped")
    sinks.write_sharded(docs, path, "doc_id", n_shards=2,
                        max_records_per_file=10)
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            n = spark.read.parquet(os.path.join(path, f)).count()
            assert n <= 10


def test_aqe_splits_skewed_join(spark):
    """With AQE skew handling on, a pathologically skewed sort-merge join
    must show skew=true partitions in the final adaptive plan."""
    skew_conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in skew_conf}
    for k, v in skew_conf.items():
        spark.conf.set(k, v)
    try:
        # ~95% of 200k rows land on key 7 (data-dependent, so the
        # optimizer cannot constant-fold the join key away)
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7))
            .otherwise(F.col("id") % 100).alias("k"),
            F.col("id").alias("v"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        dim = spark.range(100).select(
            F.col("id").alias("k"), F.col("id").alias("w")
        )
        # no agg after the join: OptimizeSkewedJoin declines to split a
        # partition whose output distribution a downstream exchange
        # still requires (that case needs forceOptimizeSkewedJoin)
        joined = fact.join(dim, "k").select("k", "v", "w")
        # drive THIS DataFrame's AdaptiveSparkPlan to its final form
        # (count()/write would execute a separate QueryExecution)
        assert len(joined.collect()) == 200_000
        final = _plan(joined, "simple")
        assert "skew=true" in final
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_jsonl_roundtrip_with_corrupt_row(spark, tmp_path):
    """JSONL ingest: explicit schema (no inference scan), malformed rows
    routed to _corrupt_record instead of failing the job."""
    from petropandas_spark.pipeline import sinks

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en"}\n'
        '{"doc_id": 2, "text": "bonjour", "lang": "fr"}\n'
        "{not json at all\n"
    )
    df = sinks.read_jsonl_documents(
        spark, str(p),
        "doc_id BIGINT, text STRING, lang STRING, _corrupt_record STRING",
    )
    rows = df.collect()
    good = [r for r in rows if r["doc_id"] is not None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 2 and len(bad) == 1
    assert {r["lang"] for r in good} == {"en", "fr"}


def test_compact_parquet_reduces_files(spark, tmp_path):
    """Compaction rewrites a many-small-files landing into the byte-sized
    file count and preserves every row."""
    import os

    from petropandas_spark.pipeline import sinks

    src = str(tmp_path / "landing")
    dst = str(tmp_path / "compacted")
    spark.range(20000).selectExpr(
        "id", "repeat('x', 50) AS pad"
    ).repartition(64).write.parquet(src)
    n_src = sum(f.endswith(".parquet") for f in os.listdir(src))
    sinks.compact_parquet(spark, src, dst, target_file_mb=512)
    n_dst = sum(f.endswith(".parquet") for f in os.listdir(dst))
    assert n_src == 64 and n_dst == 1
    assert spark.read.parquet(dst).count() == 20000


def test_backfill_overwrites_only_touched_partitions(spark, tmp_path):
    """Dynamic partition overwrite: re-running one partition's job must
    not truncate the others (idempotent backfill contract)."""
    from pyspark.sql import functions as F

    from petropandas_spark.pipeline import sinks

    path = str(tmp_path / "corpus")
    base = spark.createDataFrame(
        [(1, "en", "a"), (2, "fr", "b"), (3, "de", "c")],
        "doc_id BIGINT, lang STRING, text STRING",
    )
    sinks.write_partitioned(base, path, ["lang"])

    fix = spark.createDataFrame(
        [(2, "fr", "b-corrected"), (4, "fr", "d-new")],
        "doc_id BIGINT, lang STRING, text STRING",
    )
    sinks.backfill_partitions(fix, path, ["lang"])

    got = {
        (r["doc_id"], r["lang"], r["text"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        (1, "en", "a"), (3, "de", "c"),          # untouched partitions
        (2, "fr", "b-corrected"), (4, "fr", "d-new"),  # rewritten one
    }


class TestZorderLayout:
    def test_zorder_value_matches_python_reference(self, spark):
        from petropandas_spark.pipeline.layout import quantize, zorder_value

        df = spark.createDataFrame(
            [(i, float(i * 37 % 100)) for i in range(64)], "a INT, b DOUBLE")
        got = df.select(
            "a", "b",
            quantize("a", 0, 64, 8).alias("qa"),
            quantize("b", 0, 100, 8).alias("qb"),
        ).withColumn(
            "z", zorder_value(F.col("qa"), F.col("qb"), bits=8)
        ).collect()

        def interleave(x, y, bits=8):
            z = 0
            for i in range(bits):
                z |= ((x >> i) & 1) << (2 * i)
                z |= ((y >> i) & 1) << (2 * i + 1)
            return z

        for r in got:
            qa = min(int((min(max(r.a, 0), 64) / 64) * 256), 255)
            qb = min(int((min(max(r.b, 0.0), 100.0) / 100.0) * 256), 255)
            assert (r.qa, r.qb) == (qa, qb)
            assert r.z == interleave(qa, qb)

    def test_zordered_write_tightens_file_minmax_boxes(self, spark, tmp_path):
        """The data-skipping claim, measured: per-file (user_id × value)
        bounding-box area under the z-ordered layout must be a fraction
        of the round-robin layout's (tight min/max stats = skippable
        files)."""
        from petropandas_spark.pipeline.layout import quantize, zorder_value

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
            .select("event_id", "user_id", "value")
        z = zorder_value(quantize("user_id", 0, 2000, 16),
                         quantize("value", 0, 1000, 16))

        def total_area(path):
            back = spark.read.parquet(path).withColumn(
                "f", F.input_file_name())
            rows = back.groupBy("f").agg(
                (F.max("user_id") - F.min("user_id")).alias("du"),
                (F.max("value") - F.min("value")).alias("dv"),
            ).collect()
            return sum(r.du * r.dv for r in rows)

        from petropandas_spark.pipeline.layout import write_zordered

        zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
        write_zordered(ev, zpath, z, n_files=8)
        ev.repartition(8).write.parquet(rpath)
        az, ar = total_area(zpath), total_area(rpath)
        # round-robin files each span ~the whole domain; z-ordered files
        # cover disjoint curve segments
        assert az < ar * 0.5, (az, ar)
