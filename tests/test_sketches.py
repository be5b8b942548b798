"""Accuracy contracts for the sketch layer (pipeline/sketches.py) — each
approximate operator is checked against its exact counterpart on the
driver-generated testdata, with the error bound the sketch advertises."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from petropandas_spark.pipeline import sketches

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    from petropandas_spark.registry import _load

    # (_load reads the TIMESTAMP(NANOS) ts column as raw BIGINT)
    return _load(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "value"
    )


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


def test_hll_distinct_within_rsd(spark, events):
    approx = {
        r["event_type"]: r["approx_user_id"]
        for r in sketches.approx_distinct_by(
            events, ["event_type"], "user_id", rsd=0.02
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3 * 0.02 * n, 2.0), (k, approx[k], n)


def test_cms_heavy_hitters_overestimate_only(spark, lineitem):
    n_rows = lineitem.count()
    eps = 0.001
    est = sketches.heavy_hitters(lineitem, "l_partkey", k=5, eps=eps)
    exact = {
        r["l_partkey"]: r["cnt"]
        for r in lineitem.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "l_partkey").limit(50).collect()
    }
    assert len(est) == 5
    for value, est_count in est:
        true = exact.get(value)
        if true is None:
            continue  # candidate below exact top-50: bound still applies
        assert est_count >= true  # CMS never under-counts
        assert est_count <= true + eps * n_rows


def test_bloom_no_false_negatives_and_fpp(spark, lineitem):
    keys = spark.range(0, 500).select(F.col("id").alias("l_partkey"))
    kept = sketches.membership_filter(lineitem, keys, "l_partkey",
                                      fpp=0.01)
    exact = lineitem.join(keys, "l_partkey", "left_semi")
    # superset of the exact semi-join (no false negatives)
    assert kept.join(exact, "l_orderkey", "left_semi").count() \
        >= exact.count()
    missing = exact.join(kept, ["l_orderkey", "l_linenumber"],
                         "left_anti").count()
    assert missing == 0
    # false-positive rate near fpp: surviving non-members are rare
    extras = kept.join(keys, "l_partkey", "left_anti").count()
    non_members = lineitem.join(keys, "l_partkey", "left_anti").count()
    assert extras <= max(0.05 * non_members, 50)


def test_python_bloom_reader_matches_jvm(spark):
    """The Arrow-side evaluator of Spark's serialized BloomFilter must
    agree bit-for-bit with the JVM's own mightContainLong — members and
    random non-members alike."""
    import numpy as np

    from petropandas_spark.pipeline.sketches import (bloom_bits,
                                                     bloom_contains_long,
                                                     parse_bloom)

    keys = spark.range(0, 300).select((F.col("id") * 7).alias("k"))
    blob = bloom_bits(keys, "k", fpp=0.03)
    jbf = spark.sparkContext._jvm.org.apache.spark.util.sketch.\
        BloomFilter.readFrom(
            spark.sparkContext._jvm.java.io.ByteArrayInputStream(blob))
    version, num_hash, seed, words, bit_count = parse_bloom(blob)

    probe = np.array(
        [i * 7 for i in range(300)] + [3, 11, 5001, -17, 999983], np.int64
    )
    hit = bloom_contains_long(probe, version, num_hash, seed, words,
                              bit_count)
    for v, py in zip(probe.tolist(), hit.tolist()):
        assert py == jbf.mightContainLong(int(v)), v


def test_gk_quantiles_within_rank_error(spark, events):
    err = 0.01
    probs = [0.1, 0.5, 0.9, 0.99]
    approx = sketches.approx_quantiles(events, "value", probs, err)
    vals = sorted(r["value"] for r in events.select("value").collect())
    n = len(vals)
    for p, a in zip(probs, approx):
        # value must sit within +-err of the requested rank
        lo = vals[max(0, int((p - err) * n) - 1)]
        hi = vals[min(n - 1, int((p + err) * n) + 1)]
        assert lo <= a <= hi, (p, a, lo, hi)


def test_catalyst_injects_runtime_bloom_filter(spark, lineitem):
    """With runtime filtering on, a selective dim join gets a
    bloom_filter_agg subquery and the fact side is pruned before the
    exchange — same result, less shuffle volume."""
    confs = sketches.runtime_filter_confs(
        application_side_scan_threshold="0",
        creation_side_threshold="100MB",
    )
    old = {k: spark.conf.get(k, None) for k in confs}
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        pt = (spark.read.parquet(f"{SF}/part.parquet")
              .filter("p_size = 7"))
        j = (lineitem.join(pt, lineitem.l_partkey == pt.p_partkey)
             .groupBy("p_brand").agg(F.count(F.lit(1)).alias("n")))
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in optimized
        with_filter = {(r["p_brand"], r["n"]) for r in j.collect()}
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
    pt = spark.read.parquet(f"{SF}/part.parquet").filter("p_size = 7")
    j2 = (lineitem.join(pt, lineitem.l_partkey == pt.p_partkey)
          .groupBy("p_brand").agg(F.count(F.lit(1)).alias("n")))
    assert with_filter == {(r["p_brand"], r["n"]) for r in j2.collect()}


def test_bloom_pruned_semijoin_exact(spark, lineitem):
    """The bloom-pruned semi-join must equal the plain semi-join exactly
    (false positives killed by the verify join), with the pruning pass
    visible in the plan as the Arrow-vectorized filter stage."""
    orders = (spark.read.parquet(f"{SF}/orders.parquet")
              .where("o_orderpriority = '1-URGENT'").select("o_orderkey"))
    li = lineitem.select("l_orderkey", "l_quantity")
    got = sketches.bloom_pruned_semijoin(li, orders, "l_orderkey",
                                         "o_orderkey")
    expected = li.join(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        ["l_orderkey"], "left_semi",
    )
    assert got.count() == expected.count()
    assert (got.groupBy().sum("l_quantity").first()[0]
            == expected.groupBy().sum("l_quantity").first()[0])
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "FilterExec" in plan


def test_cms_verified_heavy_hitters_exact(spark, lineitem):
    """CMS candidates (guaranteed superset: CMS never undercounts) +
    exact verify must equal the sketch-free GROUP BY ... HAVING."""
    supp = spark.read.parquet(f"{SF}/supplier.parquet").select("s_suppkey")
    got = {
        (r["l_suppkey"], r["n_items"])
        for r in sketches.cms_verified_heavy_hitters(
            lineitem.select("l_suppkey"), "l_suppkey", supp, 640
        ).collect()
    }
    exact = {
        (r["l_suppkey"], r["n"])
        for r in lineitem.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n")).where("n >= 640").collect()
    }
    assert got == exact and len(got) > 0


def test_hll_sketch_columns_merge_losslessly(spark, events):
    """Incremental distinct counting: per-type sketches unioned must give
    EXACTLY the single-pass sketch estimate (hll_union_agg is lossless
    over sketch state), and the estimate must sit within HLL error of
    the exact count."""
    per_type = sketches.hll_sketch_by(events, ["event_type"], "user_id")
    merged = sketches.hll_merge_estimate(
        per_type, [], "hll_user_id"
    ).first()["distinct_est"]
    single = sketches.hll_merge_estimate(
        sketches.hll_sketch_by(events, [], "user_id"), [], "hll_user_id"
    ).first()["distinct_est"]
    assert merged == single
    exact = events.select("user_id").distinct().count()
    assert abs(merged - exact) / exact < 0.05


def test_cms_heavy_hitters_empty_candidates_ok(spark, lineitem):
    """An unreachable threshold must yield an empty frame (isin over an
    empty candidate list), not an error."""
    supp = spark.read.parquet(f"{SF}/supplier.parquet").select("s_suppkey")
    out = sketches.cms_verified_heavy_hitters(
        lineitem.select("l_suppkey"), "l_suppkey", supp, 10**9
    )
    assert out.count() == 0


def test_hll_sketch_column_survives_parquet_roundtrip(spark, events,
                                                      tmp_path):
    """The incremental scenario end-to-end: persist today's sketches,
    read them back in a later 'run', union with fresh sketches — the
    estimate must equal the all-data single pass."""
    half_a = events.where("event_id % 2 = 0")
    half_b = events.where("event_id % 2 = 1")
    store = str(tmp_path / "sketch_store")
    sketches.hll_sketch_by(half_a, ["event_type"], "user_id") \
        .write.parquet(store)
    merged = sketches.hll_merge_estimate(
        spark.read.parquet(store).unionByName(
            sketches.hll_sketch_by(half_b, ["event_type"], "user_id")
        ),
        [], "hll_user_id",
    ).first()["distinct_est"]
    single = sketches.hll_merge_estimate(
        sketches.hll_sketch_by(events, [], "user_id"), [], "hll_user_id"
    ).first()["distinct_est"]
    assert merged == single


def test_python_cms_reader_matches_jvm(spark):
    """The Python CountMinSketch reader must reproduce the JVM's
    estimateCount value-for-value (layout + stream-lib hash pinned)."""
    import numpy as np
    from pyspark.sql import functions as F

    df = spark.range(50000).selectExpr("CAST(id % 613 AS BIGINT) AS v")
    blob = bytes(df.agg(F.expr(
        "count_min_sketch(v, 0.001d, 0.99d, 42)"
    ).alias("s")).first()["s"])
    _, _, width, hash_a, table = sketches.parse_cms(blob)
    jvm_cms = spark.sparkContext._jvm.org.apache.spark.util.sketch.\
        CountMinSketch.readFrom(blob)
    probes = np.array(
        [0, 1, 5, 612, 613, 12345, -3, -612, 2**62, -(2**62)], dtype=np.int64
    )
    got = sketches.cms_estimate_long(probes, hash_a, table, width)
    for x, g in zip(probes.tolist(), np.atleast_1d(got).tolist()):
        assert g == jvm_cms.estimateCount(int(x)), x
