"""Interleaved A/B of connected_components label-loop variants over its
consumer queries (r15, VERDICT item 2 + item 5).

Variants (all return identical rows — same single-reference propagation
round; only the driver-action structure differs):

* ship      — the committed loop (localCheckpoint per batch + limit(1)
              convergence count; batches 1,1,2,2,…)
* nofuse    — localCheckpoint + count, batch always 1 (the r14
              pre-fusion form; VERDICT's open question)
* persist2  — persist per batch + ONE full changed-count action that
              doubles as the cache materializer (no separate checkpoint
              job); batches 1,1,2,2,…; final labels localCheckpoint'd
              once, every persisted generation released
* persist4  — persist2 with growing batches 1,1,2,4,4,…

Interleaved min-of-REPS (SPARK_GRAFT_BENCH_REPS, default 3) cycling
variant-within-query so a host-noise window hits all variants equally.

    python tools/cc_ab.py [query ...]   # default: 4 representative consumers
"""

from __future__ import annotations

import json
import os
import sys
import time

DEFAULT_QUERIES = [
    "semantic_dedup_groups",        # diameter ~9 pair graph
    "corpus_semantic_curated",
    "dedup_components",             # diameter ≲3
    "media_phash_survivors",
]


def _cc_label_variant(mode: str, batch_cap_seq):
    """Build a connected_components replacement running the label path
    with the given action structure."""
    from pyspark.sql import functions as F

    from petropandas_spark.pipeline import dedup as _dd

    def cc(nodes, edges, id_col="doc_id", a_col="doc_a", b_col="doc_b",
           max_iter=20, algorithm="label"):
        if algorithm != "label":
            return _dd.connected_components(
                nodes, edges, id_col, a_col, b_col, max_iter, algorithm)
        sym = edges.select(F.explode(F.array(
            F.struct(F.col(a_col).alias("src"), F.col(b_col).alias("dst")),
            F.struct(F.col(b_col).alias("src"), F.col(a_col).alias("dst")),
        )).alias("e")).select("e.src", "e.dst").unionByName(
            nodes.select(F.col(id_col).alias("src"),
                         F.col(id_col).alias("dst"))
        )
        labels = nodes.select(
            F.col(id_col).alias("node"), F.col(id_col).alias("lab")
        )
        sym = sym.persist()
        gens = []
        done = 0
        k = 0
        while done < max_iter:
            batch = min(batch_cap_seq(k), max_iter - done)
            k += 1
            stepped = _dd._propagate_round(sym, labels)
            for _ in range(batch - 1):
                stepped = _dd._propagate_round(
                    sym, stepped.select("node", "lab"))
            if mode == "checkpoint":
                stepped = stepped.localCheckpoint()
                changed = stepped.filter(
                    F.col("lab") != F.col("prev")).limit(1).count()
            else:  # persist: ONE action materializes + checks convergence
                stepped = stepped.persist()
                gens.append(stepped)
                changed = stepped.filter(
                    F.col("lab") != F.col("prev")).count()
            done += batch
            labels = stepped
            if changed == 0:
                break
        if mode == "persist":
            out = labels.select("node", "lab").localCheckpoint()
            for g in gens:
                g.unpersist()
        else:
            out = labels
        sym.unpersist()
        return out.select(F.col("node").alias(id_col),
                          F.col("lab").alias("component"))

    return cc


VARIANTS = {
    "ship": None,  # committed code, untouched
    "nofuse": ("checkpoint", lambda k: 1),
    "persist2": ("persist", lambda k: 1 if k < 2 else 2),
    "persist4": ("persist", lambda k: [1, 1, 2][k] if k < 3 else 4),
}


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    which = [v for v in os.environ.get(
        "CC_AB_VARIANTS", ",".join(VARIANTS)).split(",") if v]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from pyspark.sql import SparkSession

    from petropandas_spark.session import apply_worker_pool_confs

    spark = (
        apply_worker_pool_confs(
            SparkSession.builder.master(f"local[{cpus}]"))
        .appName("cc-ab")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.driver.memory", "24g")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from petropandas_spark.pipeline import dedup as _dd

    qs = e.queries()
    ship_cc = _dd.connected_components

    spark.range(1_000_000).selectExpr("sum(id) s").write.format(
        "noop").mode("overwrite").save()

    # correctness gate: every variant must be row-identical to ship
    # (order-insensitive count + xxhash64 xor over all columns) before
    # its timings mean anything
    from pyspark.sql import functions as F

    def sig(df):
        c = [F.col(x) for x in df.columns]
        r = df.agg(F.count(F.lit(1)).alias("n"),
                   F.expr("bit_xor(xxhash64(" +
                          ", ".join(df.columns) + "))").alias("h")
                   ).collect()[0]
        return (r["n"], r["h"])

    if os.environ.get("CC_AB_CHECK", "1") == "1":
        for name in names:
            ref = None
            for vname in which:
                spec = VARIANTS[vname]
                _dd.connected_components = (
                    ship_cc if spec is None else _cc_label_variant(*spec))
                try:
                    got = sig(qs[name](spark, sf_dir))
                finally:
                    _dd.connected_components = ship_cc
                spark.catalog.clearCache()
                if ref is None:
                    ref = got
                elif got != ref:
                    print(json.dumps({"error": "variant mismatch",
                                      "query": name, "variant": vname,
                                      "ref": ref, "got": got}))
                    return 1

    out: dict[str, dict[str, float]] = {n: {} for n in names}
    for _ in range(reps):
        for name in names:
            for vname in which:
                spec = VARIANTS[vname]
                _dd.connected_components = (
                    ship_cc if spec is None
                    else _cc_label_variant(*spec))
                try:
                    t0 = time.perf_counter()
                    df = qs[name](spark, sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    dt = time.perf_counter() - t0
                finally:
                    _dd.connected_components = ship_cc
                cur = out[name].get(vname)
                if cur is None or dt < cur:
                    out[name][vname] = round(dt, 4)
                spark.catalog.clearCache()
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "results": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
