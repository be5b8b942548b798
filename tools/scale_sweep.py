"""Measured scaling sweep: representative queries at sf0.001/0.01/0.1.

Prints one JSON line per query: best-of-2 wall seconds at each scale
factor plus the marginal cost of the last 10× (t(0.1) − t(0.01), the
data-proportional component once fixed overhead cancels).  Feeds the
"measured scaling" section of docs/scale.md::

    python tools/scale_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    # one per operator family: domain chain, relational agg, join+topk,
    # text scan, dedup signatures, LSH chain, exact dedup, ANN, CIPW,
    # window sessionize
    "garnet_end_members",
    "q1_pricing_summary",
    "q3_shipping_topk",
    "doc_stats",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "dedup_exact",
    "knn_cosine_topk",
    "cipw_norm_full",
    "events_sessionize",
    # round 4: shared-stats verify chain and the PQ ADC+re-rank chain
    "neardup_verdicts",
    "pq_search_rerank",
    # round 7: the fixed Schumacher family — named-stage plans must stay
    # wall-flat across 100x (the fix moved cost OUT of planning; this
    # row proves it didn't move INTO the per-row kernel)
    "split_valence_schumacher",
    "amphibole_stoichiometry",
    "tc_clinoamphibole_proportions",
]

SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    from pyspark.sql import SparkSession

    # same knobs as bench.py so the two harnesses measure the same way
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-sweep")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from petropandas_spark.registry import build_registry

    reg = build_registry()
    spark.range(1_000_000).selectExpr("sum(id) s").write.format(
        "noop").mode("overwrite").save()

    for name in QUERIES:
        spec = reg[name]
        row: dict[str, object] = {"query": name}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                spec.spark_fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            row[f"sf{sf}"] = round(best, 3)
        row["marginal_last_10x"] = round(
            row["sf0.1"] - row["sf0.01"], 3)  # type: ignore[operator]
        print(json.dumps(row))


if __name__ == "__main__":
    main()
