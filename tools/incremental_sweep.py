"""Incremental-ingestion contract, measured: near-dup candidate time for
a landing batch vs the full-corpus recompute, across batch fractions.

The store side is READ FROM PARQUET (as in production — it was written
when the settled corpus landed), so the incremental timing includes the
store I/O but not its construction.  Best-of-2 per point::

    python tools/incremental_sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    from pyspark.sql import SparkSession

    from petropandas_spark.pipeline import dedup as dd

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("incremental-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()

    def drain(df):
        df.write.format("noop").mode("overwrite").save()

    full = timed(lambda: drain(dd.lsh_candidate_pairs_portable(docs)))
    out = {"sf_dir": sf_dir, "n_docs": n, "full_recompute_s": full,
           "incremental": {}}
    for pct in (5, 20, 50):
        new = docs.where(f"doc_id % 100 < {pct}")
        old = docs.where(f"doc_id % 100 >= {pct}")
        with tempfile.TemporaryDirectory() as tmp:
            store_path = os.path.join(tmp, "store")
            dd.write_signature_store(
                dd.minhash_signatures_portable(old), store_path)
            store = dd.read_signature_store(spark, store_path)
            t = timed(lambda s=store, b=new: drain(
                dd.lsh_incremental_pairs(s, b)))
            spark.catalog.clearCache()
        out["incremental"][f"batch_{pct}pct_s"] = t
    # span tier (round 5): same contract against the winnow store
    out["span_full_recompute_s"] = timed(
        lambda: drain(dd.repeated_span_pairs(docs)))
    out["span_incremental"] = {}
    for pct in (5, 20, 50):
        new = docs.where(f"doc_id % 100 < {pct}")
        old = docs.where(f"doc_id % 100 >= {pct}")
        with tempfile.TemporaryDirectory() as tmp:
            store_path = os.path.join(tmp, "winnow_store")
            dd.write_winnow_store(dd.winnow_fingerprints(old), store_path)
            store = dd.read_winnow_store(spark, store_path)
            t = timed(lambda s=store, b=new: drain(
                dd.verified_span_report(
                    docs, dd.span_incremental_pairs(s, b),
                    "text", "doc_id", 32, 400)))
            spark.catalog.clearCache()
        out["span_incremental"][f"batch_{pct}pct_s"] = t
    # semantic tier (round 10): same contract against the assigned
    # embedding store (parquet partitioned by cluster, the production
    # shape — the batch is signed at the store's epoch fanout)
    from petropandas_spark.pipeline import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out["semantic_full_recompute_s"] = timed(lambda: drain(
        sim.within_cluster_cosine_pairs(
            sim.scaled_sign_clusters(emb), threshold=0.3)))
    out["semantic_incremental"] = {}
    for pct in (5, 20, 50):
        new = emb.where(f"vec_id % 100 < {pct}")
        old = emb.where(f"vec_id % 100 >= {pct}")
        n_cells = sim.scaled_cells(old.count())
        with tempfile.TemporaryDirectory() as tmp:
            store_path = os.path.join(tmp, "cell_store")
            sim.scaled_sign_clusters(old, n_cells).write.partitionBy(
                "cluster").parquet(store_path)
            store = spark.read.parquet(store_path)
            t = timed(lambda s=store, b=new, k=n_cells: drain(
                sim.semantic_incremental_pairs(s, b, n_cells=k)))
            spark.catalog.clearCache()
        out["semantic_incremental"][f"batch_{pct}pct_s"] = t
    print(json.dumps(out))


if __name__ == "__main__":
    main()
