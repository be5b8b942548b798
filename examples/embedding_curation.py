"""End-to-end embedding curation: IVF index build → semantic dedup
(SemDeDup) → ANN search over the deduplicated index.

Usage::

    python examples/embedding_curation.py \
        /root/testdata/sf0.001/embeddings.parquet /tmp/emb_out

The flow a 100 TB embedding store runs nightly:

1. assign every vector to a fixed-centroid IVF cell (literal-folded
   codegen argmin — no MLlib dependency at ingest time);
2. within-cluster exact cosine builds the semantic near-dup graph
   (cluster bounds the quadratic pair space — the SemDeDup blocking);
3. connected components label each duplicate group; the minimum member
   id is the keeper, the rest are dropped;
4. the surviving corpus is written partitioned BY CLUSTER, so an ANN
   probe is partition-pruned I/O;
5. a query vector searches the deduplicated store (top-k within the
   probed cells only).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def main(emb_path: str, out: str) -> None:
    from petropandas_spark.pipeline import dedup
    from petropandas_spark.pipeline.similarity import (
        IVFIndex,
        within_cluster_cosine_pairs,
    )

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("embedding-curation")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(emb_path)
    dim = emb.select(F.size("embedding").alias("d")).first()["d"]

    # 1. fixed axis-aligned centroids: deterministic, re-usable across
    # batches (a KMeans fit would drift between runs; see IVFIndex.build
    # for the fitted path)
    k = 8
    idx = IVFIndex(k=k)
    idx.centroids = [
        [1.0 if d == (dim // k) * i else 0.0 for d in range(dim)]
        for i in range(k)
    ]
    assigned = idx.assign(emb)

    # 2-3. semantic dedup: in-cluster cosine graph → components → keepers
    pairs = within_cluster_cosine_pairs(assigned, threshold=0.3)
    comps = dedup.connected_components(
        emb.select("vec_id"), pairs,
        id_col="vec_id", a_col="id_a", b_col="id_b",
    )
    w = Window.partitionBy("component")
    sized = comps.withColumn("n_members", F.count(F.lit(1)).over(w))
    drops = sized.where("n_members >= 2 AND vec_id != component") \
        .select("vec_id")
    survivors = assigned.join(drops, "vec_id", "left_anti")
    n_total, n_drop = emb.count(), drops.count()
    print(f"semantic dedup: {n_total} vectors, {n_drop} dropped, "
          f"{n_total - n_drop} kept")

    # 4. cluster-partitioned index store (probe = pruned I/O)
    store = os.path.join(out, "ivf_store")
    idx.write_index(survivors, store)
    print(f"index store written: {store}")

    # 5. ANN search over the deduplicated store
    query = [0.5 if d < dim // 2 else -0.25 for d in range(dim)]
    top = idx.search_store(spark, store, query, k=5, n_probe=3)
    top.show()

    # 6. (r10) scale-coupled blocking: the cell count derives from the
    # corpus size (k ∝ N — fixed k goes quadratic at scale), and
    # multi-probe admits pairs whose cell codes differ in ≤1 sign bit
    # (several-fold the single-cell recall at an O(log N) candidate
    # multiplier; docs/scale.md has the measured table)
    from petropandas_spark.pipeline.similarity import (
        multiprobe_cell_pairs,
        scaled_cells,
        scaled_sign_clusters,
        semantic_incremental_pairs,
    )

    n_cells = scaled_cells(n_total)
    mp = multiprobe_cell_pairs(emb, threshold=0.3, n_cells=n_cells)
    print(f"scale-coupled cells: {n_cells}; "
          f"multi-probe near-dup pairs: {mp.count()}")

    # 7. (r10) nightly loop: a landing batch checks ONLY against the
    # persisted cell assignment (signed at the store's epoch fanout) —
    # the settled corpus is never re-paired
    settled = emb.where("vec_id % 10 < 8")
    batch = emb.where("vec_id % 10 >= 8")
    cell_store = os.path.join(out, "cell_store")
    scaled_sign_clusters(settled, n_cells).write.mode("overwrite") \
        .partitionBy("cluster").parquet(cell_store)
    incr = semantic_incremental_pairs(
        spark.read.parquet(cell_store), batch, n_cells=n_cells)
    print(f"incremental near-dup pairs touching the batch: {incr.count()}")

    # 8. (r11) epoch compaction: when the corpus outgrows its epoch the
    # persisted cell store re-blocks by APPENDING sign bits — one
    # narrow projection, partition-local (a cell of the 2^b epoch is
    # the disjoint union of its 2^(b_new-b_old) descendant cells —
    # here 4), never a global re-cluster; the
    # new epoch is written BESIDE the old and readers swap
    from petropandas_spark.pipeline.similarity import compact_epoch

    epoch2 = os.path.join(out, "cell_store_epoch2")
    compact_epoch(spark.read.parquet(cell_store), n_cells, n_cells * 4) \
        .write.mode("overwrite").partitionBy("cluster").parquet(epoch2)
    incr2 = semantic_incremental_pairs(
        spark.read.parquet(epoch2), batch, n_cells=n_cells * 4)
    print(f"epoch compacted {n_cells} -> {n_cells * 4} cells; "
          f"batch pairs at the new fanout: {incr2.count()}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "/root/testdata/sf0.001/embeddings.parquet",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/emb_out")
