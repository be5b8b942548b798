"""Capture the physical plan of ONE connected-components propagation
round — the r14 before/after evidence for the single-reference rewrite
(``plans/r15/cc_round_{before,after}.txt``).

The per-round plan is invisible in a registry query's ``explain`` (the
in-loop ``localCheckpoint`` truncates lineage), so this builds the round
frame directly, on the same toy shape the loop uses:

* AFTER (current code): ``dedup._propagate_round`` over the self-looped
  symmetric edge set — one join + one aggregate, previous labels
  referenced ONCE.
* BEFORE (pre-r14, reproduced verbatim from git history — see
  ``git log -p petropandas_spark/pipeline/dedup.py``): neighbour
  aggregate + keep-own-label LEFT join — previous labels referenced
  TWICE, which is what made fusing rounds per checkpoint a net loss.

Usage: ``python tools/capture_cc_round_plan.py``
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("cc-round-plan")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from petropandas_spark.pipeline import dedup

    edges = spark.range(1000).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    nodes = spark.range(1001).select(F.col("id").alias("doc_id"))

    def fmt(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )

    out_dir = os.path.join(repo, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)

    # ---- AFTER: the shipped round (self-loop union, single reference)
    sym = edges.select(F.explode(F.array(
        F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
    )).alias("e")).select("e.src", "e.dst").unionByName(
        nodes.select(F.col("doc_id").alias("src"),
                     F.col("doc_id").alias("dst"))
    )
    labels = nodes.select(F.col("doc_id").alias("node"),
                          F.col("doc_id").alias("lab"))
    after_1 = dedup._propagate_round(sym, labels)
    after_2 = dedup._propagate_round(sym, after_1.select("node", "lab"))
    with open(os.path.join(out_dir, "cc_round_after.txt"), "w") as fh:
        fh.write("=== ONE ROUND (r14 single-reference) ===\n")
        fh.write(fmt(after_1))
        fh.write("\n\n=== TWO FUSED ROUNDS per checkpoint+count action "
                 "(round-1 subtree appears ONCE) ===\n")
        fh.write(fmt(after_2))

    # ---- BEFORE: the pre-r14 round, reproduced from git history
    sym_b = edges.select(F.explode(F.array(
        F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
    )).alias("e")).select("e.src", "e.dst")
    neigh = (
        sym_b.join(labels, sym_b["dst"] == labels["node"])
        .groupBy("src").agg(F.min("lab").alias("nlab"))
    )
    before_1 = (
        labels.join(neigh, labels["node"] == neigh["src"], "left")
        .select(
            "node",
            F.col("lab").alias("prev"),
            F.least(
                F.col("lab"), F.coalesce(F.col("nlab"), F.col("lab"))
            ).alias("lab"),
        )
    )

    def before_round(lbl):
        n = (
            sym_b.join(lbl, sym_b["dst"] == lbl["node"])
            .groupBy("src").agg(F.min("lab").alias("nlab"))
        )
        return (
            lbl.join(n, lbl["node"] == n["src"], "left")
            .select(
                "node",
                F.col("lab").alias("prev"),
                F.least(
                    F.col("lab"), F.coalesce(F.col("nlab"), F.col("lab"))
                ).alias("lab"),
            )
        )

    before_2 = before_round(before_1.select("node", "lab"))
    with open(os.path.join(out_dir, "cc_round_before.txt"), "w") as fh:
        fh.write("=== ONE ROUND (pre-r14: labels referenced TWICE — "
                 "neighbour agg + keep-own-label left join) ===\n")
        fh.write(fmt(before_1))
        fh.write("\n\n=== TWO ROUNDS WITHOUT checkpoint (hypothetical "
                 "fuse): round-1 subtree planned TWICE — why batching "
                 "was a net loss pre-rewrite ===\n")
        fh.write(fmt(before_2))

    print("wrote plans/r15/cc_round_{before,after}.txt")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
