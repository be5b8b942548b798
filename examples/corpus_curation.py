"""End-to-end training-corpus curation — the 100 TB pipeline in
miniature::

    python examples/corpus_curation.py [docs.parquet] [out_dir]

Stages (all lazy until each write):
  0. JSONL ingestion when the source is raw shards (``*.jsonl``):
     explicit-schema parse, malformed lines quarantined beside the
     corpus (``pipeline.ingest.read_jsonl``)
  1. exact dedup (normalized-hash tier) → keeper ids
  2. MinHash-LSH near-dup candidates → exact Jaccard verify →
     connected components → per-cluster best-quality keeper
  3. SPAN-level exact-substring dedup (Lee et al. 2021): excise
     copy-pasted passages the document-level tiers keep (the docs
     differ overall but share a verbatim span)
  4. benchmark decontamination (the GPT-3 appendix-C rule: drop any
     document sharing a ≥13-token n-gram with the eval set; eval grams
     derived ONCE — the same frame gates the streaming intake via
     ``streaming.corpus.decontaminate_ingest_stream``)
  5. PII scrub
  6. quality-quartile tagging + deterministic train/val/test split
  7. Hive-partitioned landing (lang) + signature AND winnow stores for
     the NEXT incremental batch (``dedup.lsh_incremental_pairs``,
     ``dedup.span_incremental_pairs``)
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from petropandas_spark.pipeline import contamination, dedup  # noqa: E402
from petropandas_spark.pipeline.scrub import scrub_pii  # noqa: E402
from petropandas_spark.pipeline.sinks import write_partitioned  # noqa: E402


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/testdata/sf0.01/documents.parquet")
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("corpus-curation")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if src.endswith((".jsonl", ".json")):
        # 0. raw-shard entry point: parse with the declared schema,
        # quarantine unparseable lines for a fix-up pass
        from petropandas_spark.pipeline.ingest import read_jsonl

        docs, quarantine = read_jsonl(spark, src)
        quarantine.write.mode("overwrite").text(
            os.path.join(out, "quarantine"))
    else:
        docs = spark.read.parquet(src)

    # 1. exact tier: keep the lowest doc_id per normalized content hash
    norm = F.md5(F.regexp_replace(F.regexp_replace(
        F.lower("text"), r"[^a-z0-9 ]", ""), " +", " "))
    w = Window.partitionBy("__h").orderBy("doc_id")
    exact_kept = (
        docs.withColumn("__h", norm)
        .withColumn("__rk", F.row_number().over(w))
        .where("__rk = 1").drop("__h", "__rk")
    )

    # 2. near-dup tier: LSH candidates → Jaccard ≥ 0.8 → components →
    #    keep the best-quality member of each cluster.  The PORTABLE
    #    (md5, 3×5-band) variant end-to-end: the signature store below
    #    uses the same geometry, so batch 0 and every later incremental
    #    batch apply the SAME near-dup criterion.
    pairs = dedup.jaccard_verify(
        exact_kept, dedup.lsh_candidate_pairs_portable(exact_kept),
        threshold=0.8)
    comps = dedup.connected_components(
        exact_kept.select("doc_id"), pairs.select("doc_a", "doc_b"))
    quality = exact_kept.select(
        "doc_id", F.length("text").alias("__len"))
    wc = Window.partitionBy("component").orderBy(
        F.desc("__len"), F.col("doc_id"))
    drops = (
        comps.join(quality, "doc_id")
        .withColumn("__rk", F.row_number().over(wc))
        .where("__rk > 1").select("doc_id")
    )
    neardup_kept = exact_kept.join(drops, "doc_id", "left_anti")

    # 3. span tier: documents that SURVIVED the document-level tiers can
    #    still share verbatim passages (boilerplate, quotes, templates).
    #    Report them and splice the longest one out of the duplicate
    #    side — the audit digest shows what the splice produced.
    span_audit = dedup.remove_longest_shared_span(neardup_kept)
    spliced = (
        neardup_kept.join(span_audit.select(
            "doc_id", "removed_at", "removed_len"), "doc_id", "left")
        .withColumn("text", F.when(
            F.col("removed_at").isNotNull(),
            F.expr("concat(substr(text, 1, CAST(removed_at AS INT) - 1),"
                   " substr(text, CAST(removed_at AS INT)"
                   " + CAST(removed_len AS INT)))"),
        ).otherwise(F.col("text")))
        .drop("removed_at", "removed_len")
    )

    # 4. decontamination: the eval set here is a stand-in (a handful of
    #    held-out documents); in production it is the benchmark suite.
    #    Gram hashes are derived once — reuse the same frame for any
    #    other corpus slice (and the streaming intake twin).
    evalset = docs.where("doc_id % 97 = 3").select("doc_id", "text")
    eval_hashes = contamination.eval_ngram_hashes(evalset).localCheckpoint()
    decontaminated = contamination.decontaminate(
        spliced, eval_hashes=eval_hashes)

    # 4b. learned quality gate: fastText-style hashed-ngram linear
    #     classifier (pipeline/quality.py) — the model-based scorer a
    #     funnel runs after the heuristic gates.  The shipped weights
    #     are the fixed seeded table (deterministic, oracle-checkable);
    #     production swaps in trained weights, same plan.
    from petropandas_spark.pipeline.quality import quality_filter

    decontaminated = quality_filter(decontaminated)

    # 5 + 6. scrub, quality quartiles, deterministic split
    curated = (
        scrub_pii(decontaminated)
        .withColumn("quality_q", F.ntile(4).over(
            # doc_id tiebreak: equal-length docs must land in the same
            # quartile on every run (determinism-everywhere stance)
            Window.partitionBy("lang").orderBy(F.length("text"), "doc_id")))
        .withColumn("split", F.when(
            (F.col("doc_id") * 2654435761) % 1000 < 800, "train"
        ).when((F.col("doc_id") * 2654435761) % 1000 < 900, "val")
         .otherwise("test"))
    )

    # 7. landing + both incremental stores for the next batch
    write_partitioned(curated, os.path.join(out, "corpus"), ["lang"])
    dedup.write_signature_store(
        dedup.minhash_signatures_portable(curated.select("doc_id", "text")),
        os.path.join(out, "sigstore"))
    dedup.write_winnow_store(
        dedup.winnow_fingerprints(curated.select("doc_id", "text")),
        os.path.join(out, "winnowstore"))

    back = spark.read.parquet(os.path.join(out, "corpus"))
    back.groupBy("lang", "split").count().orderBy("lang", "split").show()

    # 8. the NEXT landing batch: near-dup candidates against the store
    #    without re-shingling the settled corpus (here the batch is a
    #    stand-in resample of the source; in production it is tomorrow's
    #    crawl)
    store = dedup.read_signature_store(spark, os.path.join(out, "sigstore"))
    # scrub BEFORE signing, exactly like the store side — signatures over
    # raw text would shingle differently wherever PII was masked and
    # silently miss those near-dups
    next_batch = scrub_pii(docs.where("doc_id % 17 = 0").select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"))
    n_pairs = dedup.lsh_incremental_pairs(store, next_batch).count()
    wstore = dedup.read_winnow_store(spark, os.path.join(out, "winnowstore"))
    n_spans = dedup.span_incremental_pairs(wstore, next_batch).count()
    print(f"next-batch incremental near-dup candidates: {n_pairs}")
    print(f"next-batch incremental span-match candidates: {n_spans}")
    print(f"curated corpus + signature/winnow stores under {out}")


if __name__ == "__main__":
    main()
