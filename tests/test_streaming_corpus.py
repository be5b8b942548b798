"""Streaming corpus ingestion: stream-static dedup + partitioned landing
drained with availableNow and compared against batch semantics."""

from __future__ import annotations

import os

import pytest

from petropandas_spark.streaming import corpus as sc

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    """A documents 'landing directory' with two parquet files, the second
    containing exact duplicates of half the first."""
    path = str(tmp_path_factory.mktemp("docs_stream"))
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    first = docs.filter("doc_id % 2 = 0")
    dup_half = first.filter("doc_id % 4 = 0")
    fresh = docs.filter("doc_id % 2 = 1")
    first.coalesce(1).write.parquet(os.path.join(path, "batch0"))
    # second landing: new docs + re-landed duplicates (same text)
    fresh.union(dup_half).coalesce(1).write.parquet(
        os.path.join(path, "batch1")
    )
    return path


def test_stream_static_dedup_matches_batch(spark, docs_dir, tmp_path):
    store = sc.content_hashed(
        spark.read.parquet(os.path.join(docs_dir, "batch0"))
    ).select("content_hash")
    stream = sc.read_documents_stream(
        spark, os.path.join(docs_dir, "*"), max_files_per_trigger=1
    )
    out = sc.dedup_against_store(stream, store)
    q = (
        out.writeStream.format("memory").queryName("t_dedup_store")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id for r in spark.sql("SELECT doc_id FROM t_dedup_store").collect()
    }
    # batch equivalent: all landed docs minus any content in the store
    landed = sc.content_hashed(
        spark.read.parquet(os.path.join(docs_dir, "*"))
    )
    store_hashes = {r.content_hash for r in store.distinct().collect()}
    expected = {
        r.doc_id for r in landed.collect()
        if r.content_hash not in store_hashes
    }
    assert got == expected
    assert got  # fresh odd-id docs survive


def test_partitioned_stream_landing_prunes(spark, docs_dir, tmp_path):
    stream = sc.read_documents_stream(spark, os.path.join(docs_dir, "*"))
    out_path = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")
    q = sc.write_partitioned_stream(stream, out_path, ckpt)
    q.awaitTermination(120)
    dirs = {d for d in os.listdir(out_path) if d.startswith("lang=")}
    assert dirs  # Hive layout materialized
    back = spark.read.parquet(out_path)
    n_landed = spark.read.parquet(os.path.join(docs_dir, "*")).count()
    assert back.count() == n_landed
    plan = back.filter("lang = 'en'")._jdf.queryExecution().explainString(
        back._sc._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "PartitionFilters" in plan


def test_dedup_within_stream_bounded_state(spark, docs_dir):
    stream = sc.read_documents_stream(spark, os.path.join(docs_dir, "*"))
    out = sc.dedup_within_stream(stream)
    q = (
        out.writeStream.format("memory").queryName("t_dedup_within")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT content_hash, COUNT(*) n FROM t_dedup_within "
        "GROUP BY content_hash HAVING COUNT(*) > 1"
    ).collect()
    assert rows == []  # every content hash appears once


def test_neardup_ingest_stream_matches_full_recompute(spark, docs_dir,
                                                      tmp_path):
    """Union of per-batch incremental pair partitions == full-corpus LSH
    recompute, for any batch split (each pair surfaces when its later
    member arrives)."""
    from petropandas_spark.pipeline import dedup as dd

    stream = sc.read_documents_stream(
        spark, os.path.join(docs_dir, "*"), max_files_per_trigger=1
    )
    store_path = str(tmp_path / "sigstore")
    pairs_path = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    q = sc.neardup_ingest_stream(stream, store_path, pairs_path, ckpt)
    assert q.awaitTermination(180)  # False = still running → partial reads

    landed = sc.read_neardup_pairs(spark, pairs_path)
    got = {(r.doc_a, r.doc_b) for r in landed.collect()}
    all_docs = spark.read.parquet(os.path.join(docs_dir, "*"))
    # the landing dir re-lands half of batch0 verbatim in batch1 (same
    # doc_id, same text) — collapse to distinct docs for the oracle
    expect = {
        (r.doc_a, r.doc_b)
        for r in dd.lsh_candidate_pairs_portable(all_docs.distinct())
        .collect()
    }
    assert got == expect
    # store now holds one signature row per landed doc occurrence batch
    sigs = spark.read.parquet(store_path)
    assert sigs.select("doc_id").distinct().count() \
        == all_docs.select("doc_id").distinct().count()


def test_decontaminate_ingest_stream_matches_batch(spark, docs_dir,
                                                   tmp_path):
    """Union of per-batch clean landings == batch ``decontaminate`` over
    the full landing dir, for any batch split (the verdict is a pure
    per-document function of a STATIC eval set — no cross-batch
    interaction by construction, and this pins the plumbing: the
    once-derived eval grams, the per-batch anti-join, the idempotent
    batch_id landing)."""
    from petropandas_spark.pipeline import contamination as ct

    all_docs = spark.read.parquet(os.path.join(docs_dir, "*"))
    # eval set = three landed documents verbatim → they (and their
    # re-landed duplicates) are contaminated by construction
    evalset = (all_docs.orderBy("doc_id").limit(3)
               .select("doc_id", "text"))
    stream = sc.read_documents_stream(
        spark, os.path.join(docs_dir, "*"), max_files_per_trigger=1
    )
    landing = str(tmp_path / "clean")
    ckpt = str(tmp_path / "ckpt")
    q = sc.decontaminate_ingest_stream(stream, evalset, landing, ckpt, n=8)
    assert q.awaitTermination(180)

    got = sorted(r.doc_id for r in
                 sc.read_clean_documents(spark, landing).collect())
    want = sorted(r.doc_id for r in
                  ct.decontaminate(all_docs, evalset, n=8).collect())
    assert got == want
    eval_ids = {r.doc_id for r in evalset.collect()}
    assert eval_ids.isdisjoint(got)   # the planted contamination is gone
    assert got                        # and clean docs survived


def test_eval_hashes_gram_size_mismatch_fails_loudly(spark, docs_dir):
    """A precomputed eval-gram frame built with one n and consumed with
    another lives in a disjoint hash space — the collision join would
    silently match nothing and wave every contaminated document
    through.  The __n marker makes that a loud error."""
    import pytest

    from petropandas_spark.pipeline import contamination as ct

    docs = spark.read.parquet(os.path.join(docs_dir, "*"))
    evalset = docs.limit(2).select("doc_id", "text")
    eh = ct.eval_ngram_hashes(evalset, n=8)
    with pytest.raises(ValueError, match="n=8"):
        ct.decontaminate(docs, eval_hashes=eh, n=13)
    # matching n passes through
    assert ct.decontaminate(docs, eval_hashes=eh, n=8).count() >= 0
    # a frame without the marker (user-built) skips validation
    assert ct.decontaminate(
        docs, eval_hashes=eh.drop("__n"), n=8).count() >= 0


def test_store_read_survives_empty_first_batch(spark, tmp_path):
    """An empty first micro-batch leaves the signature store directory
    with partition markers but zero data files; the schema-pinned store
    read must yield an empty frame (not an inference error) and the
    incremental path must then behave exactly like a first batch."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from petropandas_spark.pipeline import dedup as dd
    from petropandas_spark.pipeline.sinks import backfill_partitions

    empty = spark.createDataFrame([], "doc_id BIGINT, text STRING")
    sigs_empty = dd.minhash_signatures_portable(empty)
    store_path = str(tmp_path / "sigstore")
    backfill_partitions(
        sigs_empty.withColumn("batch_id", F.lit(0)), store_path,
        ["batch_id"])
    store_schema = StructType(
        list(sigs_empty.schema.fields) + [StructField("batch_id",
                                                      LongType())])
    store = dd.read_signature_store(
        spark, store_path, schema=store_schema).drop("batch_id")
    assert store.count() == 0
    new = spark.read.parquet(f"{SF}/documents.parquet").limit(30)
    got = {(r.doc_a, r.doc_b)
           for r in dd.lsh_incremental_pairs(store, new).collect()}
    want = {(r.doc_a, r.doc_b)
            for r in dd.lsh_candidate_pairs_portable(new).collect()}
    assert got == want


def test_neardup_ingest_zero_pairs_readable(spark, tmp_path):
    """A run that finds no near-dups must leave a READABLE (empty) pairs
    landing — the pinned-schema read, not schema inference."""
    import pandas as pd

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta gamma delta epsilon zeta eta theta",
                 "one two three four five six seven eight nine ten",
                 "red orange yellow green blue indigo violet colors"],
        "lang": ["en"] * 3, "source": ["s"] * 3, "n_chars": [40] * 3,
    })
    land = str(tmp_path / "land")
    spark.createDataFrame(docs).coalesce(1).write.parquet(land)
    stream = sc.read_documents_stream(spark, land)
    q = sc.neardup_ingest_stream(
        stream, str(tmp_path / "store"), str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"))
    assert q.awaitTermination(120)
    pairs = sc.read_neardup_pairs(spark, str(tmp_path / "pairs"))
    assert pairs.count() == 0
    assert set(pairs.columns) == {"doc_a", "doc_b", "batch_id"}


def test_span_ingest_stream_matches_full_recompute(spark, docs_dir,
                                                   tmp_path):
    """Span-tier streaming twin: union of per-batch winnow-store match
    partitions == full-corpus span candidate set, for any batch split
    (each match surfaces when its later member arrives).  Re-landed
    duplicate docs collapse to distinct for the oracle, as in the
    MinHash twin."""
    from pyspark.sql import functions as F

    from petropandas_spark.pipeline import dedup as dd
    from petropandas_spark.pipeline.dedup import _bucket_pairs_any

    stream = sc.read_documents_stream(
        spark, os.path.join(docs_dir, "*"), max_files_per_trigger=1
    )
    store_path = str(tmp_path / "winnowstore")
    matches_path = str(tmp_path / "matches")
    ckpt = str(tmp_path / "ckpt_span")
    q = sc.span_ingest_stream(stream, store_path, matches_path, ckpt)
    assert q.awaitTermination(180)

    landed = sc.read_span_matches(spark, matches_path)
    got = {(r.doc_a, r.pos_a, r.doc_b, r.pos_b) for r in landed.collect()}
    all_docs = spark.read.parquet(os.path.join(docs_dir, "*")).distinct()
    sel = dd.winnow_fingerprints(all_docs)
    keyed = sel.select("h", F.struct(
        F.col("doc_id").alias("d"), F.col("pos").alias("p")).alias("v"))
    expect = {(r.doc_a, r.pos_a, r.doc_b, r.pos_b) for r in
              _bucket_pairs_any(keyed, "v", ["h"]).select(
                  F.col("a.d").alias("doc_a"), F.col("a.p").alias("pos_a"),
                  F.col("b.d").alias("doc_b"), F.col("b.p").alias("pos_b"),
              ).collect()}
    assert got == expect
    # store holds fingerprints for every distinct landed doc
    fps = spark.read.parquet(store_path)
    assert fps.select("doc_id").distinct().count() \
        == all_docs.select("doc_id").distinct().count()


@pytest.fixture(scope="module")
def emb_dir(spark, tmp_path_factory):
    """An embeddings landing directory with two disjoint parquet
    batches (vec_id parity split)."""
    path = str(tmp_path_factory.mktemp("emb_stream"))
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    emb.filter("vec_id % 2 = 0").coalesce(1).write.parquet(
        os.path.join(path, "batch0"))
    emb.filter("vec_id % 2 = 1").coalesce(1).write.parquet(
        os.path.join(path, "batch1"))
    return path


def test_semantic_ingest_stream_matches_full_recompute(spark, emb_dir,
                                                       tmp_path):
    """Union of per-batch incremental semantic pair partitions ==
    full-corpus within-cell cosine pairs at the stream's epoch fanout,
    for any batch split (each pair surfaces when its later member
    arrives; old↔old never re-pairs)."""
    from petropandas_spark.pipeline import similarity as sim

    n_cells = 16
    stream = sc.read_embeddings_stream(
        spark, os.path.join(emb_dir, "*"), max_files_per_trigger=1
    )
    store_path = str(tmp_path / "cellstore")
    pairs_path = str(tmp_path / "sempairs")
    ckpt = str(tmp_path / "ckpt")
    q = sc.semantic_ingest_stream(stream, store_path, pairs_path, ckpt,
                                  n_cells=n_cells, threshold=0.3)
    assert q.awaitTermination(180)

    landed = sc.read_semantic_pairs(spark, pairs_path)
    got = {(r.id_a, r.id_b) for r in landed.collect()}
    all_emb = spark.read.parquet(os.path.join(emb_dir, "*"))
    full = sim.within_cluster_cosine_pairs(
        sim.scaled_sign_clusters(all_emb, n_cells), threshold=0.3)
    expect = {(r.id_a, r.id_b) for r in full.collect()}
    assert got == expect and len(expect) > 0
    # the landed cosine VALUES are the exact verify's (bit-equal to the
    # batch recompute — same hof left-fold on both paths)
    full_cos = {(r.id_a, r.id_b): r.cosine for r in full.collect()}
    for r in landed.collect():
        assert full_cos[(r.id_a, r.id_b)] == r.cosine
    # store holds one assignment row per vector, with its cell
    store = spark.read.parquet(store_path)
    assert store.count() == all_emb.count()
    assert set(store.columns) >= {"vec_id", "embedding", "cluster"}


def test_compact_semantic_store_new_epoch(spark, emb_dir, tmp_path):
    """Epoch compaction on the PERSISTED stream store: after draining
    the ingest stream at the old fanout, compact_semantic_store writes
    the new epoch beside the old with every cluster re-blocked to the
    wider fanout (pinned equal to a fresh full assignment), batch_id
    partitioning preserved; a NEXT landing batch paired against the
    compacted store at the new fanout equals the fresh-store
    derivation — the stream continues across the epoch swap."""
    from petropandas_spark.pipeline import similarity as sim

    stream = sc.read_embeddings_stream(
        spark, os.path.join(emb_dir, "*"), max_files_per_trigger=1)
    store_path = str(tmp_path / "cellstore")
    q = sc.semantic_ingest_stream(
        stream, store_path, str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"), n_cells=16, threshold=0.3)
    assert q.awaitTermination(180)

    epoch2 = str(tmp_path / "cellstore_epoch2")
    sc.compact_semantic_store(spark, store_path, epoch2, 16, 64)
    compacted = sc.read_semantic_store(spark, epoch2)
    all_emb = spark.read.parquet(os.path.join(emb_dir, "*"))
    fresh = sim.scaled_sign_clusters(all_emb, 64)
    assert ({(r.vec_id, r.cluster) for r in
             compacted.select("vec_id", "cluster").collect()}
            == {(r.vec_id, r.cluster) for r in
                fresh.select("vec_id", "cluster").collect()})
    assert compacted.select("batch_id").distinct().count() == 2

    batch3 = all_emb.select(
        "vec_id", "embedding").limit(0).sparkSession.createDataFrame(
        [(10_001, [float(0.9)] * 64), (10_002, [float(0.9)] * 64)],
        "vec_id long, embedding array<float>")
    via_compact = {(r.id_a, r.id_b, r.cosine) for r in
                   sim.semantic_incremental_pairs(
                       compacted.select("vec_id", "embedding", "cluster"),
                       batch3, threshold=0.3, n_cells=64).collect()}
    via_fresh = {(r.id_a, r.id_b, r.cosine) for r in
                 sim.semantic_incremental_pairs(
                     fresh, batch3, threshold=0.3, n_cells=64).collect()}
    assert via_compact == via_fresh and len(via_fresh) > 0


def test_semantic_ingest_zero_pairs_readable(spark, tmp_path):
    """A semantic ingest run that lands ZERO near-dup pairs leaves the
    pairs directory without data files — schema inference would raise,
    the pinned-schema reader must yield the expected empty frame (the
    same contract as the neardup twin)."""
    land = tmp_path / "landing"
    land.mkdir()
    # two orthogonal one-hot vectors: cosine 0 < threshold, no pairs
    rows = [(1, [1.0] + [0.0] * 15, 0), (2, [0.0, 1.0] + [0.0] * 14, 0)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(land / "b0"))
    stream = sc.read_embeddings_stream(spark, str(land / "*"))
    q = sc.semantic_ingest_stream(
        stream, str(tmp_path / "store"), str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"), n_cells=16, threshold=0.3)
    assert q.awaitTermination(120)
    landed = sc.read_semantic_pairs(spark, str(tmp_path / "pairs"))
    assert landed.count() == 0
    assert landed.columns == ["id_a", "id_b", "cosine", "batch_id"]
    # the store still holds the batch's assignment for the next trigger
    assert spark.read.parquet(str(tmp_path / "store")).count() == 2


@pytest.fixture(scope="module")
def media_dir(spark, tmp_path_factory):
    """A media landing directory: two parquet shards of doc-id-derived
    fixture PPMs (near-twin families span the shard boundary), the
    second re-landing a few byte-identical objects from the first."""
    from petropandas_spark.pipeline import multimodal as mm

    path = str(tmp_path_factory.mktemp("media_stream"))
    ids = spark.range(0, 36).selectExpr("id AS doc_id")
    media = mm.synthesize_fixture_images(ids)
    first = media.filter("doc_id % 2 = 0")
    relanded = first.filter("doc_id % 8 = 0")
    fresh = media.filter("doc_id % 2 = 1")
    first.coalesce(1).write.parquet(os.path.join(path, "batch0"))
    fresh.union(relanded).coalesce(1).write.parquet(
        os.path.join(path, "batch1"))
    return path


def test_phash_ingest_stream_matches_full_recompute(spark, media_dir,
                                                    tmp_path):
    """Union of per-batch incremental media pair partitions == the
    full-corpus pHash recompute, for any batch split (each pair
    surfaces when its later member arrives; re-landed byte-identical
    objects collapse in the quarter buckets)."""
    from petropandas_spark.pipeline import dedup as dd
    from petropandas_spark.pipeline import multimodal as mm

    stream = sc.read_media_stream(
        spark, os.path.join(media_dir, "*"), max_files_per_trigger=1)
    store_path = str(tmp_path / "phash_store")
    pairs_path = str(tmp_path / "phash_pairs")
    ckpt = str(tmp_path / "ckpt")
    q = sc.phash_ingest_stream(stream, store_path, pairs_path, ckpt)
    assert q.awaitTermination(180)

    landed = sc.read_phash_pairs(spark, pairs_path)
    got = {(r.doc_a, r.doc_b, r.hamming) for r in landed.collect()}
    all_media = spark.read.parquet(os.path.join(media_dir, "*")).distinct()
    # the stream runs the either-hash union gate: expected pair set =
    # full-corpus union, expected hamming = MIN over the gates that
    # fired (per-gate distances are time-invariant, so the min is the
    # same whichever batch surfaced the pair)
    sigs = mm.phash_images(all_media).localCheckpoint()
    expect: dict = {}
    for c in ("ahash", "dhash"):
        for r in dd.hamming_neardup_pairs(
                sigs, c, "doc_id", max_hamming=3).collect():
            k = (r.doc_a, r.doc_b)
            expect[k] = min(expect.get(k, 64), r.hamming)
    assert got == {(a, b, h) for (a, b), h in expect.items()}
    assert len(got) > 0  # the planted twin families DID surface
    # store holds both hashes for every landed object occurrence
    sigs = spark.read.parquet(store_path)
    assert set(sigs.columns) == {"doc_id", "ahash", "dhash", "batch_id"}
    assert sigs.select("doc_id").distinct().count() \
        == all_media.select("doc_id").distinct().count()


def test_phash_ingest_zero_pairs_readable(spark, tmp_path):
    """A batch with no near-dups lands an empty pair partition; the
    pinned-schema reader returns the empty frame (inference would
    raise)."""
    from petropandas_spark.pipeline import multimodal as mm

    path = str(tmp_path / "media_solo")
    # two unrelated families, one member each -> zero pairs
    ids = spark.createDataFrame([(0,), (30,)], "doc_id LONG")
    mm.synthesize_fixture_images(ids).coalesce(1).write.parquet(
        os.path.join(path, "batch0"))
    stream = sc.read_media_stream(spark, os.path.join(path, "*"))
    q = sc.phash_ingest_stream(
        stream, str(tmp_path / "st"), str(tmp_path / "pp"),
        str(tmp_path / "ck"))
    assert q.awaitTermination(120)
    assert sc.read_phash_pairs(spark, str(tmp_path / "pp")).count() == 0


def test_audio_ingest_stream_matches_full_recompute(spark, tmp_path):
    """The audio twin of the pHash ingest invariant: union of landed
    pair partitions == full-corpus fingerprint recompute."""
    from petropandas_spark.pipeline import dedup as dd
    from petropandas_spark.pipeline import multimodal as mm

    path = str(tmp_path / "audio_landing")
    ids = spark.range(0, 30).selectExpr("id AS doc_id")
    clips = mm.synthesize_fixture_audio(ids)
    clips.filter("doc_id % 2 = 0").coalesce(1).write.parquet(
        os.path.join(path, "batch0"))
    clips.filter("doc_id % 2 = 1").coalesce(1).write.parquet(
        os.path.join(path, "batch1"))
    stream = sc.read_media_stream(
        spark, os.path.join(path, "*"), max_files_per_trigger=1)
    q = sc.audio_ingest_stream(
        stream, str(tmp_path / "afp_store"), str(tmp_path / "afp_pairs"),
        str(tmp_path / "ck"))
    assert q.awaitTermination(180)
    got = {(r.doc_a, r.doc_b, r.hamming) for r in
           sc.read_phash_pairs(spark, str(tmp_path / "afp_pairs"))
           .collect()}
    expect = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dd.hamming_neardup_pairs(
            mm.audio_fingerprints(spark.read.parquet(
                os.path.join(path, "*"))),
            "afp", "doc_id", max_hamming=3
        ).collect()
    }
    assert got == expect and len(got) > 0


def test_audio_ingest_stream_multioffset_matches_full(spark, tmp_path):
    """Multi-offset streaming twin: union of landed pair partitions ==
    the full-corpus multi-offset union gate (cross-offset matches
    included), and the store carries K rows per settled clip."""
    from petropandas_spark.pipeline import multimodal as mm

    path = str(tmp_path / "audio_mo_landing")
    ids = spark.range(0, 24).selectExpr("id AS doc_id")
    clips = mm.synthesize_fixture_audio(ids)
    clips.filter("doc_id % 2 = 0").coalesce(1).write.parquet(
        os.path.join(path, "batch0"))
    clips.filter("doc_id % 2 = 1").coalesce(1).write.parquet(
        os.path.join(path, "batch1"))
    stream = sc.read_media_stream(
        spark, os.path.join(path, "*"), max_files_per_trigger=1)
    store_path = str(tmp_path / "afp_mo_store")
    q = sc.audio_ingest_stream(
        stream, store_path, str(tmp_path / "afp_mo_pairs"),
        str(tmp_path / "ck_mo"), offsets=(0.0, 0.5))
    assert q.awaitTermination(180)
    got = {(r.doc_a, r.doc_b, r.hamming) for r in
           sc.read_phash_pairs(spark, str(tmp_path / "afp_mo_pairs"))
           .collect()}
    expect = {(r.doc_a, r.doc_b, r.hamming)
              for r in mm.audio_neardup_pairs_multioffset(
                  mm.audio_fingerprints_offsets(
                      spark.read.parquet(os.path.join(path, "*")),
                      offsets=(0.0, 0.5))).collect()}
    assert got == expect and len(got) > 0
    store = spark.read.parquet(store_path)
    assert store.count() == 2 * 24  # K rows per settled clip
    assert set(store.columns) == {"doc_id", "off_idx", "afp", "batch_id"}


def test_video_ingest_stream_shots_fuzzy_matches_full(spark, tmp_path):
    """The production video stream spelling (shot anchors + fuzzy
    gate): union of landed pair partitions ≡ the full-corpus
    video_neardup_pairs_fuzzy over video_fingerprints_shots."""
    from petropandas_spark.pipeline import multimodal as mm

    path = str(tmp_path / "video_sf_landing")
    ids = spark.range(0, 18).selectExpr("id AS doc_id")
    vids = mm.synthesize_fixture_videos(ids)
    vids.filter("doc_id % 2 = 0").coalesce(1).write.parquet(
        os.path.join(path, "batch0"))
    vids.filter("doc_id % 2 = 1").coalesce(1).write.parquet(
        os.path.join(path, "batch1"))
    stream = sc.read_media_stream(
        spark, os.path.join(path, "*"), max_files_per_trigger=1)
    store_path = str(tmp_path / "vshot_store")
    q = sc.video_ingest_stream(
        stream, store_path, str(tmp_path / "vshot_pairs"),
        str(tmp_path / "vshot_ck"), min_shared=1,
        fingerprints="shots", fuzzy=True)
    assert q.awaitTermination(180)
    got = {(r.doc_a, r.doc_b, r.n_shared) for r in
           sc.read_video_pairs(spark, str(tmp_path / "vshot_pairs"))
           .collect()}
    full_sigs = mm.video_fingerprints_shots(
        spark.read.parquet(os.path.join(path, "*"))).localCheckpoint()
    expect = {(r.doc_a, r.doc_b, r.n_shared)
              for r in mm.video_neardup_pairs_fuzzy(
                  full_sigs, min_shared=1).collect()}
    assert got == expect and len(got) > 0
    # the shots store layout landed (anchor_idx, not frame_idx)
    store = spark.read.parquet(store_path)
    assert "anchor_idx" in store.columns
    with pytest.raises(ValueError, match="fingerprints"):
        sc.video_ingest_stream(stream, store_path, "x", "y",
                               fingerprints="nope")


def test_video_ingest_stream_matches_full_recompute(spark, tmp_path):
    """The video twin of the media ingest invariant: union of landed
    shared-frame-hash pair partitions == the full-corpus recompute."""
    from petropandas_spark.pipeline import multimodal as mm

    path = str(tmp_path / "video_landing")
    ids = spark.range(0, 18).selectExpr("id AS doc_id")
    vids = mm.synthesize_fixture_videos(ids)
    vids.filter("doc_id % 2 = 0").coalesce(1).write.parquet(
        os.path.join(path, "batch0"))
    vids.filter("doc_id % 2 = 1").coalesce(1).write.parquet(
        os.path.join(path, "batch1"))
    stream = sc.read_media_stream(
        spark, os.path.join(path, "*"), max_files_per_trigger=1)
    q = sc.video_ingest_stream(
        stream, str(tmp_path / "vstore"), str(tmp_path / "vpairs"),
        str(tmp_path / "vck"))
    assert q.awaitTermination(180)
    got = {(r.doc_a, r.doc_b, r.n_shared) for r in
           sc.read_video_pairs(spark, str(tmp_path / "vpairs")).collect()}
    full_sigs = mm.video_fingerprints(
        spark.read.parquet(os.path.join(path, "*"))).localCheckpoint()
    expect = {(r.doc_a, r.doc_b, r.n_shared)
              for r in mm.video_neardup_pairs(full_sigs).collect()}
    assert got == expect and len(got) > 0


def test_video_ingest_stream_union_matches_full(spark, tmp_path):
    """The SHIPPED production video spelling (fingerprints='union' —
    one decode per batch, tier-tagged store, per-tier fuzzy gates
    unioned): union of landed pair partitions ≡ the full-corpus
    video_neardup_pairs_union over video_union_fingerprints."""
    from petropandas_spark.pipeline import multimodal as mm

    path = str(tmp_path / "video_u_landing")
    ids = spark.range(0, 18).selectExpr("id AS doc_id")
    vids = mm.synthesize_fixture_videos(ids)
    vids.filter("doc_id % 2 = 0").coalesce(1).write.parquet(
        os.path.join(path, "batch0"))
    vids.filter("doc_id % 2 = 1").coalesce(1).write.parquet(
        os.path.join(path, "batch1"))
    stream = sc.read_media_stream(
        spark, os.path.join(path, "*"), max_files_per_trigger=1)
    store_path = str(tmp_path / "vu_store")
    q = sc.video_ingest_stream(
        stream, store_path, str(tmp_path / "vu_pairs"),
        str(tmp_path / "vu_ck"), min_shared=1, fingerprints="union")
    assert q.awaitTermination(180)
    got = {(r.doc_a, r.doc_b, r.n_shared) for r in
           sc.read_video_pairs(spark, str(tmp_path / "vu_pairs"))
           .collect()}
    full_sigs = mm.video_union_fingerprints(
        spark.read.parquet(os.path.join(path, "*"))).localCheckpoint()
    expect = {(r.doc_a, r.doc_b, r.n_shared)
              for r in mm.video_neardup_pairs_union(
                  full_sigs, min_shared=1).collect()}
    assert got == expect and len(got) > 0
    # tier-tagged store layout landed
    store = spark.read.parquet(store_path)
    assert {"tier", "idx", "fhash"} <= set(store.columns)


def test_video_store_layout_guard_fails_loudly(spark, tmp_path):
    """Reusing a store path across fingerprint modes must FAIL the
    batch, not silently read old-layout parquet through the new pinned
    schema (r13 advice): drain once with 'sampled', then point a
    'union' stream at the same store — the second drain raises with
    the layout mismatch named."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from petropandas_spark.pipeline import multimodal as mm

    path = str(tmp_path / "video_lg_landing")
    ids = spark.range(0, 6).selectExpr("id AS doc_id")
    mm.synthesize_fixture_videos(ids).coalesce(1).write.parquet(
        os.path.join(path, "batch0"))
    store_path = str(tmp_path / "vlg_store")
    q = sc.video_ingest_stream(
        sc.read_media_stream(spark, os.path.join(path, "*")),
        store_path, str(tmp_path / "vlg_pairs"),
        str(tmp_path / "vlg_ck"))
    assert q.awaitTermination(180)
    # second landing, new stream in a DIFFERENT mode over the SAME store
    mm.synthesize_fixture_videos(
        spark.range(6, 12).selectExpr("id AS doc_id")
    ).coalesce(1).write.parquet(os.path.join(path, "batch1"))
    q2 = sc.video_ingest_stream(
        sc.read_media_stream(spark, os.path.join(path, "*")),
        store_path, str(tmp_path / "vlg_pairs"),
        str(tmp_path / "vlg_ck2"), fingerprints="union")
    with pytest.raises(StreamingQueryException, match="fresh store_path"):
        q2.awaitTermination(180)
        q2.processAllAvailable()


def _containment_rows(df):
    return {(r.doc_a, r.doc_b, r.n_matched_a, r.n_matched_b,
             round(r.containment, 9)) for r in df.collect()}


def test_containment_ingest_stream_video(spark, tmp_path):
    """Per-batch landings of the video containment stream ≡ the full
    containment gate over the corpus-so-far restricted to
    batch-touching pairs (batch 0: batch alone; batch 1: full corpus
    slice) — the ingest-time 'is this clip cut from a settled video?'
    invariant."""
    from pyspark.sql import functions as F

    from petropandas_spark.pipeline import multimodal as mm

    path = str(tmp_path / "vc_landing")
    ids = spark.range(0, 18).selectExpr("id AS doc_id")
    vids = mm.synthesize_fixture_videos(ids)
    vids.filter("doc_id % 2 = 0").coalesce(1).write.parquet(
        os.path.join(path, "batch0"))
    vids.filter("doc_id % 2 = 1").coalesce(1).write.parquet(
        os.path.join(path, "batch1"))
    q = sc.containment_ingest_stream(
        sc.read_media_stream(spark, os.path.join(path, "*"),
                             max_files_per_trigger=1),
        str(tmp_path / "vc_store"), str(tmp_path / "vc_pairs"),
        str(tmp_path / "vc_ck"), modality="video", min_frac=0.7)
    assert q.awaitTermination(180)
    landed = sc.read_containment_pairs(spark, str(tmp_path / "vc_pairs"))
    sigs = mm.video_fingerprints(
        spark.read.parquet(os.path.join(path, "*"))).localCheckpoint()
    # batch ids land in arrival order: 0 = even docs, 1 = odd docs
    got0 = _containment_rows(
        landed.where("batch_id = 0").drop("batch_id"))
    expect0 = _containment_rows(mm.video_containment_pairs(
        sigs.where("doc_id % 2 = 0"), min_frac=0.7, max_hash_df=None))
    assert got0 == expect0
    got1 = _containment_rows(
        landed.where("batch_id = 1").drop("batch_id"))
    full = mm.video_containment_pairs(
        sigs, min_frac=0.7, max_hash_df=None)
    expect1 = _containment_rows(full.where(
        (F.col("doc_a") % 2 == 1) | (F.col("doc_b") % 2 == 1)))
    assert got1 == expect1 and len(got1) > 0


def test_containment_ingest_stream_audio(spark, tmp_path):
    """The audio twin: windowed fingerprints (W=260, 4 windows per
    fixture clip), batch-touching containment pairs land per trigger;
    batch-1 landing ≡ the full gate's batch-touching slice."""
    from pyspark.sql import functions as F

    from petropandas_spark.pipeline import multimodal as mm

    path = str(tmp_path / "ac_landing")
    ids = spark.range(0, 18).selectExpr("id AS doc_id")
    clips = mm.synthesize_fixture_audio(ids)
    clips.filter("doc_id % 2 = 0").coalesce(1).write.parquet(
        os.path.join(path, "batch0"))
    clips.filter("doc_id % 2 = 1").coalesce(1).write.parquet(
        os.path.join(path, "batch1"))
    q = sc.containment_ingest_stream(
        sc.read_media_stream(spark, os.path.join(path, "*"),
                             max_files_per_trigger=1),
        str(tmp_path / "ac_store"), str(tmp_path / "ac_pairs"),
        str(tmp_path / "ac_ck"), modality="audio", min_frac=0.7,
        window_samples=260, audio_anchors="windows")
    assert q.awaitTermination(180)
    landed = sc.read_containment_pairs(spark, str(tmp_path / "ac_pairs"))
    fps = mm.audio_fingerprints_windows(
        spark.read.parquet(os.path.join(path, "*")),
        window_samples=260).localCheckpoint()
    got1 = _containment_rows(
        landed.where("batch_id = 1").drop("batch_id"))
    full = mm.audio_containment_pairs(
        fps, min_frac=0.7, max_fp_df=None)
    expect1 = _containment_rows(full.where(
        (F.col("doc_a") % 2 == 1) | (F.col("doc_b") % 2 == 1)))
    assert got1 == expect1 and len(got1) > 0
    with pytest.raises(ValueError, match="modality"):
        sc.containment_ingest_stream(
            sc.read_media_stream(spark, os.path.join(path, "*")),
            "x", "y", "z", modality="nope")
    with pytest.raises(ValueError, match="audio_anchors"):
        sc.containment_ingest_stream(
            sc.read_media_stream(spark, os.path.join(path, "*")),
            "x", "y", "z", modality="audio", audio_anchors="nope")
    # the default ONSET substrate (the measured production spelling):
    # batch-1 landing ≡ the full onset-anchored gate's slice
    q2 = sc.containment_ingest_stream(
        sc.read_media_stream(spark, os.path.join(path, "*"),
                             max_files_per_trigger=1),
        str(tmp_path / "ao_store"), str(tmp_path / "ao_pairs"),
        str(tmp_path / "ao_ck"), modality="audio", min_frac=0.7)
    assert q2.awaitTermination(180)
    landed_o = sc.read_containment_pairs(
        spark, str(tmp_path / "ao_pairs"))
    ofps = mm.audio_fingerprints_onsets(
        spark.read.parquet(os.path.join(path, "*"))).localCheckpoint()
    got1o = _containment_rows(
        landed_o.where("batch_id = 1").drop("batch_id"))
    full_o = mm.audio_containment_pairs(
        ofps, min_frac=0.7, max_fp_df=None)
    expect1o = _containment_rows(full_o.where(
        (F.col("doc_a") % 2 == 1) | (F.col("doc_b") % 2 == 1)))
    assert got1o == expect1o


def test_compact_ingest_store_mid_stream(spark, media_dir, tmp_path):
    """Compact the pHash signature store between two drains: the
    resumed stream keeps landing the same pairs it would have against
    the uncompacted store (batch_id = -1 is never a foreachBatch epoch,
    so retry idempotence is untouched), and the compacted store is one
    partition of size-targeted files."""
    from petropandas_spark.pipeline import dedup as dd
    from petropandas_spark.pipeline import multimodal as mm

    store1 = str(tmp_path / "store_epoch1")
    pairs_path = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ck")
    # drain ONLY batch0 (maxFilesPerTrigger=1 + availableNow drains all
    # files present; stage batch0 first, compact, then land batch1)
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    import shutil
    shutil.copytree(os.path.join(media_dir, "batch0"),
                    os.path.join(staged, "batch0"))
    q = sc.phash_ingest_stream(
        sc.read_media_stream(spark, os.path.join(staged, "*")),
        store1, pairs_path, ckpt)
    assert q.awaitTermination(120)

    store2 = str(tmp_path / "store_epoch2")
    sc.compact_ingest_store(
        spark, store1, store2,
        "doc_id BIGINT, ahash BIGINT, dhash BIGINT, batch_id BIGINT")
    comp = spark.read.parquet(store2)
    assert {r.batch_id for r in
            comp.select("batch_id").distinct().collect()} == {-1}
    assert comp.drop("batch_id").orderBy("doc_id").collect() == \
        spark.read.parquet(store1).drop("batch_id") \
        .orderBy("doc_id").collect()

    # resume on the compacted store with the SAME checkpoint
    shutil.copytree(os.path.join(media_dir, "batch1"),
                    os.path.join(staged, "batch1"))
    q2 = sc.phash_ingest_stream(
        sc.read_media_stream(spark, os.path.join(staged, "*")),
        store2, pairs_path, ckpt)
    assert q2.awaitTermination(120)

    got = {(r.doc_a, r.doc_b, r.hamming) for r in
           sc.read_phash_pairs(spark, pairs_path).collect()}
    all_media = spark.read.parquet(os.path.join(staged, "*")).distinct()
    # the stream runs the either-hash union gate (min over fired gates)
    sigs = mm.phash_images(all_media).localCheckpoint()
    exp: dict = {}
    for c in ("ahash", "dhash"):
        for r in dd.hamming_neardup_pairs(
                sigs, c, "doc_id", max_hamming=3).collect():
            k = (r.doc_a, r.doc_b)
            exp[k] = min(exp.get(k, 64), r.hamming)
    assert got == {(a, b, h) for (a, b), h in exp.items()}


def test_compact_ingest_store_minhash_schema(spark, docs_dir, tmp_path):
    """The compaction helper is store-agnostic: the MinHash signature
    store (17 columns) round-trips values exactly under batch_id=-1."""
    store1 = str(tmp_path / "mh_store")
    q = sc.neardup_ingest_stream(
        sc.read_documents_stream(spark, os.path.join(docs_dir, "*"),
                                 max_files_per_trigger=1),
        store1, str(tmp_path / "mh_pairs"), str(tmp_path / "mh_ck"))
    assert q.awaitTermination(180)
    fields = spark.read.parquet(store1).schema.fields
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in fields
        if f.name != "batch_id") + ", batch_id BIGINT"
    store2 = str(tmp_path / "mh_store2")
    sc.compact_ingest_store(spark, store1, store2, schema)
    a = spark.read.parquet(store1).drop("batch_id") \
        .orderBy("doc_id").collect()
    b = spark.read.parquet(store2).drop("batch_id") \
        .orderBy("doc_id").collect()
    assert a == b
