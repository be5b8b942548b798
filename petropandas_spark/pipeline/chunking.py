"""Document chunking — context-window preparation for RAG / training.

Splitting long documents into fixed-size, optionally overlapping chunks
is a scan-resident narrow operation: explode an index sequence, then a
codegen'd ``substr`` per chunk (the `_exploded_shingles` pattern —
deliberately NOT a higher-order ``transform`` lambda, which Spark
evaluates interpreted).  No shuffle, no Python; at 100 TB a chunking
pass costs one read and one write.

Chunk identity is ``(doc_id, chunk_idx)`` with ``chunk_idx`` 0-based in
document order, so downstream joins (embedding per chunk, provenance
back-references) have a stable composite key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(df: DataFrame, chunk_chars: int = 1000,
                    overlap: int = 200, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Fixed-stride character chunks: chunk ``i`` covers
    ``[i·stride, i·stride + chunk_chars)`` with ``stride = chunk_chars −
    overlap``; the last chunk may be short, and every document emits at
    least one chunk (empty text included, as one empty chunk).

    Character-based on purpose: byte/token-exact budgets are a
    tokenizer-specific post-pass; the chunk boundaries here are the
    deterministic substrate they refine."""
    if not 0 <= overlap < chunk_chars:
        raise ValueError("need 0 <= overlap < chunk_chars")
    stride = chunk_chars - overlap
    n = (f"CAST(ceil(greatest(length({text_col}) - {overlap}, 1) "
         f"/ {stride}.0) AS INT)")
    return (
        df.select(
            F.col(id_col),
            F.col(text_col),
            F.expr(n).alias("__n"),
            F.expr(f"explode(sequence(0, {n} - 1))").alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.expr(
                f"substr({text_col}, chunk_idx * {stride} + 1, "
                f"{chunk_chars})"
            ).alias("chunk_text"),
            F.col("__n").alias("n_chunks"),
        )
    )
