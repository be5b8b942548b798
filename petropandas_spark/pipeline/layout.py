"""Multi-dimensional data layout: Z-order (Morton) clustering for
min/max data skipping.

Parquet readers skip row groups / files whose column min/max statistics
exclude the predicate.  Sorting by ONE column gives perfect skipping on
that column and none on any other; interleaving the bits of several
columns (the Z-order curve — Morton 1966, the standard lakehouse
OPTIMIZE ZORDER technique) gives good-but-not-perfect skipping on ALL
of them at once.  At 100 TB this is the difference between a
``WHERE user_id BETWEEN … AND value BETWEEN …`` query opening a few
files and opening every file.

Everything here is codegen'd integer arithmetic (shiftleft / shiftright
/ bitwise-and sums) — no UDF, no shuffle beyond the one range
repartition that the clustered write requires anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.column import Column


def quantize(col, lo: float, hi: float, bits: int = 16) -> Column:
    """Clamp ``col`` into [lo, hi] and scale to an integer in
    [0, 2^bits − 1].  Fixed bounds (not per-batch min/max) keep the
    z-value stable across ingestion batches — files written months
    apart still cluster consistently."""
    if not float(lo) < float(hi):
        raise ValueError("need lo < hi (a zero span divides by zero and "
                         "yields all-NULL z-values)")
    col = F.col(col) if isinstance(col, str) else col
    span = float(hi) - float(lo)
    top = (1 << bits) - 1
    scaled = (F.least(F.greatest(col.cast("double"), F.lit(float(lo))),
                      F.lit(float(hi))) - F.lit(float(lo))) / F.lit(span)
    # explicit floor: Spark's double→bigint cast truncates, DuckDB's
    # ROUNDS — floor first so both engines agree on every value
    return F.least(
        F.floor(scaled * F.lit(float(top + 1))).cast("bigint"), F.lit(top)
    )


def zorder_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Bit-interleaved Morton code of two pre-quantized integer columns:
    bit ``i`` of ``a`` lands at position ``2i``, bit ``i`` of ``b`` at
    ``2i + 1``.  A sum of ``2·bits`` shift/mask terms — one codegen'd
    projection, exactly reproducible in any engine (the driver oracle
    replays it in DuckDB)."""
    if not 1 <= bits <= 31:
        raise ValueError("need 1 <= bits <= 31 (bit 2·bits−1 must stay "
                         "below the bigint sign bit or z goes negative "
                         "and the curve ordering breaks)")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(
            F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def write_zordered(df: DataFrame, path: str, z_col: Column,
                   n_files: int, mode: str = "overwrite") -> None:
    """Cluster-by-z write: range-repartition on the z-value (contiguous
    curve segments per file) + within-file sort, so every file's min/max
    box on BOTH source columns is tight.  One shuffle — the same one any
    clustered write pays."""
    (df.withColumn("__z", z_col)
     .repartitionByRange(n_files, "__z")
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode(mode).parquet(path))
