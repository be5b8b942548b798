"""IO layer (SURVEY.md §2.1 S1 + §7.2 milestone 6): analysis-table ingest
with clean-on-read, profile helpers, and the column-sum split used by the
dual-axis profile plot (A7).

Clean-on-read = the P1 projection (strip/alias/clip) fused into the first
``select`` after the scan — Catalyst pushes the column pruning into the
parquet/CSV reader, so a 2-column projection reads 2 columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from petropandas_spark.frame import PetroFrame


def read_analyses(spark, path: str, fmt: str | None = None,
                  **options) -> PetroFrame:
    """S1: load an analysis table (CSV with header or parquet) and run the
    P1 clean-on-ingest projection (ref ``data/__init__.py:1-33`` loads its
    bundled CSVs the same way, eagerly)."""
    if fmt is None:
        fmt = "csv" if str(path).endswith(".csv") else "parquet"
    if fmt == "csv":
        df = spark.read.csv(path, header=True, inferSchema=True, **options)
    else:
        df = spark.read.load(path, format=fmt, **options)
    return PetroFrame.ingest(df)


def with_position(df: DataFrame, order_col: str,
                  position_col: str = "position") -> DataFrame:
    """Profiles: materialize an explicit traverse position (Spark has no
    implicit row order — SURVEY.md §1.1 'Profile')."""
    w = Window.orderBy(order_col)
    return df.withColumn(position_col, F.row_number().over(w))


def profile_neighborhood(df: DataFrame, value_cols: list[str],
                         position_col: str = "position") -> DataFrame:
    """Window ops along a traverse: previous/next/rolling-3 mean per value
    column (the neighborhood primitives profile plots build on)."""
    w = Window.orderBy(position_col)
    w3 = w.rowsBetween(-1, 1)
    out = df
    for c in value_cols:
        col = F.col(f"`{c}`")
        out = (
            out.withColumn(f"{c}__prev", F.lag(col).over(w))
            .withColumn(f"{c}__next", F.lead(col).over(w))
            .withColumn(f"{c}__roll3", F.avg(col).over(w3))
        )
    return out


def _variance(values: list[float]) -> float:
    if not values:
        return 0.0
    m = sum(values) / len(values)
    return sum((v - m) ** 2 for v in values) / len(values)


def auto_split(groups: list[DataFrame], candidates: list[str]) -> set[str]:
    """A7: split candidate columns into two plot axes by minimizing summed
    within-group variance of the column means (ref ``_plotting.py:
    1145-1192``).  Means are computed in Spark (one agg per group frame);
    the O(n) contiguous-split search over sorted means runs on the driver
    — the optimal 2-way partition of scalars is always contiguous in
    sorted order (1-D k-means / Jenks)."""
    sums: dict[str, float] = {}
    counts: dict[str, int] = {}
    for df in groups:
        present = [c for c in candidates if c in df.columns]
        if not present:
            continue
        row = df.agg(
            *[F.sum(f"`{c}`").alias(f"s_{c}") for c in present],
            *[F.count(f"`{c}`").alias(f"n_{c}") for c in present],
        ).collect()[0]
        for c in present:
            if row[f"n_{c}"]:
                sums[c] = sums.get(c, 0.0) + float(row[f"s_{c}"] or 0.0)
                counts[c] = counts.get(c, 0) + row[f"n_{c}"]

    means = {c: sums[c] / counts[c] for c in candidates if counts.get(c)}
    return best_two_partition(means, order=candidates)


def best_two_partition(means: dict[str, float],
                       order: list[str] | None = None) -> set[str]:
    """Minimum summed-within-group-variance 2-partition of column means;
    returns the group NOT containing the first column (the secondary
    axis).  Only the n-1 contiguous splits of the sorted means are
    examined — for 1-D squared-error the optimal 2-partition is always
    contiguous in sorted order (the 1-D k-means property, proven by the
    exchange argument; property-tested against exhaustive search in
    ``tests/test_properties.py``)."""
    columns = [c for c in (order or list(means)) if c in means]
    if len(columns) < 2:
        return set()
    sorted_cols = sorted(columns, key=lambda c: means[c])
    best: tuple[float, set[str]] | None = None
    for k in range(1, len(sorted_cols)):
        a, b = set(sorted_cols[:k]), set(sorted_cols[k:])
        v = _variance([means[c] for c in a]) + _variance([means[c] for c in b])
        if best is None or v < best[0]:
            secondary = b if columns[0] in a else a
            best = (v, secondary)
    return best[1]


# -- U11 single-column helpers (ref ``_series.py:38-57``) ---------------------


def col_to_mole(col_name: str):
    """Column expression: oxide wt% → moles for one column."""
    from petropandas_spark import core

    return F.col(f"`{col_name}`") / F.lit(core.MW(col_name))


def col_to_cation(col_name: str, n_oxygens: float, total_oxygens):
    """Column expression: oxide wt% → APFU for one column.  *total_oxygens*
    is a Column (the per-row oxygen-mole sum)."""
    from petropandas_spark import core

    return (
        F.col(f"`{col_name}`") / F.lit(core.MW(col_name))
        * F.lit(float(core.cations_per(col_name)))
        * (F.lit(float(n_oxygens)) / total_oxygens)
    )


def write_bucketed(df: DataFrame, path_table: str, bucket_cols: list[str],
                   n_buckets: int = 64, sort_cols: list[str] | None = None,
                   fmt: str = "parquet") -> None:
    """Persist a table bucketed (and optionally sorted) by its join/agg
    keys, so later equi-joins and groupBys on those keys are co-located
    and shuffle-free (SURVEY.md §4: 'bucketing for co-located joins').
    Bucketed writes go through the session catalog (``saveAsTable``)."""
    writer = (
        df.write.format(fmt).mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(path_table)
