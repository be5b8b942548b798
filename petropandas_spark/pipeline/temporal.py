"""Temporal join operators Spark lacks as built-ins: AS-OF (point-in-time)
join and bucketized range join.

Both are expressed as compositions of existing DataFrame ops (no UDFs):

* **as-of join** — union-tag-and-fill: stack the right rows under the left
  rows, sort each ``by`` partition by (ts, side), and carry the last
  non-null right value forward with ``last(..., ignorenulls)`` over an
  unbounded-preceding window.  ONE shuffle on the ``by`` key (same as any
  windowed op); no inequality join, no nested loop.  At 100 TB both inputs
  are pre-partitioned by ``by`` so the union is shuffle-free and only the
  in-partition sort remains.  Tie rule: a right row at exactly the left
  timestamp matches (inclusive, DuckDB ``ASOF JOIN ... >=`` semantics).

* **range join** — equi-join on coarse time buckets (each left row probes
  its own and the adjacent bucket) then an exact bound filter: turns the
  O(n·m) inequality join into a bucket-key shuffle join whose fan-out is
  bounded by bucket occupancy.  Bucket width = the range bound, so every
  true pair shares a bucket or lands in the +/-1 neighbour.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, ts_col: str, by: str,
              value_cols: list[str],
              right_ts_alias: str = "matched_ts") -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``by`` group (backward as-of,
    inclusive).  Left rows with no prior right row keep nulls.

    ``value_cols`` are the right columns to carry (aliases preserved);
    the matched right timestamp lands in ``right_ts_alias``.
    """
    lcols = left.columns
    # the matched right ROW travels as ONE struct and is filled by ONE
    # last(ignorenulls) pass: whole-row as-of semantics (a NULL value
    # column inside the matched row stays NULL — filling each value
    # column independently would smear older rows' values forward),
    # matching DuckDB/pandas ASOF JOIN.  Also: one window pass, not
    # len(value_cols)+1.
    match = F.struct(
        F.col(ts_col).alias("__ts"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    match_type = right.select(match.alias("m")).schema["m"].dataType
    l_side = left.select(
        *lcols,
        F.lit(None).cast(match_type).alias("__match"),
        F.lit(1).alias("__side"),
    )
    r_side = right.select(
        *[
            F.col(by) if c == by
            else F.col(ts_col) if c == ts_col
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        match.alias("__match"),
        F.lit(0).alias("__side"),
    )
    # right rows sort BEFORE left rows at an equal timestamp → inclusive
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_side.unionByName(r_side).withColumn(
        "__match", F.last("__match", ignorenulls=True).over(w)
    )
    return (
        filled.filter(F.col("__side") == 1)
        .select(*lcols,
                F.col("__match.__ts").alias(right_ts_alias),
                *[F.col(f"__match.{c}").alias(c) for c in value_cols])
    )


def range_join(left: DataFrame, right: DataFrame, ts_col: str, by: str,
               bound: int, value_cols: list[str]) -> DataFrame:
    """All (left, right) pairs in the same ``by`` group with
    ``|left.ts - right.ts| <= bound`` — bucketized: each side keys on
    ``ts div bound``, the left probes bucket and bucket±1 (explode of 3
    literals), then the exact bound filter.  Equi-join shuffle only."""
    lb = left.withColumn("__bk", F.expr(f"CAST({ts_col} DIV {bound} AS BIGINT)"))
    lb = lb.withColumn(
        "__probe", F.explode(F.array(
            F.col("__bk") - 1, F.col("__bk"), F.col("__bk") + 1
        ))
    )
    rb = right.select(
        F.col(by).alias("__r_by"),
        F.col(ts_col).alias("__r_ts"),
        F.expr(f"CAST({ts_col} DIV {bound} AS BIGINT)").alias("__r_bk"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    joined = lb.join(
        rb,
        (F.col(by) == F.col("__r_by")) & (F.col("__probe") == F.col("__r_bk")),
    ).filter(
        F.abs(F.col(ts_col) - F.col("__r_ts")) <= F.lit(bound)
    )
    return joined.select(
        *left.columns, F.col("__r_ts").alias("right_ts"),
        *[F.col(f"__r_{c}").alias(c) for c in value_cols],
    )
