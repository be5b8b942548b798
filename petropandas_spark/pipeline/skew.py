"""Skew-mitigation join helpers (the 100 TB checklist: 'skewed keys →
salting or AQE skew-join', SURVEY.md §4.4).

AQE's skew-join split handles sort-merge joins automatically; salting is
the explicit fallback for the cases AQE cannot rebalance — e.g. a
broadcast-ineligible dimension replicated against a heavily skewed fact
key, or aggregations over a hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Join a skewed fact to a non-broadcastable dim by salting: the fact
    side gets a random salt in [0, n_salts); the dim side is replicated
    once per salt value, so each hot key spreads over ``n_salts`` shuffle
    partitions instead of one straggler."""
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(n_salts)])
    ).alias("__salt")
    replicated_dim = dim.select("*", salts)
    out = salted_fact.join(replicated_dim, [key, "__salt"], how)
    return out.drop("__salt")


def salted_count_by_key(df: DataFrame, key: str,
                        n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: partial counts per
    (key, salt) — map-side combinable and evenly spread — then the final
    roll-up over the (small) per-salt partials."""
    partial = (
        df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("count"))
