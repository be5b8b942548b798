"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k (exact; one broadcast of the query
vector, a narrow scored projection, and a rank-limit — Spark plans
WindowGroupLimit / TakeOrderedAndProject, no global sort materialization).

Scale path: IVF — KMeans (Spark MLlib, trained on a sample) assigns every
vector to a centroid partition; a query probes only the ``n_probe``
nearest centroids, cutting the scan to ``n_probe/k`` of the corpus.  At
100 TB the corpus would additionally be written bucketed/partitioned by
``cluster`` so a probe is partition-pruned I/O, not a filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _cosine(a, b):
    """Higher-order-function cosine (interpreted — fine for small inputs;
    hot paths use the unrolled codegen variant below)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n1 = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    n2 = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (n1 * n2)


def _dot_unrolled(a: str, b: str, dim: int):
    """Dot product as `dim` element_at terms — whole-stage-codegen'd,
    unlike aggregate()/zip_with() lambdas which Spark interprets (~10×
    slower in the all-pairs hot path)."""
    return sum(
        (F.element_at(a, i + 1) * F.element_at(b, i + 1) for i in range(dim)),
        F.lit(0.0),
    )


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    return df.select(F.size(vec_col).alias("d")).first()["d"]


def _as_double(col):
    return F.col(col).cast("array<double>")


def brute_force_topk(df: DataFrame, query: list[float], k: int = 10,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query]).cast("array<double>")
    scored = df.select(
        id_col, _cosine(_as_double(vec_col), q).alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def cosine_neardup_pairs(df: DataFrame, threshold: float = 0.95,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id") -> DataFrame:
    """All-pairs cosine above a threshold (exact; for modest n or as the
    verify stage after IVF/LSH blocking).  Norms are precomputed per
    vector (narrow pass) and the per-pair dot product is unrolled to
    codegen'd element_at terms."""
    dim = _vec_dim(df, vec_col)
    normed = df.select(
        F.col(id_col),
        _as_double(vec_col).alias("v"),
    ).withColumn(
        "nrm", F.sqrt(_dot_unrolled("v", "v", dim))
    )
    a = normed.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"),
                      F.col("nrm").alias("na"))
    b = normed.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"),
                      F.col("nrm").alias("nb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", _dot_unrolled("va", "vb", dim) / (F.col("na") * F.col("nb"))
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


class IVFIndex:
    """Inverted-file ANN: KMeans centroids + cluster assignment.

    ``build`` fits MLlib KMeans and returns the corpus with a ``cluster``
    column (cache/persist or write bucketed-by-cluster for reuse);
    ``search`` probes the n_probe nearest centroids only.
    """

    def __init__(self, k: int = 16, seed: int = 42):
        self.k = k
        self.seed = seed
        self.centroids: list[list[float]] | None = None

    def build(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector, vector_to_array

        feats = df.withColumn("__features",
                              array_to_vector(_as_double(vec_col)))
        model = KMeans(
            k=self.k, seed=self.seed, featuresCol="__features",
            predictionCol="cluster",
        ).fit(feats)
        self.centroids = [list(c) for c in model.clusterCenters()]
        assigned = model.transform(feats).drop("__features")
        del vector_to_array  # imported for symmetry; not needed further
        return assigned

    def _probe_clusters(self, query: list[float], n_probe: int) -> list[int]:
        import math

        def cos(u, v):
            dot = sum(x * y for x, y in zip(u, v))
            nu = math.sqrt(sum(x * x for x in u))
            nv = math.sqrt(sum(x * x for x in v))
            return dot / (nu * nv) if nu and nv else -1.0

        ranked = sorted(
            range(len(self.centroids)),
            key=lambda i: -cos(query, self.centroids[i]),
        )
        return ranked[:n_probe]

    def search(self, assigned: DataFrame, query: list[float], k: int = 10,
               n_probe: int = 4, vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
        """Top-k within the probed clusters (partition-prunable filter)."""
        probes = self._probe_clusters(query, n_probe)
        subset = assigned.filter(F.col("cluster").isin(probes))
        return brute_force_topk(subset, query, k, vec_col, id_col)
