"""Multi-probe recall sweep — the r11 measurement behind the
docs/scale.md recall table.

Two regimes:

1. **Mining regime (threshold 0.3, raw testdata)** — the r10 table's
   setting: "near-dups" are the cosine tail of random-ish synthetic
   vectors, the HARDEST case for sign-bit LSH (per-plane agreement
   p = 1-θ/π ≈ 0.60).  Reproduces the r10 rows and adds the Hamming≤2
   column.

2. **Production SemDeDup regime (threshold 0.9 / 0.95, planted
   twins)** — the testdata's max pairwise cosine is ~0.5-0.6 (measured;
   no synthetic row has a high-cosine partner), so the regime real
   semantic dedup runs in is measured on a DETERMINISTIC planted-twin
   corpus derived from the same testdata: every base vector v gets one
   twin at an EXACT target cosine (v' = cosθ·v̂ + sinθ·û with û a
   seeded unit vector orthogonal to v̂ — the rotation construction, so
   cos(v, v') = cosθ up to FP), half the twins at 0.92 and half at
   0.97, twin ids offset by 1e6.  Ground truth = the numpy exhaustive
   pair set at each threshold over the planted corpus.

Usage::

    python tools/recall_sweep.py [sf_dir ...]

Prints one markdown table per sf_dir plus candidate-volume counts (the
cost side of the recall knob).
"""

from __future__ import annotations

import sys

import numpy as np

TWIN_OFFSET = 1_000_000


def planted_corpus(V: np.ndarray, ids: list[int],
                   targets=(0.92, 0.97), seed: int = 42):
    """Base vectors + one twin each at an exact target cosine
    (alternating through ``targets`` by row order — deterministic)."""
    rng = np.random.default_rng(seed)
    vhat = V / np.linalg.norm(V, axis=1, keepdims=True)
    W = rng.standard_normal(V.shape)
    # component of W orthogonal to each base vector, normalized
    U = W - (np.einsum("ij,ij->i", W, vhat))[:, None] * vhat
    U /= np.linalg.norm(U, axis=1, keepdims=True)
    cos_t = np.array([targets[i % len(targets)] for i in range(len(V))])
    twins = cos_t[:, None] * vhat + np.sqrt(1 - cos_t**2)[:, None] * U
    all_ids = list(ids) + [i + TWIN_OFFSET for i in ids]
    all_V = np.vstack([V, twins])
    return all_ids, all_V


def exact_pairs(ids, V, threshold):
    n = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = n @ n.T
    iu, ju = np.triu_indices(len(ids), 1)
    keep = C[iu, ju] >= threshold
    return {(min(ids[a], ids[b]), max(ids[a], ids[b]))
            for a, b in zip(iu[keep], ju[keep])}


def main() -> int:
    sys.path.insert(0, "/root/repo")
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01",
                               "/root/testdata/sf0.1"]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("recall-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from petropandas_spark.pipeline import similarity as sim

    for sf_dir in sf_dirs:
        rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
            .select("vec_id", "embedding").collect()
        ids = [r.vec_id for r in rows]
        V = np.array([r.embedding for r in rows], dtype="float64")

        print(f"\n## {sf_dir} (N={len(ids)})")

        # regime 1: raw corpus at the mining threshold
        print("\n| corpus | threshold | blocking | recall | "
              "candidate pairs |")
        print("|---|---|---|---|---|")
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in zip(ids, V)],
            "vec_id long, embedding array<double>")
        truth = exact_pairs(ids, V, 0.3)
        for h in (1, 2):
            got = {(r.id_a, r.id_b) for r in sim.multiprobe_cell_pairs(
                df, threshold=0.3, max_hamming=h).collect()}
            n_cand = _candidates(sim, df, h)
            print(f"| raw | 0.30 | Hamming≤{h} | "
                  f"{len(got & truth) / max(1, len(truth)):.3f} "
                  f"| {n_cand} |")

        # regime 2: planted twins at production thresholds
        p_ids, p_V = planted_corpus(V, ids)
        pdf = spark.createDataFrame(
            [(i, v.tolist()) for i, v in zip(p_ids, p_V)],
            "vec_id long, embedding array<double>")
        for thr in (0.9, 0.95):
            truth = exact_pairs(p_ids, p_V, thr)
            for h in (1, 2):
                got = {(r.id_a, r.id_b) for r in
                       sim.multiprobe_cell_pairs(
                           pdf, threshold=thr, max_hamming=h).collect()}
                n_cand = _candidates(sim, pdf, h)
                print(f"| planted twins (2N={len(p_ids)}) | {thr:.2f} "
                      f"| Hamming≤{h} | "
                      f"{len(got & truth) / max(1, len(truth)):.3f} "
                      f"| {n_cand} |")
    spark.stop()
    return 0


def _candidates(sim, df, max_hamming):
    """Candidate-pair volume of the probe stage (the cost side)."""
    from pyspark.sql import functions as F

    from petropandas_spark.pipeline.dedup import _incremental_value_pairs

    n_cells = sim.scaled_cells(df.count())
    b = (n_cells - 1).bit_length()
    assigned = sim.scaled_sign_clusters(df, n_cells)
    keys = assigned.select("vec_id", "cluster")
    home = keys.withColumn("__new", F.lit(True))
    offsets = [1 << j for j in range(b)]
    if max_hamming >= 2:
        offsets += [(1 << i) | (1 << j)
                    for i in range(b) for j in range(i + 1, b)]
    probes = keys.select(
        "vec_id",
        F.explode(F.array(*[
            F.col("cluster").bitwiseXOR(F.lit(off)) for off in offsets
        ])).alias("cluster"),
    ).withColumn("__new", F.lit(False))
    flagged = home.unionByName(probes).withColumn("__shard", F.lit(0))
    return (_incremental_value_pairs(flagged, "vec_id", ["cluster"],
                                     10_000)
            .select(F.least("a", "b"), F.greatest("a", "b"))
            .distinct().count())


if __name__ == "__main__":
    raise SystemExit(main())
