"""Capture ``.explain("formatted")`` for registry queries into
``plans/<tag>/<name>_<suffix>.txt`` — the optimization-round evidence
files (judge checks plan claims against these).

Usage::

    python tools/capture_plans.py <tag> <suffix> [name ...]

e.g. ``python tools/capture_plans.py r14 before media_video_neardups``.
With no names, captures every registry query.  Uses the same session
shape as bench.py (local[$SPARK_GRAFT_CPUS], AQE on) so the captured
plans are the benched plans.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("plan-capture")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as e

    out_dir = os.path.join(repo, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    qs = e.queries()
    names = only or list(qs)
    for name in names:
        fn = qs[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
        except Exception as ex:  # noqa: BLE001 — record, keep going
            plan = f"PLAN CAPTURE FAILED: {type(ex).__name__}: {ex}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
