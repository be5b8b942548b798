"""Generate the pinned sf0.01 CIPW expectation fixtures (B6/B7 oracle).

The full GCDkit CIPW cascade is not SQL-expressible, so the driver's
DuckDB oracle for ``cipw_norm_full`` / ``cipw_norm_hornblende`` reads a
pinned parquet written by this script instead of recomputing.  Contract:

  * the fixture is the engine's own sf0.01 output (a regression pin) —
    bit-identical on re-run because the kernel is deterministic NumPy;
  * independence from the engine is established separately: this script
    ALSO recomputes the same rows through the reference implementation
    (via tools/refshim) and refuses to write unless they agree to 1e-9
    (the same bar as tests/test_bulk.py).

Run from the repo root::

    python tools/make_cipw_fixture.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
for p in (f"{REPO}/tools/refshim", "/root/reference/src"):
    if p not in sys.path:
        sys.path.append(p)

SF_DIR = "/root/testdata/sf0.01"
OUT = f"{REPO}/tests/fixtures"


def main() -> int:
    from pyspark.sql import SparkSession

    from petropandas_spark.registry import build_registry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("cipw-fixture")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = build_registry()

    from petropandas import _calc as ref_calc  # reference via refshim

    os.makedirs(OUT, exist_ok=True)
    for qname, fname, ref_fn in [
        ("cipw_norm_full", "cipw_full_sf001.parquet", ref_calc.cipw_norm),
        ("cipw_norm_hornblende", "cipw_hb_sf001.parquet", ref_calc.cipw_norm_hb),
    ]:
        got = reg[qname].spark_fn(spark, SF_DIR).toPandas()
        got = got.sort_values("id").reset_index(drop=True)

        # independent recomputation through the reference implementation
        inputs = (
            reg["bulk_oxide_ratios"].spark_fn(spark, SF_DIR)  # any granite source
            .sparkSession.read.parquet(f"{SF_DIR}/supplier.parquet")
        )
        from petropandas_spark.registry import PSEUDO_GRANITE

        base = inputs.selectExpr(
            *[f"{e} AS {a}" for a, e in PSEUDO_GRANITE]
        ).toPandas().sort_values("id").reset_index(drop=True)
        ref_out = ref_fn(base.drop(columns=["id"]), complete_results=True)
        common = [c for c in got.columns if c in ref_out.columns]
        a = got[common].to_numpy(dtype=float)
        b = ref_out[common].to_numpy(dtype=float)
        mask = ~(np.isnan(a) & np.isnan(b))
        if not np.allclose(a[mask], b[mask], rtol=0, atol=1e-9):
            raise SystemExit(f"{qname}: engine vs reference drift > 1e-9")
        # columns the reference dropped are all-zero by definition (its
        # A4/A5 drop rule) — assert the engine agrees they are zero/NaN
        extra = [c for c in got.columns if c not in ref_out.columns and c != "id"]
        ex = got[extra].to_numpy(dtype=float)
        ex = ex[~np.isnan(ex)]
        if len(ex) and np.abs(ex).max() > 1e-9:
            raise SystemExit(f"{qname}: nonzero value in reference-dropped column")
        got.to_parquet(f"{OUT}/{fname}", index=False)
        print(f"wrote {OUT}/{fname} ({len(got)} rows, ref-checked {len(common)} cols)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
