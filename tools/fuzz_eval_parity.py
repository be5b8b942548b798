"""Offline eval-dialect parity fuzz vs the REFERENCE implementation.

Generates random expressions over the FULL pandas-eval operator surface
the rewriter supports — ``+ - * / //`` arithmetic (nested), ``< <= > >=
== !=`` comparisons, ``& | ~`` boolean composition, backticked exotic
names, and names missing from the frame (zero-fill) — and runs each
through the reference ``BasePlot._eval`` (pandas) and the engine's
``eval_expr`` (Spark), requiring repr-identical values row for row.

This is the harness that caught: DECIMAL-typed bare literals, signed-
zero division, Spark's NaN comparison ordering, numpy's fmod-based
floor_divide, and the nested-division Catalyst blowup.  Run it after
touching ``plotting.rewrite_eval_expr``::

    python tools/fuzz_eval_parity.py [n_exprs] [seed]

Comparison generators always anchor on a column: pandas constant-folds
scalar comparisons to Python bools, and ``~scalar_bool`` is Python's
integer invert (-2) — an accident of pandas' evaluator, not dialect
semantics (the engine's uniform logical NOT is the deliberate
behavior).
"""

from __future__ import annotations

import os
import random
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "refshim"))
sys.path.append("/root/reference/src")
warnings.filterwarnings("ignore")

import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from petropandas._plotting import BasePlot  # noqa: E402
from petropandas_spark.plotting import eval_expr  # noqa: E402

BASE = pd.DataFrame({
    "id": [0, 1, 2, 3, 4],
    "Prp": [12.7, 0.0, 99.9, 1e-8, 45.3],
    "Alm": [75.2, 1e3, 0.0, 21.7, 0.05],
    "Sps": [7.6, 0.1, 31.0, 0.0, 12.1],
    "H2O wt%": [1.2, 0.0, 3.4, 0.8, 2.2],
})
TERMS = ["Prp", "Alm", "Sps", "`H2O wt%`", "Missing1"]  # Missing1 zero-fills


def main(n: int = 400, seed: int = 1234) -> int:
    rng = random.Random(seed)
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    sdf = spark.createDataFrame(BASE)

    def num(depth=0):
        if depth >= 3 or rng.random() < 0.4:
            if rng.random() < 0.25:
                return repr(rng.uniform(-50, 50))
            return rng.choice(TERMS)
        op = rng.choice(["+", "-", "*", "/", "/", "//"])
        return f"({num(depth + 1)} {op} {num(depth + 1)})"

    def boolean(depth=0):
        cmp_op = rng.choice(["<", "<=", ">", ">=", "==", "!="])
        left = rng.choice(TERMS[:4])
        base = f"(({left} + {num(depth + 1)}) {cmp_op} {num(depth + 1)})"
        r = rng.random()
        if depth >= 2:
            return base
        if r < 0.25:
            return f"(~{boolean(depth + 1)})"
        if r < 0.5:
            return f"({boolean(depth + 1)} & {boolean(depth + 1)})"
        if r < 0.7:
            return f"({boolean(depth + 1)} | {boolean(depth + 1)})"
        return base

    bad = ref_err = 0
    for _ in range(n):
        if rng.random() < 0.7:
            expr = f"({rng.choice(TERMS[:4])} + {num(1)})"
        else:
            expr = boolean()
        try:
            want = BasePlot._eval(expr, BASE).tolist()
        except Exception:
            ref_err += 1
            continue
        got = (sdf.select("id", eval_expr(sdf, expr).alias("v"))
               .toPandas().sort_values("id")["v"].tolist())
        rep = lambda v: repr(float(v)) if isinstance(v, float) \
            else repr(bool(v))
        if [rep(a) for a in want] != [rep(b) for b in got]:
            bad += 1
            print("MISMATCH:", expr)
            print("  want", want)
            print("  got ", got)
            if bad > 4:
                break
    print(f"done: {n} exprs, {ref_err} reference-side errors skipped, "
          f"{bad} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 400,
                  int(sys.argv[2]) if len(sys.argv) > 2 else 1234))
