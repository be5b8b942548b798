"""Audit whole-stage-codegen method sizes across the registry.

HotSpot's JIT silently refuses to compile methods over 8000 bytecode
(-XX:DontCompileHugeMethods, on by default): a fused projection chain
whose consume() crosses that line executes in the BYTECODE INTERPRETER —
the plan looks codegen'd, compiles fine, and runs 4-10× slow with no
warning (round-7 finding: the 23-projection amphibole stoichiometry
chain at 9736 bytecode, 6.1 s → 1.6 s once JIT-able).  Since round 8
the engine splits wide chains with codegen barriers
(sqlgen.codegen_barrier / Plan.apply CODEGEN_SPLIT_TEXT) so NO query
may exceed the limit on a stock JVM — this audit must report an empty
flagged set; the plan-quality gate pins that::

    python tools/codegen_audit.py            # flagged queries only
    python tools/codegen_audit.py --all      # every query's max size

Uses Spark's debug codegenStringSeq (the same numbers EXPLAIN CODEGEN
prints) at sf0.001 — method size depends on the plan, not the data.
"""

from __future__ import annotations

import json
import os
import sys

JIT_LIMIT = 8000  # HotSpot DontCompileHugeMethods threshold (bytecode)


def audit_queries(spark, queries, sf_dir) -> list[tuple]:
    """(name, maxMethodCodeSize, n_codegen_units) per query; size -1 with
    the first error line as the third element when a query won't plan.
    Shared by the CLI below and the slow test gate
    (tests/test_codegen_gate.py) so the registry-wide sweep is asserted
    on every closing code state, not just when the tool is run by hand —
    CODEGEN_SPLIT_TEXT is a chars-based heuristic (sqlgen.py) and a
    denser-than-calibrated bytecode/char expression family must fail
    loudly, not silently interpret on stock JVMs."""
    debug = spark._jvm.org.apache.spark.sql.execution.debug
    rows = []
    for name, fn in queries.items():
        try:
            df = fn(spark, sf_dir)
            seq = debug.package.codegenStringSeq(
                df._jdf.queryExecution().executedPlan())
            worst = 0
            n_units = seq.size()
            for i in range(n_units):
                # tuple of (subtree, code, codeStats)
                stats = seq.apply(i)._3()
                worst = max(worst, stats.maxMethodCodeSize())
            rows.append((name, worst, n_units))
        except Exception as exc:  # streaming-only entries etc.
            rows.append((name, -1, str(exc).splitlines()[0][:60]))
    return rows


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_AUDIT_SF", "/root/testdata/sf0.001")
    show_all = "--all" in sys.argv[1:]
    only = [a for a in sys.argv[1:] if not a.startswith("-")]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("codegen-audit")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as e

    qs = e.queries()
    if only:
        qs = {n: f for n, f in qs.items() if n in only}
    rows = audit_queries(spark, qs, sf_dir)

    flagged = [(n, w, u) for n, w, u in rows
               if isinstance(w, int) and w > JIT_LIMIT]
    out = {
        "jit_limit": JIT_LIMIT,
        "n_queries": len(rows),
        "flagged": {n: w for n, w, _ in flagged},
    }
    if show_all:
        out["all"] = {n: w for n, w, _ in rows}
    print(json.dumps(out, indent=1))
    for n, w, u in flagged:
        print(f"# {n}: maxMethodCodeSize={w} over {u} codegen units — "
              f"interpreted under default JVM flags", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
