"""Driver-environment insurance: replay registry queries under a BARE
default SparkSession (no AQE/shuffle/timezone/memory tuning — whatever
the driver's harness happens to build) and hash-compare against the
DuckDB oracle.  The engine's exactness design (integer partial sums,
explicit floors before casts, UTC pinned inside ``_load`` rather than on
the session) must make results independent of session configuration::

    python tools/check_default_session.py [sf_dir] [name ...]

Defaults to a config-sensitive subset: timezone-adjacent events queries,
float-heavy domain chains, and the round-3 additions.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# single-sourced with the main oracle gate — a hashing fix must not have
# to be made twice
from check_oracle import TABLES, value_hash  # noqa: E402

DEFAULT_SUBSET = [
    "events_hourly", "events_sessionize", "events_asof_last_purchase",
    "events_gap_filled_locf", "events_user_value_anomalies",
    "events_zorder_values", "lsh_incremental_pairs",
    "corpus_mixture_reweighted", "dedup_exact_normalized",
    "doc_chunks_overlap", "containment_verified_pairs", "cipw_norm_full",
    "garnet_end_members", "weighted_mean_grouped",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT_SUBSET

    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[*]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(_REPO, "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs, oracles = m.queries(), m.oracle_sql()

    fails = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir)
            s_cols = sorted(sdf.columns)
            srows = [tuple(r) for r in sdf.select(*s_cols).collect()]
            con.execute(f"SELECT * FROM ({oracles[name]})")
            cols = [d[0] for d in con.description]
            idx = [cols.index(c) for c in sorted(cols)]
            orows = [tuple(r[i] for i in idx) for r in con.fetchall()]
            ok = (s_cols == sorted(cols)
                  and len(srows) == len(orows)
                  and value_hash(srows) == value_hash(orows))
            print(("OK  " if ok else "FAIL ") + f"{name} ({len(srows)} rows)")
            fails += 0 if ok else 1
        except Exception as ex:  # noqa: BLE001 — keep checking the rest
            print(f"FAIL {name}: {type(ex).__name__}: {ex}")
            fails += 1
    print(f"{len(names) - fails} pass, {fails} fail")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
