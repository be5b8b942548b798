"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at sf0.01, comparing row-count, schema (sorted column names)
and an order-insensitive value hash. Usage::

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows: list[tuple]) -> str:
    """Order-insensitive hash over stringified rows (floats via repr)."""

    def cell(v) -> str:
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, list):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    lines = sorted("|".join(cell(v) for v in row) for row in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_skip = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # fixture-pinned oracles (CIPW: the branching cascade isn't
        # SQL-expressible, so the oracle is a PINNED sf0.01 expectation
        # parquet) are only comparable at the scale they pin — at any
        # other sf the rowcount mismatch is BY DESIGN, not a failure
        oracle = oracles.get(name, "")
        if "sf001.parquet" in oracle and "sf0.01" not in sf_dir:
            print(f"- {name}: fixture-pinned oracle (sf0.01 only), "
                  f"skipped at {sf_dir}")
            n_skip += 1
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sorted(sdf.columns)
            s_rows = [tuple(r[c] for c in s_cols) for r in sdf.collect()]
            if name not in oracles:
                print(f"  {name}: rows-only ({len(s_rows)} rows)")
                n_pass += 1
                continue
            d = con.execute(oracles[name])
            d_cols_raw = [c[0] for c in d.description]
            order = sorted(range(len(d_cols_raw)), key=lambda i: d_cols_raw[i])
            d_cols = [d_cols_raw[i] for i in order]
            d_rows = [tuple(r[i] for i in order) for r in d.fetchall()]
            problems = []
            if s_cols != d_cols:
                problems.append(f"schema {s_cols} != {d_cols}")
            if len(s_rows) != len(d_rows):
                problems.append(f"rowcount {len(s_rows)} != {len(d_rows)}")
            if not problems and value_hash(s_rows) != value_hash(d_rows):
                diffs = 0
                for a, b in zip(sorted(map(str, s_rows)), sorted(map(str, d_rows))):
                    if a != b:
                        diffs += 1
                        if diffs <= 2:
                            problems.append(f"row diff:\n    spark={a}\n    duck ={b}")
                problems.append(f"hash mismatch ({diffs} differing rows)")
            if problems:
                n_fail += 1
                print(f"✗ {name}: " + "; ".join(problems))
            else:
                n_pass += 1
                print(f"✓ {name} ({len(s_rows)} rows)")
        except Exception as ex:  # noqa: BLE001
            n_fail += 1
            print(f"✗ {name}: EXCEPTION {type(ex).__name__}: {ex}")
        finally:
            # several pipeline queries persist() intermediates; drop them
            # so a full-registry run doesn't accumulate storage pressure
            spark.catalog.clearCache()
    skip_note = f", {n_skip} fixture-pinned skipped" if n_skip else ""
    print(f"\n{n_pass} pass, {n_fail} fail{skip_note}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
