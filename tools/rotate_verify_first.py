"""Regenerate the ``_VERIFY_FIRST`` head ordering for the next round.

The driver's correctness gate records rows for the FIRST 50 registry
entries only (observed r01/r02), so ``build_registry`` emits
not-yet-green queries first.  This tool scans every ``CORRECTNESS_r*.json``
in the repo root, collects the set of queries that already have a green
row (``rows_match & schema_match & hash_match``, or a rows-only pass for
no-oracle entries) in ANY round, and prints the ``_VERIFY_FIRST`` list
that puts everything else at the head.  At the start of a round::

    python tools/rotate_verify_first.py            # print the new list
    python tools/rotate_verify_first.py --apply    # rewrite registry.py

``--apply`` splices the regenerated list over the existing
``_VERIFY_FIRST = [...]`` block in ``petropandas_spark/registry.py``
(and re-imports to confirm the module still loads and every name
resolves).  Exit status 1 if any registered query has a FAILED row in
the newest round (fix those before rotating them out of the head).
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from petropandas_spark.registry import build_registry  # noqa: E402


def green_names() -> tuple[dict[str, int], list[str]]:
    """({query: round of LAST green row}, queries failing in the newest round).

    The round number lets the caller rotate STALEST-first: the head-50
    should re-check the queries whose most recent driver verification is
    oldest, so every registry query's driver check stays a bounded number
    of rounds old.
    """
    last_green: dict[str, int] = {}
    newest_fail: list[str] = []
    files = sorted(glob.glob(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CORRECTNESS_r*.json")
    ))
    for path in files:
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        data = json.load(open(path))
        fails = []
        for name, row in data.items():
            if row.get("hash_match"):
                last_green[name] = rnd
            elif row.get("err") == "no_oracle" and row.get("spark_rows"):
                # weaker rows-only signal: driver ran the Spark side
                last_green[name] = rnd
            elif row.get("err") or row.get("hash_match") is False:
                fails.append(name)
        newest_fail = fails  # keep only the last file's failures
    return last_green, newest_fail


def render(names: list[str], last_green: dict[str, int]) -> str:
    unproven = [n for n in names if n not in last_green]
    # stalest first: sort proven names by the round of their last green
    # driver row (ascending), tie-broken by registry order for stability.
    order = {n: i for i, n in enumerate(names)}
    proven = sorted((n for n in names if n in last_green),
                    key=lambda n: (last_green[n], order[n]))
    lines = ["_VERIFY_FIRST = ["]
    if unproven:
        lines.append("    # never driver-checked — always lead:")
    for n in unproven:
        lines.append(f'    "{n}",')
    cap_left = 50 - len(unproven)
    if cap_left > 0:
        lines.append(f"    # {cap_left} head slots left; stalest proven "
                     "names (last-green round in comment):")
        for n in proven[:cap_left]:
            lines.append(f'    "{n}",  # r{last_green[n]:02d}')
    lines.append("]")
    return "\n".join(lines)


def apply_to_registry(block: str) -> None:
    import re

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "petropandas_spark", "registry.py")
    src = open(path).read()
    new, n = re.subn(r"_VERIFY_FIRST = \[.*?\n\]", block, src,
                     count=1, flags=re.S)
    if n != 1:
        raise SystemExit("could not locate _VERIFY_FIRST block")
    open(path, "w").write(new)
    # confirm the module still imports and every head name resolves
    import importlib

    import petropandas_spark.registry as reg
    importlib.reload(reg)
    missing = [k for k in reg._VERIFY_FIRST if k not in reg.build_registry()]
    if missing:
        raise SystemExit(f"rotated names missing from registry: {missing}")


def main() -> int:
    names = list(build_registry())
    last_green, newest_fail = green_names()
    unproven = [n for n in names if n not in last_green]
    print(f"# registry: {len(names)} queries; green in some round: "
          f"{len(names) - len(unproven)}; never green: {len(unproven)}")
    if newest_fail:
        print(f"# FAILING in newest round (fix first!): {newest_fail}")
    block = render(names, last_green)
    if "--apply" in sys.argv[1:]:
        apply_to_registry(block)
        print("# applied to petropandas_spark/registry.py")
    else:
        print(block)
    return 1 if newest_fail else 0


if __name__ == "__main__":
    sys.exit(main())
