"""Regenerate petropandas_spark/hpxeos/site_defs.py — per-phase
crystallographic site definitions (name, capacity, cation priority) —
from the reference's Phase classes via the refshim import.

These are public crystallographic facts (the THERMOCALC site models every
implementation of these a-x phases carries), extracted as DATA like the
sf/p axfile blocks — the allocation machinery consuming them is this
repo's own (`minerals.add_site_allocation`).

Run: python tools/extract_site_defs.py
"""

from __future__ import annotations

import os
import sys

TOOLS = os.path.dirname(os.path.abspath(__file__))
for p in (os.path.dirname(TOOLS), os.path.join(TOOLS, "refshim"),
          "/root/reference/src"):
    if p not in sys.path:
        sys.path.insert(0, p)

OUT = os.path.join(
    os.path.dirname(TOOLS), "petropandas_spark", "hpxeos", "site_defs.py"
)


def main() -> None:
    from petropandas.hpxeos import igneous, metabasite, metapelite

    sets = {
        "metapelite": metapelite,
        "metabasite": metabasite,
        "igneous": igneous,
    }
    lines = [
        '"""Per-phase crystallographic site definitions (GENERATED — run',
        "tools/extract_site_defs.py).  {set: {abbrev: ((name, capacity,",
        '(priority...)), ...)}}"""',
        "",
        "SITE_DEFS = {",
    ]
    for set_name, mod in sets.items():
        lines.append(f'    "{set_name}": {{')
        for attr in sorted(dir(mod)):
            if not attr.startswith("TC_"):
                continue
            phase = getattr(mod, attr)
            ab = phase.abbreviation
            defs = getattr(type(phase), "site_definitions", None) or getattr(
                phase, "site_definitions", []
            )
            if not defs:
                continue
            rendered = ", ".join(
                f'("{d["name"]}", {float(d["capacity"])!r}, '
                + "("
                + ", ".join(f'"{p}"' for p in d["priority"])
                + ("," if len(d["priority"]) == 1 else "")
                + "))"
                for d in defs
            )
            lines.append(f'        "{ab}": ({rendered},),')
        lines.append("    },")
    lines.append("}")
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
