"""Regenerate petropandas_spark/hpxeos/sf_blocks.py — the verbatim public
THERMOCALC axfile ``sf`` blocks — from the reference's per-phase
transcriptions (the same published axfile data both projects carry).

Run: python tools/extract_sf_blocks.py
"""

from __future__ import annotations

import os
import re

REF = "/root/reference/src/petropandas/hpxeos"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "petropandas_spark", "hpxeos", "sf_blocks.py",
)

MAP = {
    "metapelite": {
        "mu": "metapelite/muscovite.py", "ma": "metapelite/margarite.py",
        "ctd": "metapelite/chloritoid.py", "cd": "metapelite/cordierite.py",
        "st": "metapelite/staurolite.py", "ep": "metapelite/epidote.py",
        "pl4tr": "metapelite/plagioclase.py", "k4tr": "metapelite/kfeldspar.py",
        "opx": "metapelite/orthopyroxene.py", "ilm": "metapelite/ilmenite.py",
        "ilmm": "metapelite/ilmenite_mixed.py", "sp": "metapelite/spinel.py",
        "mt1": "metapelite/magnetite.py", "sa": "metapelite/sapphirine.py",
        "plc": "metapelite/plagioclase_cbar1.py",
        "ksp": "metapelite/kfeldspar_cbar1.py",
    },
    "metabasite": {
        "ol": "metabasite/olivine.py", "hb": "metabasite/amphibole.py",
        "aug": "metabasite/augite.py", "dio": "metabasite/omphacite.py",
        "abc": "metabasite/peristerite.py",
        "pli": "metabasite/plagioclase_ibar1.py",
        "g": "metabasite/garnet.py", "bi": "metabasite/biotite.py",
        "chl": "metabasite/chlorite.py", "opx": "metabasite/orthopyroxene.py",
        "ilmm": "metabasite/ilmenite_mixed.py", "mu": "metabasite/muscovite.py",
    },
    "igneous": {
        "g_W24": "igneous/garnet.py", "ol_H18": "igneous/olivine.py",
        "cd_G25": "igneous/cordierite.py", "ilm_W24": "igneous/ilmenite.py",
        "bi_G25": "igneous/biotite.py", "opx_W24": "igneous/orthopyroxene.py",
        "cpx_W24": "igneous/clinopyroxene.py", "spl_T21": "igneous/spinel.py",
        "ep": "metapelite/epidote.py", "mu": "metapelite/muscovite.py",
        "pl4tr": "metapelite/plagioclase.py", "hb": "metabasite/amphibole.py",
    },
}

_PAT = re.compile(r'_SF_BLOCK\s*=\s*"""(.*?)"""', re.S)


def main() -> int:
    out = [
        '"""Verbatim THERMOCALC axfile ``sf`` blocks (X10 site-occupancy',
        "self-check surface) for every solution phase in the three model sets.",
        "",
        "These strings are PUBLIC THERMOCALC data (tc-mp50*/tc-mb50*/tc-ig50*",
        "axfiles by Holland, Powell, Green, White, Weller et al.), identical by",
        "nature to the transcriptions the reference carries in each phase file",
        "(e.g. ``/root/reference/src/petropandas/hpxeos/metapelite/garnet.py``",
        "``_SF_BLOCK``); the evaluation machinery is independent",
        "(``hpxeos.add_site_occupancies`` compiles them to SQL expressions).",
        'Regenerate with ``tools/extract_sf_blocks.py``.\n"""\n',
        "SF_BLOCKS: dict[str, dict[str, str]] = {",
    ]
    for setname, phases in MAP.items():
        out.append(f"  {setname!r}: {{")
        for ab, rel in phases.items():
            with open(os.path.join(REF, rel)) as f:
                m = _PAT.search(f.read())
            assert m, rel
            out.append(f"    {ab!r}: '''{m.group(1)}''',")
        out.append("  },")
    out.append("}\n")
    with open(OUT, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {OUT}: {sum(len(v) for v in MAP.values())} blocks")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
