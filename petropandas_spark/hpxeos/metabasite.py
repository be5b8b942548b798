"""Metabasite phase set (Green, White, Diener, Powell, Holland & Palin
2016) — THERMOCALC axfile tc-mb51NCKFMASHTO.txt.  Several metapelite phases
are reused verbatim by the axfile (garnet, biotite, chlorite, muscovite,
orthopyroxene, ilmenite-mixed) — re-exported here under the same registry.
"""

from __future__ import annotations

from petropandas_spark.hpxeos import PhaseSpec
from petropandas_spark.hpxeos.metapelite import (
    _CA, _FE2, _FE3, _K, _MG, _MN, _NA, _SI, _AL, _TI,
    BIOTITE, CHLORITE, GARNET, ILMENITE_MIXED, MUSCOVITE, ORTHOPYROXENE,
    _ratio,
)
from petropandas_spark.minerals import MineralConfig

# -- olivine 'ol' (Holland & Powell 2011) -------------------------------------

_OL_P = """
p(fo)      1  1    1  1 -1  x
p(fa)      1  1    0  1  1  x
"""


def _ol_vars(ctx, ic):
    # x = xFeM over the measured M pool (Fe+Mg; no vacancy term)
    ctx.let([
        ("__Mt", lambda q: f"({ic(_MG)(q)} + {ic(_FE2)(q)})"),
    ])
    ctx.let([
        ("x", lambda q: f"({ic(_FE2)(q)} / {q('__Mt')})"),
    ])


OLIVINE = PhaseSpec(
    name="Olivine", abbreviation="ol",
    end_members=("fo", "fa"),
    p_block=_OL_P,
    mineral=MineralConfig(name="TC_ol", n_oxygens=4, ideal_cations=3),
    required=(_MG, _FE2, _SI),
    build_variables=_ol_vars,
)

PHASES: dict[str, PhaseSpec] = {
    s.abbreviation: s
    for s in (
        OLIVINE,
        # reused from the metapelite set (same axfile blocks)
        GARNET, BIOTITE, CHLORITE, MUSCOVITE, ORTHOPYROXENE, ILMENITE_MIXED,
    )
}
