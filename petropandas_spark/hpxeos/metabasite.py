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

# -- clinoamphibole 'hb' (Green et al. 2016) — the largest model --------------

_HB_P = """
p(tr)      1 1    0  6  -1/2  a   1  c  -1  f  -1  t  -1  y   1  z
p(tsm)     1 1    0  4  -1/2  a   1  f   1  y  -1  z
p(prgm)    2 1    0  1   1  a
             2    0  1  -1  a    0  1  1  k
p(glm)     1 1    0  2  -1  f   1  z
p(cumm)    6 1    1  5  -1  c  -1  Q2  -1  x  -1  z  -3/2  Q1
             2    0  1  1  f    0  1  1  Q2
             2    0  1  1  Q2    0  1  1  t
             2    0  1  1  c    0  1  1  x
             2    0  1  1  Q2    0  1  1  y
             2    0  1  1  x    0  1  1  z
p(grnm)    9 1    0  3   1  x  -2  Q2  -5/2  Q1
             2    0  1  2  f    0  1  1  Q2
             2    0  1  2  Q2    0  1  1  t
             2    0  1  1  c    0  1  1  x
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  2  Q2    0  1  1  y
             2    0  1  -1  x    0  1  1  y
             2    0  1  1  x    0  1  1  z
p(a)       6 1    0  2   1  Q2  5/2  Q1
             2    0  1  -1  f    0  1  1  Q2
             2    0  1  -1  Q2    0  1  1  t
             2    0  1  -1  c    0  1  1  x
             2    0  1  -1  Q2    0  1  1  y
             2    0  1  -1  x    0  1  1  z
p(b)       9 1    0  2  2  Q2  3/2  Q1
             2    0  1  -2  f    0  1  1  Q2
             2    0  1  -2  Q2    0  1  1  t
             2    0  1  -1  c    0  1  1  x
             2    0  1  1  f    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  -2  Q2    0  1  1  y
             2    0  1  1  x    0  1  1  y
             2    0  1  -1  x    0  1  1  z
p(mrb)     1 1    0  1  1  f
p(kprg)    1 2    0  1  1  a    0  1  1  k
p(tts)     1 1    0  1  1  t
"""


def _hb_vars(ctx, ic):
    ctx.let([
        ("x", _ratio(ic(_FE2), ic(_MG))),
        ("y", lambda q: f"(({ic(_AL)(q)} - (8e0 - {ic(_SI)(q)})) / 2e0)"),
        ("f", lambda q: f"({ic(_FE3)(q)} / 2e0)"),
        ("t", lambda q: f"({ic(_TI)(q)} / 2e0)"),
        ("c", lambda q: f"({ic(_CA)(q)} / 2e0)"),
    ])


AMPHIBOLE = PhaseSpec(
    name="Clinoamphibole", abbreviation="hb",
    end_members=("tr", "tsm", "prgm", "glm", "cumm", "grnm", "a", "b",
                 "mrb", "kprg", "tts"),
    p_block=_HB_P,
    mineral=MineralConfig(
        name="TC_hb", n_oxygens=23, ideal_cations=15,
        valence_splits=({"element": "Fe", "method": "schumacher"},),
    ),
    required=(_MG, _FE2, _CA, _AL, _SI, _TI),
    build_variables=_hb_vars,
    # z/a/k are as bulk-underdetermined as Q1/Q2 (Na splits across A and
    # M4 with no closure identity) — all five default to 0
    order_parameters=("z", "a", "k", "Q1", "Q2"),
)

# -- augite 'aug' (calcic cpx; tet-site order-disorder only) -----------------

_AUG_P = """
p(di)      1 1    0  2  -1  y   1  z
p(cenh)    5 1    1  4  -1/2  Qfm  -1  j  -1  x  -1  z
             2    0  1  1/2  j    0  1  1  Qfm
             2    0  1  1  j    0  1  1  x
             2    0  1  1/2  Qfm    0  1  1  z
             2    0  1  1  x    0  1  1  z
p(cfs)     5 1    0  2  -1/2  Qfm   1  x
             2    0  1  1/2  j    0  1  1  Qfm
             2    0  1  -1  j    0  1  1  x
             2    0  1  -1  x    0  1  1  y
             2    0  1  1/2  Qfm    0  1  1  z
p(jdm)     1 1    0  2  -1  f   1  j
p(acmm)    1 1    0  1  1  f
p(ocats)   1 1    0  1  1  Qal
p(dcats)   1 1    0  2  -1  Qal   1  y
p(fmc)     5 1    0  1   1  Qfm
             2    0  1  -1  j    0  1  1  Qfm
             2    0  1  1  x    0  1  1  y
             2    0  1  -1  Qfm    0  1  1  z
             2    0  1  -1  x    0  1  1  z
"""


def _aug_vars(ctx, ic):
    ctx.let([
        ("x", _ratio(ic(_FE2), ic(_MG))),
        ("y", lambda q: f"(2e0 - {ic(_SI)(q)})"),
        ("f", ic(_FE3)),
        ("z", ic(_CA)),
        ("j", ic(_NA)),
    ])


AUGITE = PhaseSpec(
    name="Augite", abbreviation="aug",
    end_members=("di", "cenh", "cfs", "jdm", "acmm", "ocats", "dcats", "fmc"),
    p_block=_AUG_P,
    mineral=MineralConfig(
        name="TC_aug", n_oxygens=6, ideal_cations=4,
        valence_splits=({"element": "Fe", "method": "droop"},),
    ),
    required=(_MG, _FE2, _CA, _NA, _AL, _SI),
    build_variables=_aug_vars,
    order_parameters=("Qfm", "Qal"),
)

# -- omphacite 'dio' (sodic-calcic cpx, P2/n ordering) -----------------------

_DIO_P = """
p(jd)      2 1    0  3   1  j  -1  Q  -1  Qaf
             2    0  1  -1  f    0  1  1  j
p(di)      5 1    1  4  -1  j  -1  Q   1  Qfm  -1  x
             2    0  1  -1  j    0  1  1  Qfm
             2    0  1  -1  Q    0  1  1  Qfm
             2    0  1  1  j    0  1  1  x
             2    0  1  -1  Q    0  1  1  x
p(hed)     5 1    0  2   1  Qfm   1  x
             2    0  1  -1  j    0  1  1  Qfm
             2    0  1  -1  Q    0  1  1  Qfm
             2    0  1  -1  j    0  1  1  x
             2    0  1  -1  Q    0  1  1  x
p(acmm)    2 1    0  1  -1  Qaf
             2    0  1  1  f    0  1  1  j
p(om)      1 1    0  1  2  Q
p(cfm)     4 1    0  1  -2  Qfm
             2    0  1  2  j    0  1  1  Qfm
             2    0  1  2  Q    0  1  1  Qfm
             2    0  1  2  Q    0  1  1  x
p(jac)     1 1    0  1  2  Qaf
"""


def _dio_vars(ctx, ic):
    ctx.let([
        ("x", _ratio(ic(_FE2), ic(_MG))),
        ("f", lambda q: (
            f"({ic(_FE3)(q)} / ({ic(_AL)(q)} + {ic(_FE3)(q)}))"
        )),
        ("j", ic(_NA)),
    ])


OMPHACITE = PhaseSpec(
    name="Omphacite", abbreviation="dio",
    end_members=("jd", "di", "hed", "acmm", "om", "cfm", "jac"),
    p_block=_DIO_P,
    mineral=MineralConfig(
        name="TC_dio", n_oxygens=6, ideal_cations=4,
        valence_splits=({"element": "Fe", "method": "droop"},),
    ),
    required=(_MG, _FE2, _CA, _NA, _AL),
    build_variables=_dio_vars,
    order_parameters=("Q", "Qaf", "Qfm"),
)

PHASES.update({s.abbreviation: s for s in (AMPHIBOLE, AUGITE, OMPHACITE)})

# -- peristerite 'abc' (low-albite, NaSi<->CaAl coupled unit) ----------------

_ABC_P = """
p(abm)   1 1    1 1 -1 ca
p(anm)   1 1    0 1  1 ca
"""


def _abc_vars(ctx, ic):
    ctx.let([
        ("__At", lambda q: f"({ic(_NA)(q)} + {ic(_CA)(q)})"),
    ])
    ctx.let([
        ("ca", lambda q: f"({ic(_CA)(q)} / {q('__At')})"),
    ])


PERISTERITE = PhaseSpec(
    name="Peristerite", abbreviation="abc",
    end_members=("abm", "anm"),
    p_block=_ABC_P,
    mineral=MineralConfig(name="TC_abc", n_oxygens=8),
    required=(_NA, _CA),
    build_variables=_abc_vars,
)

# -- legacy Ibar1 plagioclase 'pli' (Holland & Powell 2003) ------------------

_PLI_P = """
p(abhI)  1 1    1 2 -1 k -1 ca
p(an)    1 1    0 1  1 ca
p(san)   1 1    0 1  1 k
"""


def _pli_vars(ctx, ic):
    from petropandas_spark.sqlgen import add_chain

    ctx.let([
        ("__At", lambda q: add_chain([ic(_NA)(q), ic(_CA)(q), ic(_K)(q)])),
    ])
    ctx.let([
        ("ca", lambda q: f"({ic(_CA)(q)} / {q('__At')})"),
        ("k", lambda q: f"({ic(_K)(q)} / {q('__At')})"),
    ])


PLAGIOCLASE_IBAR1 = PhaseSpec(
    name="PlagioclaseIbar1", abbreviation="pli",
    end_members=("abhI", "an", "san"),
    p_block=_PLI_P,
    mineral=MineralConfig(name="TC_pli", n_oxygens=8),
    required=(_NA, _CA, _K),
    build_variables=_pli_vars,
)

PHASES.update({s.abbreviation: s for s in (PERISTERITE, PLAGIOCLASE_IBAR1)})
