"""Metabasite phase set (Green, White, Diener, Powell, Holland & Palin
2016) — THERMOCALC axfile tc-mb51NCKFMASHTO.txt.  Several metapelite phases
are reused verbatim by the axfile (garnet, biotite, chlorite, muscovite,
orthopyroxene, ilmenite-mixed) — re-exported here under the same registry.
"""

from __future__ import annotations

from petropandas_spark.hpxeos import PhaseSpec
from petropandas_spark.hpxeos.metapelite import (
    _CA, _FE2, _FE3, _K, _MG, _MN, _NA, _SI, _AL, _TI,
    _mica_vars, _ratio,
)
from petropandas_spark.minerals import MineralConfig
from petropandas_spark.sqlgen import ieee_div

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
        ("x", lambda q: ieee_div(ic(_FE2)(q), q('__Mt'))),
    ])


OLIVINE = PhaseSpec(
    name="Olivine", abbreviation="ol",
    end_members=("fo", "fa"),
    p_block=_OL_P,
    mineral=MineralConfig(name="TC_ol", n_oxygens=4, ideal_cations=3),
    required=(_MG, _FE2, _SI),
    build_variables=_ol_vars,
)

PHASES: dict[str, PhaseSpec] = {s.abbreviation: s for s in (OLIVINE,)}

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
            ieee_div(ic(_FE3)(q), f"({ic(_AL)(q)} + {ic(_FE3)(q)})")
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
        ("ca", lambda q: ieee_div(ic(_CA)(q), q('__At'))),
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
        ("ca", lambda q: ieee_div(ic(_CA)(q), q('__At'))),
        ("k", lambda q: ieee_div(ic(_K)(q), q('__At'))),
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

# -- Mn-free metabasite variants of the metapelite models --------------------
# The tc-mb51 axfile re-derives these in NCKFMASHTO (no Mn): end-member
# lists and polynomial blocks differ from the metapelite versions (no
# spss/mmbi/mmchl/mnopx/pnt terms), so they are distinct specs, not reuses.

_G_MB_P = """
p(py)      2 1    1  3  -1  f  -1  x  -1  z
             2    0  1  1  x    0  1  1  z
p(alm)     2 1    0  1   1  x
             2    0  1  -1  x    0  1  1  z
p(gr)      1 1    0  1  1  z
p(kho)     1 1    0  1  1  f
"""


def _g_mb_vars(ctx, ic):
    from petropandas_spark.sqlgen import add_chain

    ctx.let([
        ("__Xt", lambda q: add_chain(
            [ic(_MG)(q), ic(_FE2)(q), ic(_CA)(q)])),
        ("__Yt", lambda q: f"({ic(_AL)(q)} + {ic(_FE3)(q)})"),
    ])
    ctx.let([
        ("__xFeX", lambda q: ieee_div(ic(_FE2)(q), q('__Xt'))),
        ("__xMgX", lambda q: ieee_div(ic(_MG)(q), q('__Xt'))),
        ("z", lambda q: ieee_div(ic(_CA)(q), q('__Xt'))),
        ("f", lambda q: ieee_div(ic(_FE3)(q), q('__Yt'))),
    ])
    ctx.let([
        ("x", lambda q: ieee_div(q('__xFeX'), f"({q('__xFeX')} + {q('__xMgX')})")),
    ])


GARNET_MB = PhaseSpec(
    name="GarnetMB", abbreviation="g",
    end_members=("py", "alm", "gr", "kho"),
    p_block=_G_MB_P,
    mineral=MineralConfig(
        name="TC_g_mb", n_oxygens=12, ideal_cations=8,
        valence_splits=({"element": "Fe", "method": "droop"},),
    ),
    required=(_MG, _FE2, _CA, _AL),
    build_variables=_g_mb_vars,
)

_BI_MB_P = """
p(phl)     4 1    1  5  -1  f  -1  t  -1  x  -1  y  -2/3  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  1  x    0  1  1  y
p(annm)    1 1    0  2  -1/3  Q   1  x
p(obi)     4 1    0  1   1  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  -1  x    0  1  1  y
p(east)    1 1    0  1  1  y
p(tbi)     1 1    0  1  1  t
p(fbi)     1 1    0  1  1  f
"""


def _bi_mb_vars(ctx, ic):
    ctx.let([
        ("x", _ratio(ic(_FE2), ic(_MG))),
        ("y", lambda q: f"({ic(_AL)(q)} - (4e0 - {ic(_SI)(q)}))"),
        ("f", ic(_FE3)),
        ("t", ic(_TI)),
    ])


BIOTITE_MB = PhaseSpec(
    name="BiotiteMB", abbreviation="bi",
    end_members=("phl", "annm", "obi", "east", "tbi", "fbi"),
    p_block=_BI_MB_P,
    mineral=MineralConfig(name="TC_bi_mb", n_oxygens=11),
    required=(_MG, _FE2, _TI, _AL, _SI),
    build_variables=_bi_mb_vars,
    order_parameters=("Q",),
)

_CHL_MB_P = """
p(clin)    9 1    0  3  -1/4  Q1  2  QAl  -5/4  Q4
             2    0  1  5/4  f    0  1  1  Q4
             2    0  1  -1/4  Q1    0  1  1  QAl
             2    0  1  5/4  Q4    0  1  1  QAl
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  QAl    0  1  1  x
             2    0  1  1/4  Q1    0  1  1  y
             2    0  1  5/4  Q4    0  1  1  y
             2    0  1  -1  x    0  1  1  y
p(afchl)   9 1    1  6  -1  f  -1  QAl  -1  y  -2  x  5/4  Q1  9/4  Q4
             2    0  1  -9/4  f    0  1  1  Q4
             2    0  1  5/4  Q1    0  1  1  QAl
             2    0  1  -9/4  Q4    0  1  1  QAl
             2    0  1  2  f    0  1  1  x
             2    0  1  1  QAl    0  1  1  x
             2    0  1  -5/4  Q1    0  1  1  y
             2    0  1  -9/4  Q4    0  1  1  y
             2    0  1  3  x    0  1  1  y
p(ames)    1 1    0  2  -1  QAl   1  y
p(daph)    9 1    0  2  1/4  Q1  5/4  Q4
             2    0  1  -5/4  f    0  1  1  Q4
             2    0  1  1/4  Q1    0  1  1  QAl
             2    0  1  -5/4  Q4    0  1  1  QAl
             2    0  1  1  f    0  1  1  x
             2    0  1  1  QAl    0  1  1  x
             2    0  1  -1/4  Q1    0  1  1  y
             2    0  1  -5/4  Q4    0  1  1  y
             2    0  1  1  x    0  1  1  y
p(ochl1)   7 1    0  2  -1  Q4   1  x
             2    0  1  1  f    0  1  1  Q4
             2    0  1  1  Q4    0  1  1  QAl
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  QAl    0  1  1  x
             2    0  1  1  Q4    0  1  1  y
             2    0  1  -1  x    0  1  1  y
p(ochl4)   8 1    0  3   1  x  -5/4  Q1  -5/4  Q4
             2    0  1  5/4  f    0  1  1  Q4
             2    0  1  -5/4  Q1    0  1  1  QAl
             2    0  1  5/4  Q4    0  1  1  QAl
             2    0  1  -1  f    0  1  1  x
             2    0  1  5/4  Q1    0  1  1  y
             2    0  1  5/4  Q4    0  1  1  y
             2    0  1  -2  x    0  1  1  y
p(f3clin)   1 1    0  1  1  f
"""


def _chl_mb_vars(ctx, ic):
    ctx.let([
        ("x", _ratio(ic(_FE2), ic(_MG))),
        ("y", lambda q: f"(({ic(_AL)(q)} - (4e0 - {ic(_SI)(q)})) / 2e0)"),
        ("f", ic(_FE3)),
    ])


CHLORITE_MB = PhaseSpec(
    name="ChloriteMB", abbreviation="chl",
    end_members=("clin", "afchl", "ames", "daph", "ochl1", "ochl4",
                 "f3clin"),
    p_block=_CHL_MB_P,
    mineral=MineralConfig(name="TC_chl_mb", n_oxygens=14),
    required=(_MG, _FE2, _AL, _SI),
    build_variables=_chl_mb_vars,
    order_parameters=("QAl", "Q1", "Q4"),
    charge_basis=28.0,
)

_OPX_MB_P = """
p(en)      3 1    1  5  -1/2  Q  -1  c  -1  f  -1  x  -1  y
             2    0  1  1/2  c    0  1  1  Q
             2    0  1  1  c    0  1  1  x
p(fs)      4 1    0  2  -1/2  Q   1  x
             2    0  1  1/2  c    0  1  1  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  x    0  1  1  y
p(fm)      5 1    0  1   1  Q
             2    0  1  -1  c    0  1  1  Q
             2    0  1  -1  c    0  1  1  x
             2    0  1  1  f    0  1  1  x
             2    0  1  1  x    0  1  1  y
p(mgts)    1 1    0  1  1  y
p(fopx)    1 1    0  1  1  f
p(odi)     1 1    0  1  1  c
"""


def _opx_mb_vars(ctx, ic):
    ctx.let([
        ("x", _ratio(ic(_FE2), ic(_MG))),
        ("y", lambda q: f"({ic(_AL)(q)} - (2e0 - {ic(_SI)(q)}))"),
        ("f", ic(_FE3)),
        ("c", ic(_CA)),
    ])


ORTHOPYROXENE_MB = PhaseSpec(
    name="OrthopyroxeneMB", abbreviation="opx",
    end_members=("en", "fs", "fm", "mgts", "fopx", "odi"),
    p_block=_OPX_MB_P,
    mineral=MineralConfig(
        name="TC_opx_mb", n_oxygens=6, ideal_cations=4,
        valence_splits=({"element": "Fe", "method": "droop"},),
    ),
    required=(_MG, _FE2, _CA, _AL, _SI),
    build_variables=_opx_mb_vars,
    order_parameters=("Q",),
)

_ILMM_MB_P = """
p(oilm)    1 1    0  1  1  Q
p(dilm)    1 1    0  3  -1  g   1  i  -1  Q
p(dhem)    1 1    1  1  -1  i
p(geik)    1 1    0  1  1  g
"""


def _ilmm_mb_vars(ctx, ic):
    ctx.let([
        ("i", lambda q: f"(1e0 - {ic(_FE3)(q)} / 2e0)"),
        ("g", ic(_MG)),
    ])


ILMENITE_MIXED_MB = PhaseSpec(
    name="IlmeniteMixedMB", abbreviation="ilmm",
    end_members=("oilm", "dilm", "dhem", "geik"),
    p_block=_ILMM_MB_P,
    mineral=MineralConfig(name="TC_ilmm_mb", n_oxygens=3, ideal_cations=2),
    required=(_FE2, _TI, _MG),
    build_variables=_ilmm_mb_vars,
    order_parameters=("Q",),
)

_MU_MB_P = """
p(mu)      1 1    0  4  -1  c  -1  f  -1  n   1  y
p(cel)     2 1    1  2  -1  x  -1  y
             2    0  1  1  x    0  1  1  y
p(fcel)    2 1    0  1   1  x
             2    0  1  -1  x    0  1  1  y
p(pa)      1 1    0  1  1  n
p(mam)      1 1    0  1  1  c
p(fmu)     1 1    0  1  1  f
"""

MUSCOVITE_MB = PhaseSpec(
    name="MuscoviteMB", abbreviation="mu",
    end_members=("mu", "cel", "fcel", "pa", "mam", "fmu"),
    p_block=_MU_MB_P,
    mineral=MineralConfig(
        name="TC_mu_mb", n_oxygens=13, ideal_cations=5,
        valence_splits=({"element": "Fe", "method": "droop"},),
    ),
    required=(_K, _NA, _CA, _MG, _FE2, _SI, _AL),
    build_variables=_mica_vars,
)

PHASES.update({
    s.abbreviation: s
    for s in (GARNET_MB, BIOTITE_MB, CHLORITE_MB, ORTHOPYROXENE_MB,
              ILMENITE_MIXED_MB, MUSCOVITE_MB)
})


# X10: attach the verbatim axfile sf blocks (site-occupancy self-check
# surface) to every phase that does not already carry one inline.
from dataclasses import replace as _dc_replace  # noqa: E402

from petropandas_spark.hpxeos.sf_blocks import SF_BLOCKS as _SF_BLOCKS  # noqa: E402

for _ab, _blk in _SF_BLOCKS["metabasite"].items():
    if PHASES[_ab].sf_block is None:
        PHASES[_ab] = _dc_replace(PHASES[_ab], sf_block=_blk)
del _ab, _blk

# reference-parity instance names (ref hpxeos submodules export ready-to-use
# ``TC_<abbreviation>`` objects, e.g. ``from ...metapelite import TC_g``)
for _ab, _spec in PHASES.items():
    globals()[f"TC_{_ab}"] = _spec
del _ab, _spec

# attach the crystallographic site models (generated site_defs.py), so a
# PhaseSpec drives mineral-framework site filtering exactly like the
# reference's Phase subclasses (ref hpxeos/base.py:47-58)
from petropandas_spark.hpxeos.site_defs import SITE_DEFS as _SITE_DEFS
from petropandas_spark.minerals import SiteDef as _SiteDef

for _ab, _defs in _SITE_DEFS["metabasite"].items():
    if _ab in PHASES and not PHASES[_ab].mineral.site_definitions:
        _min = _dc_replace(
            PHASES[_ab].mineral,
            site_definitions=tuple(
                _SiteDef(_n, _c, tuple(_p)) for _n, _c, _p in _defs
            ),
        )
        PHASES[_ab] = _dc_replace(PHASES[_ab], mineral=_min)
del _ab, _defs

# rebind the TC_ aliases to the site-def-carrying specs
for _ab, _spec in PHASES.items():
    globals()[f"TC_{_ab}"] = _spec
del _ab, _spec
