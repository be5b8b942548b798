"""Metapelite phase set (White, Powell, Holland, Johnson & Green 2014 +
Mn additions; Holland, Green & Powell 2021 feldspars; Holland & Powell 2011
epidote) — THERMOCALC axfile tc-mp51MnNCKFMASHTO.txt.

The polynomial blocks are public THERMOCALC axfile data (the same compiled
notation the reference transcribes, ``/root/reference/src/petropandas/
hpxeos/metapelite/*.py``); variables are the phases' documented bulk
mass-balance recoveries.  All eleven phases share the single data-driven
:class:`~petropandas_spark.hpxeos.PhaseSpec` machinery — no per-phase code.
"""

from __future__ import annotations

from petropandas_spark.hpxeos import PhaseSpec
from petropandas_spark.minerals import MineralConfig
from petropandas_spark.sqlgen import add_chain, ieee_div, safe_denom

_MG, _FE2, _FE3, _MN, _CA, _NA, _K = (
    "Mg{2+}", "Fe{2+}", "Fe{3+}", "Mn{2+}", "Ca{2+}", "Na{+}", "K{+}",
)
_SI, _AL, _TI = "Si{4+}", "Al{3+}", "Ti{4+}"


def _ratio(a, b):
    """a / (a + b) with the reference's pandas NaN flow: ieee_div gives
    0/0 -> NaN and x/0 -> ±inf (a legal end-member composition zeroes
    these denominators — e.g. pure grossular has Fe = Mg = 0); Spark's
    bare ``/`` would abort the whole job under ANSI mode."""
    return lambda q: ieee_div(a(q), f"({a(q)} + {b(q)})")


# -- garnet 'g' ---------------------------------------------------------------

_G_P = """
p(py)      3 1    1  4  -1  f  -1  m  -1  x  -1  z
             2    0  1  1  m    0  1  1  x
             2    0  1  1  x    0  1  1  z
p(alm)     3 1    0  1   1  x
             2    0  1  -1  m    0  1  1  x
             2    0  1  -1  x    0  1  1  z
p(spss)    1 1    0  1  1  m
p(gr)      1 1    0  1  1  z
p(kho)     1 1    0  1  1  f
"""


def _g_vars(ctx, ic):
    ctx.let([
        ("__Xt", lambda q: add_chain(
            [ic(_MG)(q), ic(_FE2)(q), ic(_MN)(q), ic(_CA)(q)])),
        ("__Yt", lambda q: f"({ic(_AL)(q)} + {ic(_FE3)(q)})"),
    ])
    ctx.let([
        ("__xFeX", lambda q: ieee_div(ic(_FE2)(q), q('__Xt'))),
        ("__xMgX", lambda q: ieee_div(ic(_MG)(q), q('__Xt'))),
        ("m", lambda q: ieee_div(ic(_MN)(q), q('__Xt'))),
        ("z", lambda q: ieee_div(ic(_CA)(q), q('__Xt'))),
        ("f", lambda q: ieee_div(ic(_FE3)(q), q('__Yt'))),
    ])
    ctx.let([
        ("x", lambda q: ieee_div(q('__xFeX'), f"({q('__xFeX')} + {q('__xMgX')})")),
    ])


# sf block (X10 transcription self-check surface)
_G_SF = """
xMgX       3 1    1  3  -1  m  -1  x  -1  z
             2    0  1  1  m    0  1  1  x
             2    0  1  1  x    0  1  1  z
xFeX       3 1    0  1   1  x
             2    0  1  -1  m    0  1  1  x
             2    0  1  -1  x    0  1  1  z
xMnX       1 1    0  1  1  m
xCaX       1 1    0  1  1  z
xAlY       1 1    1  1  -1  f
xFe3Y      1 1    0  1  1  f
"""

GARNET = PhaseSpec(
    name="Garnet", abbreviation="g",
    end_members=("py", "alm", "spss", "gr", "kho"),
    p_block=_G_P,
    mineral=MineralConfig(
        name="TC_g", n_oxygens=12, ideal_cations=8,
        valence_splits=({"element": "Fe", "method": "droop"},),
    ),
    required=(_MG, _FE2, _MN, _CA, _AL),
    build_variables=_g_vars,
    sf_block=_G_SF,
)

# -- biotite 'bi' -------------------------------------------------------------

_BI_P = """
p(phl)     5 1    1  6  -1  f  -1  m  -1  t  -1  x  -1  y  -2/3  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  3  m    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  1  x    0  1  1  y
p(annm)    1 1    0  2  -1/3  Q   1  x
p(obi)     5 1    0  1   1  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -3  m    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  -1  x    0  1  1  y
p(east)    1 1    0  1  1  y
p(tbi)     1 1    0  1  1  t
p(fbi)     1 1    0  1  1  f
p(mmbi)    1 1    0  1  1  m
"""


def _bi_vars(ctx, ic):
    ctx.let([
        ("x", _ratio(ic(_FE2), ic(_MG))),
        ("m", lambda q: f"({ic(_MN)(q)} / 3e0)"),
        ("y", lambda q: f"({ic(_AL)(q)} - (4e0 - {ic(_SI)(q)}))"),
        ("f", ic(_FE3)),
        ("t", ic(_TI)),
    ])


_BI_SF = """
xMgM3      5 1    1  6  -1  f  -1  m  -1  t  -1  x  -1  y  -2/3  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  3  m    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  1  x    0  1  1  y
xMnM3      1 1    0  1  1  m
xFeM3      5 1    0  2   1  x  2/3  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -3  m    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  -1  x    0  1  1  y
xFe3M3     1 1    0  1  1  f
xTiM3      1 1    0  1  1  t
xAlM3      1 1    0  1  1  y
xMgM12     1 1    1  3  1/3  Q  -1  m  -1  x
xMnM12     1 1    0  1  1  m
xFeM12     1 1    0  2  -1/3  Q   1  x
xSiT       1 1    1/2  2  -1/2  f  -1/2  y
xAlT       1 1    1/2  2  1/2  f  1/2  y
"""

BIOTITE = PhaseSpec(
    name="Biotite", abbreviation="bi",
    end_members=("phl", "annm", "obi", "east", "tbi", "fbi", "mmbi"),
    p_block=_BI_P,
    mineral=MineralConfig(name="TC_bi", n_oxygens=11),
    required=(_MG, _FE2, _MN, _TI, _AL, _SI),
    build_variables=_bi_vars,
    order_parameters=("Q",),
    sf_block=_BI_SF,
)

# -- dioctahedral micas 'mu' / 'ma' ------------------------------------------

_MU_P = """
p(mu)      1 1    0  4  -1  c  -1  f  -1  n   1  y
p(cel)     2 1    1  2  -1  x  -1  y
             2    0  1  1  x    0  1  1  y
p(fcel)    2 1    0  1   1  x
             2    0  1  -1  x    0  1  1  y
p(pa)      1 1    0  1  1  n
p(mat)      1 1    0  1  1  c
p(fmu)     1 1    0  1  1  f
"""

_MA_P = """
p(mut)      1 1    0  4  -1  c  -1  f  -1  n   1  y
p(celt)     2 1    1  2  -1  x  -1  y
             2    0  1  1  x    0  1  1  y
p(fcelt)    2 1    0  1   1  x
             2    0  1  -1  x    0  1  1  y
p(pat)      1 1    0  1  1  n
p(ma)      1 1    0  1  1  c
p(fmu)     1 1    0  1  1  f
"""


def _mica_vars(ctx, ic):
    ctx.let([
        ("__At", lambda q: add_chain([ic(_K)(q), ic(_NA)(q), ic(_CA)(q)])),
    ])
    ctx.let([
        ("c", lambda q: ieee_div(ic(_CA)(q), q('__At'))),
        ("n", lambda q: ieee_div(ic(_NA)(q), q('__At'))),
        ("x", _ratio(ic(_FE2), ic(_MG))),
        ("f", ic(_FE3)),
    ])
    ctx.let([
        ("y", lambda q: f"((4e0 - {ic(_SI)(q)}) - {q('c')})"),
    ])


_MICA_MIN = MineralConfig(
    name="TC_mica", n_oxygens=13, ideal_cations=5,
    valence_splits=({"element": "Fe", "method": "droop"},),
)
_MICA_REQ = (_K, _NA, _CA, _MG, _FE2, _SI, _AL)

MUSCOVITE = PhaseSpec(
    name="Muscovite", abbreviation="mu",
    end_members=("mu", "cel", "fcel", "pa", "mat", "fmu"),
    p_block=_MU_P, mineral=_MICA_MIN, required=_MICA_REQ,
    build_variables=_mica_vars,
)

MARGARITE = PhaseSpec(
    name="Margarite", abbreviation="ma",
    end_members=("mut", "celt", "fcelt", "pat", "ma", "fmu"),
    p_block=_MA_P, mineral=_MICA_MIN, required=_MICA_REQ,
    build_variables=_mica_vars,
)

# -- chlorite 'chl' (28-charge APFU basis) ------------------------------------

_CHL_P = """
p(clin)    11 1    0  4  -1/4  Q1  -1  m  2  QAl  -5/4  Q4
             2    0  1  1/4  m    0  1  1  Q1
             2    0  1  5/4  f    0  1  1  Q4
             2    0  1  -1/4  Q1    0  1  1  QAl
             2    0  1  5/4  Q4    0  1  1  QAl
             2    0  1  -1  f    0  1  1  x
             2    0  1  1  m    0  1  1  x
             2    0  1  -1  QAl    0  1  1  x
             2    0  1  1/4  Q1    0  1  1  y
             2    0  1  5/4  Q4    0  1  1  y
             2    0  1  -1  x    0  1  1  y
p(afchl)   10 1    1  6  -1  f  -1  QAl  -1  y  -2  x  5/4  Q1  9/4  Q4
             2    0  1  -5/4  m    0  1  1  Q1
             2    0  1  -9/4  f    0  1  1  Q4
             2    0  1  5/4  Q1    0  1  1  QAl
             2    0  1  -9/4  Q4    0  1  1  QAl
             2    0  1  2  f    0  1  1  x
             2    0  1  1  QAl    0  1  1  x
             2    0  1  -5/4  Q1    0  1  1  y
             2    0  1  -9/4  Q4    0  1  1  y
             2    0  1  3  x    0  1  1  y
p(ames)    1 1    0  2  -1  QAl   1  y
p(daph)    11 1    0  2  1/4  Q1  5/4  Q4
             2    0  1  -1/4  m    0  1  1  Q1
             2    0  1  -5/4  f    0  1  1  Q4
             2    0  1  1/4  Q1    0  1  1  QAl
             2    0  1  -5/4  Q4    0  1  1  QAl
             2    0  1  1  f    0  1  1  x
             2    0  1  -1  m    0  1  1  x
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
p(ochl4)   9 1    0  3   1  x  -5/4  Q1  -5/4  Q4
             2    0  1  5/4  m    0  1  1  Q1
             2    0  1  5/4  f    0  1  1  Q4
             2    0  1  -5/4  Q1    0  1  1  QAl
             2    0  1  5/4  Q4    0  1  1  QAl
             2    0  1  -1  f    0  1  1  x
             2    0  1  5/4  Q1    0  1  1  y
             2    0  1  5/4  Q4    0  1  1  y
             2    0  1  -2  x    0  1  1  y
p(f3clin)   1 1    0  1  1  f
p(mmchl)   1 1    0  1  1  m
"""


def _chl_vars(ctx, ic):
    ctx.let([
        ("x", _ratio(ic(_FE2), ic(_MG))),
        ("y", lambda q: f"(({ic(_AL)(q)} - (4e0 - {ic(_SI)(q)})) / 2e0)"),
        ("f", ic(_FE3)),
        ("m", lambda q: f"({ic(_MN)(q)} / 5e0)"),
    ])



_CHL_SF = """
xMgM1      7 1    1  5  -1  m   1  Q1   1  QAl  -1  x  -1  y
             2    0  1  -1  m    0  1  1  Q1
             2    0  1  1  Q1    0  1  1  QAl
             2    0  1  1  m    0  1  1  x
             2    0  1  -1  QAl    0  1  1  x
             2    0  1  -1  Q1    0  1  1  y
             2    0  1  1  x    0  1  1  y
xMnM1      1 1    0  1  1  m
xFeM1      7 1    0  2  -1  Q1   1  x
             2    0  1  1  m    0  1  1  Q1
             2    0  1  -1  Q1    0  1  1  QAl
             2    0  1  -1  m    0  1  1  x
             2    0  1  1  QAl    0  1  1  x
             2    0  1  1  Q1    0  1  1  y
             2    0  1  -1  x    0  1  1  y
xAlM1      1 1    0  2  -1  QAl   1  y
xMgM23     8 1    1  4  -1/4  Q1  -1/4  Q4  -1  m  -1  x
             2    0  1  1/4  m    0  1  1  Q1
             2    0  1  1/4  f    0  1  1  Q4
             2    0  1  -1/4  Q1    0  1  1  QAl
             2    0  1  1/4  Q4    0  1  1  QAl
             2    0  1  1  m    0  1  1  x
             2    0  1  1/4  Q1    0  1  1  y
             2    0  1  1/4  Q4    0  1  1  y
xMnM23     1 1    0  1  1  m
xFeM23     8 1    0  3  1/4  Q1  1/4  Q4   1  x
             2    0  1  -1/4  m    0  1  1  Q1
             2    0  1  -1/4  f    0  1  1  Q4
             2    0  1  1/4  Q1    0  1  1  QAl
             2    0  1  -1/4  Q4    0  1  1  QAl
             2    0  1  -1  m    0  1  1  x
             2    0  1  -1/4  Q1    0  1  1  y
             2    0  1  -1/4  Q4    0  1  1  y
xMgM4      7 1    1  5  -1  f   1  Q4  -1  QAl  -1  x  -1  y
             2    0  1  -1  f    0  1  1  Q4
             2    0  1  -1  Q4    0  1  1  QAl
             2    0  1  1  f    0  1  1  x
             2    0  1  1  QAl    0  1  1  x
             2    0  1  -1  Q4    0  1  1  y
             2    0  1  1  x    0  1  1  y
xFeM4      7 1    0  2  -1  Q4   1  x
             2    0  1  1  f    0  1  1  Q4
             2    0  1  1  Q4    0  1  1  QAl
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  QAl    0  1  1  x
             2    0  1  1  Q4    0  1  1  y
             2    0  1  -1  x    0  1  1  y
xFe3M4     1 1    0  1  1  f
xAlM4      1 1    0  2   1  QAl   1  y
xSiT2      1 1    1  2  -1/2  f  -1  y
xAlT2      1 1    0  2  1/2  f   1  y
"""

CHLORITE = PhaseSpec(
    name="Chlorite", abbreviation="chl",
    end_members=("clin", "afchl", "ames", "daph", "ochl1", "ochl4",
                 "f3clin", "mmchl"),
    p_block=_CHL_P,
    mineral=MineralConfig(name="TC_chl", n_oxygens=14),
    required=(_MG, _FE2, _MN, _AL, _SI),
    build_variables=_chl_vars,
    order_parameters=("QAl", "Q1", "Q4"),
    charge_basis=28.0,
    sf_block=_CHL_SF,
)

# -- chloritoid 'ctd' ---------------------------------------------------------

_CTD_P = """
p(mctd)    2 1    1  3  -1  f  -1  m  -1  x
             2    0  1  1  m    0  1  1  x
p(fctd)    2 1    0  1   1  x
             2    0  1  -1  m    0  1  1  x
p(mnct)    1 1    0  1  1  m
p(ctdo)    1 1    0  1  1  f
"""


def _ctd_vars(ctx, ic):
    ctx.let([
        ("__Bt", lambda q: add_chain([ic(_FE2)(q), ic(_MG)(q), ic(_MN)(q)])),
    ])
    ctx.let([
        ("__xFe", lambda q: ieee_div(ic(_FE2)(q), q('__Bt'))),
        ("__xMg", lambda q: ieee_div(ic(_MG)(q), q('__Bt'))),
        ("m", lambda q: ieee_div(ic(_MN)(q), q('__Bt'))),
        ("f", lambda q: f"({ic(_FE3)(q)} / 0.5e0)"),
    ])
    ctx.let([
        ("x", lambda q: ieee_div(q('__xFe'), f"({q('__xFe')} + {q('__xMg')})")),
    ])


CHLORITOID = PhaseSpec(
    name="Chloritoid", abbreviation="ctd",
    end_members=("mctd", "fctd", "mnct", "ctdo"),
    p_block=_CTD_P,
    mineral=MineralConfig(
        name="TC_ctd", n_oxygens=8, ideal_cations=2,
        valence_splits=({"element": "Fe", "method": "droop"},),
    ),
    required=(_FE2, _MG, _MN, _AL),
    build_variables=_ctd_vars,
)

# -- cordierite 'cd' ----------------------------------------------------------

_CD_P = """
p(crd)      2 1    1  3  -1  h  -1  m  -1  x
              2    0  1  1  m    0  1  1  x
p(fcrd)     2 1    0  1   1  x
              2    0  1  -1  m    0  1  1  x
p(hcrd)     1 1    0  1  1  h
p(mncd)     1 1    0  1  1  m
"""


def _cd_vars(ctx, ic):
    ctx.let([
        ("__Xt", lambda q: add_chain([ic(_FE2)(q), ic(_MG)(q), ic(_MN)(q)])),
    ])
    ctx.let([
        ("__xFe", lambda q: ieee_div(ic(_FE2)(q), q('__Xt'))),
        ("__xMg", lambda q: ieee_div(ic(_MG)(q), q('__Xt'))),
        ("m", lambda q: ieee_div(ic(_MN)(q), q('__Xt'))),
    ])
    ctx.let([
        ("x", lambda q: ieee_div(q('__xFe'), f"({q('__xFe')} + {q('__xMg')})")),
    ])


CORDIERITE = PhaseSpec(
    name="Cordierite", abbreviation="cd",
    end_members=("crd", "fcrd", "hcrd", "mncd"),
    p_block=_CD_P,
    mineral=MineralConfig(name="TC_cd", n_oxygens=18),
    required=(_FE2, _MG, _MN),
    build_variables=_cd_vars,
    order_parameters=("h",),
)

# -- staurolite 'st' ----------------------------------------------------------

_ST_P = """
p(mstm)    2 1    1  4  -1  f  -1  m  -1  x  -4/3  t
             2    0  1  1  m    0  1  1  x
p(fst)     2 1    0  1   1  x
             2    0  1  -1  m    0  1  1  x
p(mnstm)   1 1    0  1  1  m
p(msto)    1 1    0  1  1  f
p(mstt)    1 1    0  1  4/3  t
"""


def _st_vars(ctx, ic):
    ctx.let([
        ("__Xt", lambda q: add_chain([ic(_MG)(q), ic(_FE2)(q), ic(_MN)(q)])),
    ])
    ctx.let([
        ("__xFe", lambda q: ieee_div(ic(_FE2)(q), q('__Xt'))),
        ("__xMg", lambda q: ieee_div(ic(_MG)(q), q('__Xt'))),
        ("m", lambda q: ieee_div(ic(_MN)(q), q('__Xt'))),
        ("f", lambda q: f"({ic(_FE3)(q)} / 2e0)"),
        ("t", lambda q: f"({ic(_TI)(q)} / 2e0)"),
    ])
    ctx.let([
        ("x", lambda q: ieee_div(q('__xFe'), f"({q('__xFe')} + {q('__xMg')})")),
    ])


STAUROLITE = PhaseSpec(
    name="Staurolite", abbreviation="st",
    end_members=("mstm", "fst", "mnstm", "msto", "mstt"),
    p_block=_ST_P,
    mineral=MineralConfig(
        name="TC_st", n_oxygens=48, ideal_cations=6,
        valence_splits=({"element": "Fe", "method": "droop"},),
    ),
    required=(_MG, _FE2, _MN, _AL, _TI),
    build_variables=_st_vars,
)

# -- epidote 'ep' -------------------------------------------------------------

_EP_P = """
p(cz)    1  1    1  2 -1  f  -1  Q
p(ep)    1  1    0  1  2  Q
p(fep)   1  1    0  2  1  f  -1  Q
"""


def _ep_vars(ctx, ic):
    ctx.let([("f", lambda q: f"({ic(_FE3)(q)} / 2e0)")])


EPIDOTE = PhaseSpec(
    name="Epidote", abbreviation="ep",
    end_members=("cz", "ep", "fep"),
    p_block=_EP_P,
    mineral=MineralConfig(
        name="TC_ep", n_oxygens=12.5, preprocess="feo_to_fe2o3",
    ),
    required=(_AL,),
    build_variables=_ep_vars,
    order_parameters=("Q",),
)

# -- feldspars 'pl4tr' / 'k4tr' ----------------------------------------------

_PL_P = """
p(ab)   1 1    1 2 -1 k -1 ca
p(an)   1 1    0 1  1 ca
p(san)  1 1    0 1  1 k
"""

_KSP_P = """
p(ab)   1 1    0 1  1 na
p(an)   1 1    0 1  1 ca
p(san)  1 1    1 2 -1 na -1 ca
"""


def _pl_vars(ctx, ic):
    ctx.let([
        ("__At", lambda q: add_chain([ic(_NA)(q), ic(_CA)(q), ic(_K)(q)])),
    ])
    ctx.let([
        ("ca", lambda q: ieee_div(ic(_CA)(q), q('__At'))),
        ("k", lambda q: ieee_div(ic(_K)(q), q('__At'))),
    ])


def _ksp_vars(ctx, ic):
    ctx.let([
        ("__At", lambda q: add_chain([ic(_NA)(q), ic(_CA)(q), ic(_K)(q)])),
    ])
    ctx.let([
        ("na", lambda q: ieee_div(ic(_NA)(q), q('__At'))),
        ("ca", lambda q: ieee_div(ic(_CA)(q), q('__At'))),
    ])


_FSP_MIN = MineralConfig(name="TC_fsp", n_oxygens=8)
_FSP_REQ = (_NA, _CA, _K, _AL, _SI)

PLAGIOCLASE = PhaseSpec(
    name="Plagioclase", abbreviation="pl4tr",
    end_members=("ab", "an", "san"),
    p_block=_PL_P, mineral=_FSP_MIN, required=_FSP_REQ,
    build_variables=_pl_vars,
)

KFELDSPAR = PhaseSpec(
    name="KFeldspar", abbreviation="k4tr",
    end_members=("ab", "an", "san"),
    p_block=_KSP_P, mineral=_FSP_MIN, required=_FSP_REQ,
    build_variables=_ksp_vars,
)

PHASES: dict[str, PhaseSpec] = {
    s.abbreviation: s
    for s in (
        GARNET, BIOTITE, MUSCOVITE, MARGARITE, CHLORITE, CHLORITOID,
        CORDIERITE, STAUROLITE, EPIDOTE, PLAGIOCLASE, KFELDSPAR,
    )
}

# -- orthopyroxene 'opx' ------------------------------------------------------

_OPX_P = """
p(en)      5 1    1  6  -1/2  Q  -1  c  -1  f  -1  m  -1  x  -1  y
             2    0  1  1/2  c    0  1  1  Q
             2    0  1  1/2  m    0  1  1  Q
             2    0  1  1  c    0  1  1  x
             2    0  1  1  m    0  1  1  x
p(fs)      6 1    0  2  -1/2  Q   1  x
             2    0  1  1/2  c    0  1  1  Q
             2    0  1  1/2  m    0  1  1  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  m    0  1  1  x
             2    0  1  -1  x    0  1  1  y
p(fm)      6 1    0  1   1  Q
             2    0  1  -1  c    0  1  1  Q
             2    0  1  -1  m    0  1  1  Q
             2    0  1  -1  c    0  1  1  x
             2    0  1  1  f    0  1  1  x
             2    0  1  1  x    0  1  1  y
p(mgts)    1 1    0  1  1  y
p(fopx)    1 1    0  1  1  f
p(mnopx)   1 1    0  1  1  m
p(odi)     1 1    0  1  1  c
"""


def _opx_vars(ctx, ic):
    ctx.let([
        ("x", _ratio(ic(_FE2), ic(_MG))),
        ("m", lambda q: f"({ic(_MN)(q)} / 2e0)"),
        ("y", lambda q: f"({ic(_AL)(q)} - (2e0 - {ic(_SI)(q)}))"),
        ("f", ic(_FE3)),
        ("c", ic(_CA)),
    ])


ORTHOPYROXENE = PhaseSpec(
    name="Orthopyroxene", abbreviation="opx",
    end_members=("en", "fs", "fm", "mgts", "fopx", "mnopx", "odi"),
    p_block=_OPX_P,
    mineral=MineralConfig(
        name="TC_opx", n_oxygens=6, ideal_cations=4,
        valence_splits=({"element": "Fe", "method": "droop"},),
    ),
    required=(_MG, _FE2, _MN, _CA, _AL, _SI),
    build_variables=_opx_vars,
    order_parameters=("Q",),
)

# -- ilmenite 'ilm' (FTO model) ----------------------------------------------

_ILM_P = """
p(oilm)  1 1    0  1  1  Q
p(dilm)  1 1    0  2  1  x -1  Q
p(dhem)  1 1    1  1 -1  x
"""


def _ilm_vars(ctx, ic):
    ctx.let([("x", lambda q: f"(1e0 - {ic(_FE3)(q)} / 2e0)")])


ILMENITE = PhaseSpec(
    name="Ilmenite", abbreviation="ilm",
    end_members=("oilm", "dilm", "dhem"),
    p_block=_ILM_P,
    mineral=MineralConfig(
        name="TC_ilm", n_oxygens=3, ideal_cations=2,
        valence_splits=({"element": "Fe", "method": "droop"},),
    ),
    required=(_FE2, _TI),
    build_variables=_ilm_vars,
    order_parameters=("Q",),
)

# -- ilmenite-hematite 'ilmm' (Mg/Mn-bearing) --------------------------------

_ILMM_P = """
p(oilm)    1 1    0  1  1  Q
p(dilm)    1 1    0  4  -1  g   1  i  -1  m  -1  Q
p(dhem)    1 1    1  1  -1  i
p(geik)    1 1    0  1  1  g
p(pnt)     1 1    0  1  1  m
"""


def _ilmm_vars(ctx, ic):
    ctx.let([
        ("i", lambda q: f"(1e0 - {ic(_FE3)(q)} / 2e0)"),
        ("g", ic(_MG)),
        ("m", ic(_MN)),
    ])


ILMENITE_MIXED = PhaseSpec(
    name="IlmeniteMixed", abbreviation="ilmm",
    end_members=("oilm", "dilm", "dhem", "geik", "pnt"),
    p_block=_ILMM_P,
    mineral=MineralConfig(name="TC_ilmm", n_oxygens=3, ideal_cations=2),
    required=(_FE2, _TI, _MG, _MN),
    build_variables=_ilmm_vars,
    order_parameters=("Q",),
)

# -- spinel 'sp' --------------------------------------------------------------

_SP_P = """
p(herc)  2 1    0  1   1  y
             2   -1  1   1  x    1  1   1  z
p(sp)    1 2    1  1  -1  x    1  1   1  z
p(mt)    1 1    1  2  -1  y -1  z
p(usp)   1 1    0  1   1  z
"""


def _sp_vars(ctx, ic):
    ctx.let([
        ("__p2", lambda q: (
            f"({ic(_AL)(q)} + {ic(_FE3)(q)} + 2e0 * {ic(_TI)(q)})"
        )),
        ("x", _ratio(ic(_FE2), ic(_MG))),
    ])
    ctx.let([
        ("y", lambda q: ieee_div(ic(_AL)(q), q('__p2'))),
        ("z", lambda q: ieee_div(f"(2e0 * {ic(_TI)(q)})", q('__p2'))),
    ])


SPINEL = PhaseSpec(
    name="Spinel", abbreviation="sp",
    end_members=("herc", "sp", "mt", "usp"),
    p_block=_SP_P,
    mineral=MineralConfig(
        name="TC_sp", n_oxygens=4, ideal_cations=3,
        preprocess="fe2o3_to_feo",
        valence_splits=({"element": "Fe", "method": "droop"},),
    ),
    required=(_MG, _FE2, _AL, _TI),
    build_variables=_sp_vars,
)

# -- magnetite 'mt1' ----------------------------------------------------------

_MT_P = """
p(imt)  1 1    0  2 -2  x  3  Q
p(dmt)  1 1    0  2  3  x -3  Q
p(usp)  1 1    1  1 -1  x
"""


def _mt_vars(ctx, ic):
    ctx.let([("x", lambda q: f"(1e0 - {ic(_TI)(q)})")])


MAGNETITE = PhaseSpec(
    name="Magnetite", abbreviation="mt1",
    end_members=("imt", "dmt", "usp"),
    p_block=_MT_P,
    mineral=MineralConfig(
        name="TC_mt1", n_oxygens=4, ideal_cations=3,
        valence_splits=({"element": "Fe", "method": "droop"},),
    ),
    required=(_FE2, _TI),
    build_variables=_mt_vars,
    order_parameters=("Q",),
    # Q=0 here would mean fully-NORMAL spinel, not disordered; the truly
    # random inversion is Q = 2x/(2+x) (the axfile's own dmt check value),
    # so that is the default when the caller supplies nothing.
    order_defaults={"Q": lambda q: f"(2e0 * {q('x')} / (2e0 + {q('x')}))"},
)

PHASES.update({
    s.abbreviation: s
    for s in (ORTHOPYROXENE, ILMENITE, ILMENITE_MIXED, SPINEL, MAGNETITE)
})

# -- sapphirine 'sa' ----------------------------------------------------------

_SA_P = """
p(spr4)    1 1    1  4  -1/4  Q  -1  f  -1  x  -1  y
p(spr5)    1 1    0  1  1  y
p(fspm)    3 1    0  2   1  x  -3/4  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  x    0  1  1  y
p(spro)    3 1    0  1   1  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  1  x    0  1  1  y
p(ospr)    1 1    0  1  1  f
"""


def _sa_vars(ctx, ic):
    ctx.let([
        ("x", _ratio(ic(_FE2), ic(_MG))),
        ("f", ic(_FE3)),
        ("y", lambda q: f"(({ic(_AL)(q)} + {ic(_SI)(q)}) - 10e0)"),
    ])


SAPPHIRINE = PhaseSpec(
    name="Sapphirine", abbreviation="sa",
    end_members=("spr4", "spr5", "fspm", "spro", "ospr"),
    p_block=_SA_P,
    mineral=MineralConfig(
        name="TC_sa", n_oxygens=20, ideal_cations=5,
        valence_splits=({"element": "Fe", "method": "droop"},),
    ),
    required=(_MG, _FE2, _AL, _SI),
    build_variables=_sa_vars,
    order_parameters=("Q",),
)

# -- legacy Cbar1 feldspars 'plc' / 'ksp' (Holland & Powell 2003) -------------

_PLC_P = """
p(abh)    1 1    1 2 -1 k -1 ca
p(anC)    1 1    0 1  1 ca
p(san)    1 1    0 1  1 k
"""

_KSP_C_P = """
p(san)     1 1    1  2  -1  ca  -1  na
p(abh)     1 1    0  1  1  na
p(anC)     1 1    0  1  1  ca
"""


def _plc_vars(ctx, ic):
    ctx.let([
        ("__At", lambda q: add_chain([ic(_NA)(q), ic(_CA)(q), ic(_K)(q)])),
    ])
    ctx.let([
        ("ca", lambda q: ieee_div(ic(_CA)(q), q('__At'))),
        ("k", lambda q: ieee_div(ic(_K)(q), q('__At'))),
    ])


def _ksp_c_vars(ctx, ic):
    ctx.let([
        ("__At", lambda q: add_chain([ic(_NA)(q), ic(_CA)(q), ic(_K)(q)])),
    ])
    ctx.let([
        ("na", lambda q: ieee_div(ic(_NA)(q), q('__At'))),
        ("ca", lambda q: ieee_div(ic(_CA)(q), q('__At'))),
    ])


PLAGIOCLASE_CBAR1 = PhaseSpec(
    name="PlagioclaseCbar1", abbreviation="plc",
    end_members=("abh", "anC", "san"),
    p_block=_PLC_P,
    mineral=MineralConfig(name="TC_plc", n_oxygens=8),
    required=(_NA, _CA, _K),
    build_variables=_plc_vars,
)

KFELDSPAR_CBAR1 = PhaseSpec(
    name="KFeldsparCbar1", abbreviation="ksp",
    end_members=("san", "abh", "anC"),
    p_block=_KSP_C_P,
    mineral=MineralConfig(name="TC_ksp", n_oxygens=8),
    required=(_NA, _CA, _K),
    build_variables=_ksp_c_vars,
)

PHASES.update({
    s.abbreviation: s
    for s in (SAPPHIRINE, PLAGIOCLASE_CBAR1, KFELDSPAR_CBAR1)
})


# X10: attach the verbatim axfile sf blocks (site-occupancy self-check
# surface) to every phase that does not already carry one inline.
from dataclasses import replace as _dc_replace  # noqa: E402

from petropandas_spark.hpxeos.sf_blocks import SF_BLOCKS as _SF_BLOCKS  # noqa: E402

for _ab, _blk in _SF_BLOCKS["metapelite"].items():
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

for _ab, _defs in _SITE_DEFS["metapelite"].items():
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
