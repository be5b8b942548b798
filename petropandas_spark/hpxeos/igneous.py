"""Igneous phase set (Holland, Green & Powell 2018; Weller et al. 2024
garnet) — THERMOCALC axfile tc-ig50NCKFMASHTOCr.txt lineage.
"""

from __future__ import annotations

from petropandas_spark.hpxeos import PhaseSpec
from petropandas_spark.hpxeos.metapelite import (
    _CA, _FE2, _FE3, _MG, _SI, _AL, _TI,
)
from petropandas_spark.minerals import MineralConfig
from petropandas_spark.sqlgen import ieee_div

_CR = "Cr{3+}"

# -- garnet 'g_W24' (Weller et al. 2024, Cr/Ti-bearing) -----------------------

_G_W24_P = """
p(py)      2 1    1  4  -1  c  -1  cr  -1  x  -4  t
             2    0  1  1  c    0  1  1  x
p(alm)     2 1    0  1   1  x
             2    0  1  -1  c    0  1  1  x
p(gr)      1 1    0  2   1  c  -1  f
p(andr)    1 1    0  1  1  f
p(knor)    1 1    0  1  1  cr
p(tig)     1 1    0  1  4  t
"""


def _g_w24_vars(ctx, ic):
    # coupled substitution: tig carries an extra Mg on M2 (2·t = Ti_total),
    # so the M1-only Mg pool is Mg_total − Ti_total (ref igneous/garnet.py
    # docstring) — the one "shared-pool leak" case in the garnet family.
    ctx.let([
        ("c", lambda q: f"({ic(_CA)(q)} / 3e0)"),
        ("f", lambda q: f"({ic(_FE3)(q)} / 2e0)"),
        ("cr", lambda q: f"({ic(_CR)(q)} / 2e0)"),
        ("t", lambda q: f"({ic(_TI)(q)} / 2e0)"),
        ("x", lambda q: (
            ieee_div(ic(_FE2)(q), f"({ic(_FE2)(q)} + {ic(_MG)(q)} - {ic(_TI)(q)})")
        )),
    ])


GARNET_W24 = PhaseSpec(
    name="GarnetW24", abbreviation="g_W24",
    end_members=("py", "alm", "gr", "andr", "knor", "tig"),
    p_block=_G_W24_P,
    mineral=MineralConfig(
        name="TC_g_W24", n_oxygens=12, ideal_cations=8,
        valence_splits=({"element": "Fe", "method": "droop"},),
    ),
    required=(_MG, _FE2, _CA, _AL, _CR, _TI),
    build_variables=_g_w24_vars,
)

PHASES: dict[str, PhaseSpec] = {s.abbreviation: s for s in (GARNET_W24,)}

_NA_, _K_ = "Na{+}", "K{+}"
_MN_ = "Mn{2+}"


def _rat(a, b):
    return lambda q: ieee_div(a(q), f"({a(q)} + {b(q)})")


# -- olivine 'ol_H18' (CFMS, monticellite + Fe/Mg ordering) -------------------

_OL_H18_P = """
p(mont)    1 1    0  1  1  c
p(fa)      1 1    0  2  -1  Q   1  x
p(fo)      2 1    1  3  -1  c  -1  Q  -1  x
             2    0  1  1  c    0  1  1  x
p(cfm)     2 1    0  1  2  Q
             2    0  1  -1  c    0  1  1  x
"""


def _ol_h18_vars(ctx, ic):
    ctx.let([
        ("x", _rat(ic(_FE2), ic(_MG))),
        ("c", ic(_CA)),
    ])


OLIVINE_H18 = PhaseSpec(
    name="OlivineH18", abbreviation="ol_H18",
    end_members=("mont", "fa", "fo", "cfm"),
    p_block=_OL_H18_P,
    mineral=MineralConfig(name="TC_ol_H18", n_oxygens=4, ideal_cations=3),
    required=(_MG, _FE2, _CA),
    build_variables=_ol_h18_vars,
    order_parameters=("Q",),
)

# -- cordierite 'cd_G25' (Mn-free) --------------------------------------------

_CD_G25_P = """
p(crd)     1 1    1  2  -1  h  -1  x
p(fcrd)    1 1    0  1  1  x
p(hcrd)    1 1    0  1  1  h
"""


def _cd_g25_vars(ctx, ic):
    ctx.let([
        ("__Xt", lambda q: f"({ic(_FE2)(q)} + {ic(_MG)(q)})"),
    ])
    ctx.let([
        ("x", lambda q: ieee_div(ic(_FE2)(q), q('__Xt'))),
    ])


CORDIERITE_G25 = PhaseSpec(
    name="CordieriteG25", abbreviation="cd_G25",
    end_members=("crd", "fcrd", "hcrd"),
    p_block=_CD_G25_P,
    mineral=MineralConfig(name="TC_cd_G25", n_oxygens=18),
    required=(_MG, _FE2),
    build_variables=_cd_g25_vars,
    order_parameters=("h",),
)

# -- ilmenite 'ilm_W24' (geikielite-bearing, Q/Qt) ---------------------------

_ILM_W24_P = """
p(oilm)    1 1    0  1  1  Q
p(dilm)    2 1    0  2   1  i  -1  Q
             2    0  1  -1  i    0  1  1  m
p(hem)     1 1    1  1  -1  i
p(ogk)     1 1    0  2  -1  Q   1  Qt
p(dgk)     2 1    0  2   1  Q  -1  Qt
             2    0  1  1  i    0  1  1  m
"""


def _ilm_w24_vars(ctx, ic):
    ctx.let([
        ("i", lambda q: f"(1e0 - {ic(_FE3)(q)} / 2e0)"),
        ("m", _rat(ic(_MG), ic(_FE2))),
    ])


ILMENITE_W24 = PhaseSpec(
    name="IlmeniteW24", abbreviation="ilm_W24",
    end_members=("oilm", "dilm", "hem", "ogk", "dgk"),
    p_block=_ILM_W24_P,
    mineral=MineralConfig(name="TC_ilm_W24", n_oxygens=3, ideal_cations=2),
    required=(_FE2, _MG, _TI),
    build_variables=_ilm_w24_vars,
    order_parameters=("Q", "Qt"),
)

# -- biotite 'bi_G25' (Mn-free) -----------------------------------------------

_BI_G25_P = """
p(phl)     4 1    1  5  -1  f  -1  t  -1  x  -1  y  -2/3  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  1  x    0  1  1  y
p(annm)    1 1    0  2  -1/3  Q   1  x
p(obi)     4 1    0  1   1  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  -1  x    0  1  1  y
p(est)     1 1    0  1  1  y
p(tbi)     1 1    0  1  1  t
p(fbi)     1 1    0  1  1  f
"""


def _bi_g25_vars(ctx, ic):
    ctx.let([
        ("x", _rat(ic(_FE2), ic(_MG))),
        ("y", lambda q: f"({ic(_AL)(q)} - (4e0 - {ic(_SI)(q)}))"),
        ("f", ic(_FE3)),
        ("t", ic(_TI)),
    ])


BIOTITE_G25 = PhaseSpec(
    name="BiotiteG25", abbreviation="bi_G25",
    end_members=("phl", "annm", "obi", "est", "tbi", "fbi"),
    p_block=_BI_G25_P,
    mineral=MineralConfig(name="TC_bi_G25", n_oxygens=11),
    required=(_MG, _FE2, _TI, _AL, _SI),
    build_variables=_bi_g25_vars,
    order_parameters=("Q",),
)

# -- orthopyroxene 'opx_W24' (Cr/Ti/Na-bearing) ------------------------------

_OPX_W24_P = """
p(en)      6 1    1  5  -1  c  -1  j   1  Q  -1  x  -1  y
             2    0  1  -1  j    0  1  1  Q
             2    0  1  1  Q    0  1  1  t
             2    0  1  1  c    0  1  1  x
             2    0  1  1  j    0  1  1  x
             2    0  1  -1  Q    0  1  1  y
p(fs)      7 1    0  2   1  Q   1  x
             2    0  1  -1  j    0  1  1  Q
             2    0  1  1  Q    0  1  1  t
             2    0  1  -1  j    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  -1  Q    0  1  1  y
             2    0  1  -1  x    0  1  1  y
p(fm)      7 1    0  1  -2  Q
             2    0  1  2  j    0  1  1  Q
             2    0  1  -2  Q    0  1  1  t
             2    0  1  -1  c    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  2  Q    0  1  1  y
             2    0  1  1  x    0  1  1  y
p(odi)     1 1    0  1  1  c
p(mgts)    1 1    0  4  -1  cr  -1  f   1  y  -2  t
p(cren)    1 1    0  1  1  cr
p(obuf)    1 1    0  1  2  t
p(mess)    1 1    0  1  1  f
p(ojd)     1 1    0  1  1  j
"""


def _opx_w24_vars(ctx, ic):
    ctx.let([
        ("x", _rat(ic(_FE2), ic(_MG))),
        ("y", lambda q: f"(2e0 - {ic(_SI)(q)})"),
        ("c", ic(_CA)),
        ("j", ic(_NA_)),
        ("f", ic(_FE3)),
        ("t", ic(_TI)),
        ("cr", ic(_CR)),
    ])


ORTHOPYROXENE_W24 = PhaseSpec(
    name="OrthopyroxeneW24", abbreviation="opx_W24",
    end_members=("en", "fs", "fm", "odi", "mgts", "cren", "obuf", "mess",
                 "ojd"),
    p_block=_OPX_W24_P,
    mineral=MineralConfig(
        name="TC_opx_W24", n_oxygens=6, ideal_cations=4,
        valence_splits=({"element": "Fe", "method": "droop"},),
    ),
    required=(_MG, _FE2, _CA, _NA_, _AL, _SI, _TI, _CR),
    build_variables=_opx_w24_vars,
    order_parameters=("Q",),
)

# -- clinopyroxene 'cpx_W24' (the largest pyroxene model) --------------------

_CPX_W24_P = """
p(di)      1 1    1  4  -1  k  -1  n  -1  o  -1  y
p(cfs)     9 1    0  2   1  Q   1  x
             2    0  1  -1  k    0  1  1  Q
             2    0  1  -1  n    0  1  1  Q
             2    0  1  1  Q    0  1  1  t
             2    0  1  -1  k    0  1  1  x
             2    0  1  -1  n    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  -1  Q    0  1  1  y
             2    0  1  -1  x    0  1  1  y
p(cats)    1 1    0  4  -1  cr  -1  f   1  y  -2  t
p(crdi)    1 1    0  1  1  cr
p(cess)    1 1    0  1  1  f
p(cbuf)     1 1    0  1  2  t
p(jd)      1 1    0  1  1  n
p(cen)     6 1    0  2   1  o   1  Q
             2    0  1  -1  k    0  1  1  Q
             2    0  1  -1  n    0  1  1  Q
             2    0  1  1  Q    0  1  1  t
             2    0  1  -1  o    0  1  1  x
             2    0  1  -1  Q    0  1  1  y
p(cfm)     10 1    0  2  -1  x  -2  Q
             2    0  1  2  k    0  1  1  Q
             2    0  1  2  n    0  1  1  Q
             2    0  1  -2  Q    0  1  1  t
             2    0  1  1  k    0  1  1  x
             2    0  1  1  n    0  1  1  x
             2    0  1  1  o    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  2  Q    0  1  1  y
             2    0  1  1  x    0  1  1  y
p(kjd)     1 1    0  1  1  k
"""


def _cpx_w24_vars(ctx, ic):
    ctx.let([
        ("x", _rat(ic(_FE2), ic(_MG))),
        ("y", lambda q: f"(2e0 - {ic(_SI)(q)})"),
        ("o", lambda q: (
            f"(1e0 - {ic(_CA)(q)} - {ic(_NA_)(q)} - {ic(_K_)(q)})"
        )),
        ("n", ic(_NA_)),
        ("f", ic(_FE3)),
        ("t", ic(_TI)),
        ("cr", ic(_CR)),
        ("k", ic(_K_)),
    ])


CLINOPYROXENE_W24 = PhaseSpec(
    name="ClinopyroxeneW24", abbreviation="cpx_W24",
    end_members=("di", "cfs", "cats", "crdi", "cess", "cbuf", "jd", "cen",
                 "cfm", "kjd"),
    p_block=_CPX_W24_P,
    mineral=MineralConfig(
        name="TC_cpx_W24", n_oxygens=6, ideal_cations=4,
        valence_splits=({"element": "Fe", "method": "droop"},),
    ),
    required=(_MG, _FE2, _CA, _NA_, _K_, _AL, _SI, _TI, _CR),
    build_variables=_cpx_w24_vars,
    order_parameters=("Q",),
)

# -- spinel 'spl_T21' (Tomiya-style normal/inverse, Q1-Q3) -------------------

_SPL_T21_P = """
p(nsp)     2 1    1/3  4  1/3  t  -1/3  x  -1  c  2/3  Q1
             2    0  1  -1/3  t    0  1  1  x
p(isp)     2 1    2/3  3  -2/3  Q1  2/3  t  -2/3  x
             2    0  1  -2/3  t    0  1  1  x
p(nhc)      4 1    0  5  1/3  x  -1/3  y  -1  t  2/3  Q2  2/3  Q3
             2    0  1  1/3  t    0  1  1  x
             2    0  1  1/3  c    0  1  1  y
             2    0  1  1/3  t    0  1  1  y
p(ihc)     4 1    0  5  -1  t  -2/3  Q2  -2/3  Q3  2/3  x  -2/3  y
             2    0  1  2/3  t    0  1  1  x
             2    0  1  2/3  c    0  1  1  y
             2    0  1  2/3  t    0  1  1  y
p(nmt)     3 1    0  2  1/3  y  -2/3  Q3
             2    0  1  -1/3  c    0  1  1  y
             2    0  1  -1/3  t    0  1  1  y
p(imt)     3 1    0  2  2/3  Q3  2/3  y
             2    0  1  -2/3  c    0  1  1  y
             2    0  1  -2/3  t    0  1  1  y
p(picr)    1 1    0  1  1  c
p(usp)     1 1    0  1  1  t
"""


def _spl_t21_vars(ctx, ic):
    ctx.let([
        ("x", _rat(ic(_FE2), ic(_MG))),
        ("y", _rat(ic(_FE3), ic(_AL))),
        ("c", lambda q: f"({ic(_CR)(q)} / 2e0)"),
        ("t", ic(_TI)),
    ])


SPINEL_T21 = PhaseSpec(
    name="SpinelT21", abbreviation="spl_T21",
    end_members=("nsp", "isp", "nhc", "ihc", "nmt", "imt", "picr", "usp"),
    p_block=_SPL_T21_P,
    mineral=MineralConfig(
        name="TC_spl_T21", n_oxygens=4, ideal_cations=3,
        valence_splits=({"element": "Fe", "method": "droop"},),
    ),
    required=(_MG, _FE2, _AL, _CR, _TI),
    build_variables=_spl_t21_vars,
    order_parameters=("Q1", "Q2", "Q3"),
)

PHASES.update({
    s.abbreviation: s
    for s in (OLIVINE_H18, CORDIERITE_G25, ILMENITE_W24, BIOTITE_G25,
              ORTHOPYROXENE_W24, CLINOPYROXENE_W24, SPINEL_T21)
})


# Documented reuses in the igneous axfile: metapelite epidote/muscovite/
# plagioclase and the metabasite clinoamphibole appear verbatim.
def _register_reuses():
    from petropandas_spark.hpxeos import metabasite as _mb
    from petropandas_spark.hpxeos import metapelite as _mp

    PHASES.setdefault("ep", _mp.PHASES["ep"])
    PHASES.setdefault("mu", _mp.PHASES["mu"])
    PHASES.setdefault("pl4tr", _mp.PHASES["pl4tr"])
    PHASES.setdefault("hb", _mb.PHASES["hb"])


_register_reuses()


# X10: attach the verbatim axfile sf blocks (site-occupancy self-check
# surface) to every phase that does not already carry one inline.
from dataclasses import replace as _dc_replace  # noqa: E402

from petropandas_spark.hpxeos.sf_blocks import SF_BLOCKS as _SF_BLOCKS  # noqa: E402

for _ab, _blk in _SF_BLOCKS["igneous"].items():
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

for _ab, _defs in _SITE_DEFS["igneous"].items():
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
