"""Igneous phase set (Holland, Green & Powell 2018; Weller et al. 2024
garnet) — THERMOCALC axfile tc-ig50NCKFMASHTOCr.txt lineage.
"""

from __future__ import annotations

from petropandas_spark.hpxeos import PhaseSpec
from petropandas_spark.hpxeos.metapelite import (
    _CA, _FE2, _FE3, _MG, _SI, _AL, _TI,
)
from petropandas_spark.minerals import MineralConfig

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
            f"({ic(_FE2)(q)} / ({ic(_FE2)(q)} + {ic(_MG)(q)} - {ic(_TI)(q)}))"
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
