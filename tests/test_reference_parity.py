"""Numeric parity: engine output vs the REFERENCE implementation itself.

The reference package (``/root/reference/src``, read-only) is imported
through ``tools/refshim`` (a minimal periodictable/matplotlib shim) and used
as a black-box oracle: for every mineral's multi-row fixture we require the
Spark engine's end-members to match the reference's pandas output to 1e-9.

This is the strongest parity statement available — stricter than the
ported invariant tests — and it is what caught the reference's
split-valence rename quirk (``_calc.py:825-841``).
"""

from __future__ import annotations

import sys

import pandas as pd
import pytest

REPO = "/root/repo"
for p in (f"{REPO}/tools/refshim", "/root/reference/src"):
    if p not in sys.path:
        sys.path.insert(0, p)

ref = pytest.importorskip("petropandas._minerals")

from petropandas_spark import minerals, minerals_ext as me  # noqa: E402
from petropandas_spark.frame import PetroFrame  # noqa: E402

# (engine config, reference singleton, fixture) — fixtures are the
# reference's own conftest multi-row datasets (conftest.py:45-586).
CASES = [
    (minerals.GARNET, "Grt", {
        "SiO2": [36.50, 38.20, 35.80], "Al2O3": [20.50, 22.10, 21.00],
        "FeO": [25.00, 18.50, 28.00], "MnO": [15.00, 2.00, 8.00],
        "MgO": [1.50, 15.00, 3.00], "CaO": [1.00, 4.00, 4.50],
    }),
    (me.GARNETFE3, "GrtFe3", {
        "SiO2": [36.00, 38.00, 37.00], "Al2O3": [0.00, 20.00, 5.00],
        "FeO": [27.90, 20.00, 8.00], "Cr2O3": [0.00, 0.00, 10.00],
        "CaO": [33.00, 3.00, 28.00], "MgO": [0.00, 12.00, 7.00],
        "MnO": [0.00, 2.00, 0.50],
    }),
    (minerals.FELDSPAR, "Fsp", {
        "SiO2": [64.76, 52.00, 68.00], "Al2O3": [18.31, 30.00, 19.50],
        "CaO": [0.00, 13.00, 0.50], "Na2O": [1.50, 3.50, 11.00],
        "K2O": [16.89, 0.50, 0.80],
    }),
    (minerals.CLINOPYROXENE, "Cpx", {
        "SiO2": [52.00, 48.50, 54.00], "Al2O3": [4.50, 8.00, 2.00],
        "FeO": [8.50, 12.00, 5.00], "MgO": [15.00, 10.00, 18.00],
        "CaO": [18.00, 20.00, 15.00], "Na2O": [1.50, 0.50, 3.00],
        "TiO2": [0.50, 1.00, 0.20],
    }),
    (me.ORTHOPYROXENE, "Opx", {
        "SiO2": [50.00, 48.00, 52.00], "Al2O3": [3.00, 5.00, 1.50],
        "FeO": [15.00, 25.00, 8.00], "MgO": [30.00, 18.00, 35.00],
        "CaO": [1.50, 3.00, 1.00], "TiO2": [0.50, 1.00, 0.20],
    }),
    (me.MUSCOVITE, "Ms", {
        "SiO2": [45.00, 42.00, 48.00], "Al2O3": [35.00, 30.00, 38.00],
        "FeO": [3.00, 8.00, 1.50], "MgO": [1.00, 3.00, 0.50],
        "TiO2": [0.50, 1.50, 0.30], "Na2O": [0.50, 0.30, 0.80],
        "K2O": [10.00, 9.50, 11.00], "BaO": [0.10, 0.20, 0.05],
    }),
    (me.BIOTITE, "Bt", {
        "SiO2": [43.00, 36.00, 36.50], "Al2O3": [12.50, 14.00, 17.50],
        "FeO": [3.00, 28.00, 5.00], "MgO": [28.00, 5.00, 18.00],
        "K2O": [10.50, 9.80, 10.20], "TiO2": [1.00, 3.50, 1.00],
        "MnO": [0.10, 0.50, 0.10], "Na2O": [0.10, 0.05, 0.10],
        "BaO": [0.00, 0.00, 0.00],
    }),
    (me.STAUROLITE, "St", {
        "SiO2": [28.0, 29.0, 27.5], "Al2O3": [53.0, 55.0, 51.0],
        "FeO": [13.0, 5.0, 10.0], "MgO": [2.5, 8.0, 2.0],
        "ZnO": [1.5, 0.2, 7.0], "MnO": [0.3, 0.5, 1.0],
        "TiO2": [0.7, 0.3, 0.5],
    }),
    (me.CHLORITE, "Chl", {
        "SiO2": [26.0, 24.0, 30.0], "Al2O3": [21.0, 22.0, 28.0],
        "FeO": [8.0, 28.0, 5.0], "MgO": [30.0, 10.0, 20.0],
        "Cr2O3": [0.1, 0.2, 0.0], "TiO2": [0.1, 0.3, 0.1],
    }),
    (me.EPIDOTE, "Ep", {
        "SiO2": [37.5, 38.5, 36.0], "Al2O3": [23.0, 30.0, 20.0],
        "FeO": [12.5, 2.0, 8.0], "CaO": [22.5, 23.5, 21.0],
        "MnO": [0.2, 0.1, 12.0], "TiO2": [0.1, 0.1, 0.3],
    }),
    (me.AMPHIBOLE, "Amp", {
        "SiO2": [43.0, 54.0, 56.0], "TiO2": [1.5, 0.2, 0.1],
        "Al2O3": [11.0, 2.5, 9.0], "FeO": [12.0, 8.0, 10.0],
        "MgO": [13.0, 20.0, 14.0], "CaO": [11.5, 12.0, 2.0],
        "Na2O": [1.5, 0.5, 6.5], "K2O": [0.8, 0.1, 0.1],
        "MnO": [0.2, 0.1, 0.1], "Cr2O3": [0.1, 0.0, 0.0],
    }),
    (me.TITANITE, "Ttn", {
        "SiO2": [30.48, 29.50, 30.00], "TiO2": [40.83, 35.00, 36.00],
        "Al2O3": [0.00, 6.00, 1.50], "FeO": [0.00, 0.50, 4.00],
        "CaO": [28.69, 28.00, 28.50], "MnO": [0.00, 0.10, 0.20],
        "MgO": [0.00, 0.05, 0.10], "SnO2": [0.00, 0.00, 0.00],
        "Nb2O5": [0.00, 0.00, 0.00],
    }),
    (me.CHLORITOID, "Cld", {
        "SiO2": [24.5, 25.0, 23.0], "Al2O3": [39.5, 40.0, 38.0],
        "FeO": [22.0, 8.0, 18.0], "MgO": [5.0, 18.0, 3.0],
        "MnO": [3.0, 1.0, 14.0], "TiO2": [0.3, 0.5, 0.2],
    }),
    (me.CORDIERITE, "Crd", {
        "SiO2": [48.0, 47.0, 46.0], "Al2O3": [32.5, 31.0, 30.0],
        "FeO": [5.0, 14.0, 6.0], "MgO": [10.5, 3.0, 8.0],
        "MnO": [0.3, 0.5, 7.0], "Na2O": [0.5, 0.3, 0.4],
        "K2O": [0.1, 0.1, 0.2], "CaO": [0.1, 0.1, 0.1],
    }),
    (me.ILMENITE, "Ilm", {
        "SiO2": [0.00, 0.00, 0.00], "TiO2": [52.66, 50.00, 51.00],
        "Al2O3": [0.00, 0.00, 0.00], "FeO": [47.34, 35.00, 38.00],
        "MgO": [0.00, 14.00, 0.50], "MnO": [0.00, 0.50, 10.00],
        "Cr2O3": [0.00, 0.00, 0.00],
    }),
    (me.SPINEL, "Spl", {
        "SiO2": [0.00, 0.00, 0.00], "TiO2": [0.20, 0.50, 0.30],
        "Al2O3": [55.00, 30.00, 15.00], "FeO": [10.00, 25.00, 15.00],
        "Fe2O3": [3.00, 5.00, 8.00], "Cr2O3": [5.00, 3.00, 45.00],
        "MgO": [25.00, 5.00, 10.00], "MnO": [0.30, 0.20, 0.10],
        "ZnO": [0.50, 0.30, 0.10],
    }),
]


@pytest.mark.parametrize(
    "config,ref_name,data", CASES, ids=[c[1] for c in CASES]
)
def test_end_members_match_reference(spark, config, ref_name, data):
    ref_mineral = getattr(ref, ref_name)
    expected = ref_mineral.end_members(pd.DataFrame(data))

    pdf = pd.DataFrame(data)
    pdf.insert(0, "id", range(len(pdf)))
    pf = PetroFrame.ingest(spark.createDataFrame(pdf))
    got = (
        pf.end_members(config).df.toPandas()
        .sort_values("id").reset_index(drop=True).drop(columns=["id"])
    )

    assert list(got.columns) == list(expected.columns)
    pd.testing.assert_frame_equal(
        got, expected.reset_index(drop=True),
        check_exact=False, atol=1e-9, rtol=1e-9,
    )


@pytest.mark.parametrize(
    "config,ref_name,data", CASES, ids=[c[1] for c in CASES]
)
def test_end_members_blank_row_matches_reference(spark, config, ref_name,
                                                 data):
    """Round-7 NaN sweep: append a BLANK analysis row (all oxides 0 —
    all-NaN APFU) to every emitter fixture and require value-for-value
    parity.  Pre-fix, both engines' NaN-sorts-largest LEAST fabricated
    clipped values and NaN > 0 took the wrong gate branch, so blank
    rows produced invented end members instead of the reference's
    0.0/NaN flow."""
    import numpy as np

    blank = {c: list(v) + [0.0] for c, v in data.items()}
    ref_mineral = getattr(ref, ref_name)
    with np.errstate(all="ignore"):
        expected = ref_mineral.end_members(pd.DataFrame(blank))

    pdf = pd.DataFrame(blank)
    pdf.insert(0, "id", range(len(pdf)))
    pf = PetroFrame.ingest(spark.createDataFrame(pdf))
    got = (
        pf.end_members(config).df.toPandas()
        .sort_values("id").reset_index(drop=True).drop(columns=["id"])
    )
    assert list(got.columns) == list(expected.columns)
    pd.testing.assert_frame_equal(
        got, expected.reset_index(drop=True),
        check_exact=False, atol=1e-9, rtol=1e-9,
    )


# -- TC-phase polymorphic dispatch parity ------------------------------------
#
# The reference routes THERMOCALC Phase instances through the SAME mineral
# accessor (``df.mineral.apfu(TC_g)``, ref hpxeos/base.py:47-58); the engine
# must do the same through PetroFrame with identical numbers.

GRT_DATA = {
    "SiO2": [36.50, 38.20, 35.80], "Al2O3": [20.50, 22.10, 21.00],
    "FeO": [25.00, 18.50, 28.00], "MnO": [15.00, 2.00, 8.00],
    "MgO": [1.50, 15.00, 3.00], "CaO": [1.00, 4.00, 4.50],
    "TiO2": [0.10, 0.20, 0.15], "Cr2O3": [0.05, 0.10, 0.02],
}


@pytest.mark.parametrize("method", ["apfu", "site_allocations"])
def test_tc_phase_mineral_dispatch_matches_reference(spark, method):
    from petropandas.hpxeos.metapelite import TC_g as REF_TC_G

    from petropandas_spark.hpxeos.metapelite import TC_g

    assert TC_g.mineral.site_definitions, "site defs must be attached"
    pdf = pd.DataFrame(GRT_DATA)
    expected = getattr(REF_TC_G, method)(pdf)
    if method == "site_allocations":
        expected.columns = [
            f"{s}__{ion}" for s, ion in expected.columns
        ]

    spdf = pdf.copy()
    spdf.insert(0, "id", range(len(spdf)))
    pf = PetroFrame.ingest(spark.createDataFrame(spdf))
    fn = pf.mineral_apfu if method == "apfu" else pf.site_allocations
    got = (
        fn(TC_g).df.toPandas()
        .sort_values("id").reset_index(drop=True).drop(columns=["id"])
    )
    got = got[[c for c in expected.columns]]
    pd.testing.assert_frame_equal(
        got, expected.reset_index(drop=True),
        check_exact=False, atol=1e-9, rtol=1e-9, check_names=False,
    )
