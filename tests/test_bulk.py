"""Bulk-rock layer (B1-B5) parity vs the reference oracle (tools/refshim).

Fixtures are the reference's granite/basalt/diorite bulks
(``/root/reference/tests/conftest.py:605-665``); every operator output is
compared numerically at 1e-9.
"""

from __future__ import annotations

import sys

import pandas as pd
import pytest

REPO = "/root/repo"
for p in (f"{REPO}/tools/refshim", "/root/reference/src"):
    if p not in sys.path:
        sys.path.insert(0, p)

ref_calc = pytest.importorskip("petropandas._calc")

from petropandas_spark.frame import PetroFrame  # noqa: E402

GRANITE = {
    "SiO2": [72.0], "TiO2": [0.3], "Al2O3": [14.0], "Fe2O3": [1.2],
    "FeO": [1.8], "MnO": [0.05], "MgO": [0.7], "CaO": [1.8],
    "Na2O": [3.2], "K2O": [4.5], "P2O5": [0.12],
}
BASALT = {
    "SiO2": [49.5], "TiO2": [2.0], "Al2O3": [14.5], "Fe2O3": [3.5],
    "FeO": [9.0], "MnO": [0.18], "MgO": [7.5], "CaO": [10.5],
    "Na2O": [2.5], "K2O": [0.4], "P2O5": [0.25],
}
DIORITE = {
    "SiO2": [59.03], "TiO2": [0.7], "Al2O3": [16.5], "Fe2O3": [2.5],
    "FeO": [5.0], "MnO": [0.12], "MgO": [4.0], "CaO": [6.5],
    "Na2O": [3.5], "K2O": [2.0], "P2O5": [0.15],
}
ALL = {k: GRANITE[k] + BASALT[k] + DIORITE[k] for k in GRANITE}


def _run(spark, data, method, **kw) -> pd.DataFrame:
    pdf = pd.DataFrame(data)
    pdf.insert(0, "id", range(len(pdf)))
    pf = PetroFrame.ingest(spark.createDataFrame(pdf))
    out = getattr(pf, method)(**kw).df.toPandas()
    return out.sort_values("id").reset_index(drop=True).drop(columns=["id"])


def test_alumina_saturation_matches_reference(spark):
    expected = ref_calc.alumina_saturation(pd.DataFrame(ALL))
    got = _run(spark, ALL, "alumina_saturation")
    pd.testing.assert_frame_equal(got, expected, atol=1e-9, rtol=1e-9)


def test_shand_classification(spark):
    got = _run(spark, ALL, "alumina_saturation", classify=True)
    # granite slightly peraluminous, basalt/diorite metaluminous
    assert got["shand_class"].iloc[1] == "metaluminous"
    assert (got["A/CNK"] > 0).all()


def test_oxide_ratios_matches_reference(spark):
    expected = ref_calc.oxide_ratios(pd.DataFrame(ALL))
    got = _run(spark, ALL, "oxide_ratios")
    assert list(got.columns) == list(expected.columns)
    pd.testing.assert_frame_equal(got, expected, atol=1e-9, rtol=1e-9)


def test_apatite_correction_matches_reference(spark):
    expected = ref_calc.apatite_correction(pd.DataFrame(ALL))
    got = _run(spark, ALL, "apatite_correction")
    pd.testing.assert_frame_equal(
        got[expected.columns], expected, atol=1e-9, rtol=1e-9
    )


def test_cipw_norm_simple_matches_reference(spark):
    expected = ref_calc.cipw_norm_simple(pd.DataFrame(ALL))
    got = _run(spark, ALL, "cipw_norm_simple")  # drop_zero replicates A4
    assert list(got.columns) == list(expected.columns)
    pd.testing.assert_frame_equal(got, expected, atol=1e-9, rtol=1e-9)


def test_cipw_simple_granite_quartz_feldspar(spark):
    # ref tests/test_bulk.py sanity: granite → Q + feldspars dominate
    got = _run(spark, GRANITE, "cipw_norm_simple")
    assert got["Q"].iloc[0] > 20.0
    assert got["Or"].iloc[0] + got["Ab"].iloc[0] + got["An"].iloc[0] > 40.0


# ---------------------------------------------------------------------------
# B6/B7 full CIPW norms (vectorized mapInPandas) vs reference
# ---------------------------------------------------------------------------

# silica-deficient alkaline composition to exercise the deficiency cascade
NEPHELINITE = {
    "SiO2": [40.5], "TiO2": [2.8], "Al2O3": [11.5], "Fe2O3": [5.5],
    "FeO": [8.0], "MnO": [0.2], "MgO": [12.5], "CaO": [12.0],
    "Na2O": [4.8], "K2O": [1.2], "P2O5": [0.9],
}
CIPW_ALL = {k: GRANITE[k] + BASALT[k] + DIORITE[k] + NEPHELINITE[k]
            for k in GRANITE}


def _run_cipw(spark, data, **kw) -> pd.DataFrame:
    pdf = pd.DataFrame(data)
    pdf.insert(0, "id", range(len(pdf)))
    pf = PetroFrame.ingest(spark.createDataFrame(pdf).repartition(2))
    out = pf.cipw_norm(**kw).df.toPandas()
    return out.sort_values("id").reset_index(drop=True).drop(columns=["id"])


@pytest.mark.parametrize("kw", [
    dict(complete_results=True),
    dict(complete_results=True, normsum=True),
    dict(complete_results=False),
    dict(complete_results=True, hb=True),
    dict(complete_results=False, hb=True),
])
def test_cipw_norm_matches_reference(spark, kw):
    hb = kw.get("hb", False)
    ref_fn = ref_calc.cipw_norm_hb if hb else ref_calc.cipw_norm
    ref_kw = {k: v for k, v in kw.items() if k != "hb"}
    expected = ref_fn(pd.DataFrame(CIPW_ALL), **ref_kw).reset_index(drop=True)
    got = _run_cipw(spark, CIPW_ALL, **kw)
    assert list(got.columns) == list(expected.columns)
    pd.testing.assert_frame_equal(got, expected, atol=1e-9, rtol=1e-9)


def test_cipw_granite_sanity(spark):
    # ref tests/test_bulk.py: granite → quartz + feldspars, sum ≈ 100
    got = _run_cipw(spark, GRANITE)
    assert got["Q"].iloc[0] > 20.0
    assert got["Total"].iloc[0] == pytest.approx(100.0, abs=1.5)


def test_cipw_nephelinite_undersaturated(spark):
    got = _run_cipw(spark, NEPHELINITE, complete_results=True)
    assert got["Q"].iloc[0] == 0.0
    assert got["Ne"].iloc[0] > 0.0  # deficiency cascade reached nepheline
