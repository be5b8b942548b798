"""B8/B9 thermodynamic bulk prep + sinks, A1-A3 means — parity vs reference."""

from __future__ import annotations

import sys

import pandas as pd
import pytest

REPO = "/root/repo"
for p in (f"{REPO}/tools/refshim", "/root/reference/src"):
    if p not in sys.path:
        sys.path.insert(0, p)

ref = pytest.importorskip("petropandas")  # registers .bulk/.oxides accessors

from petropandas_spark.frame import PetroFrame  # noqa: E402

BULK = {
    "SiO2": [59.03, 49.5], "TiO2": [0.7, 2.0], "Al2O3": [16.5, 14.5],
    "Fe2O3": [2.5, 3.5], "FeO": [5.0, 9.0], "MnO": [0.12, 0.18],
    "MgO": [4.0, 7.5], "CaO": [6.5, 10.5], "Na2O": [3.5, 2.5],
    "K2O": [2.0, 0.4], "P2O5": [0.15, 0.25],
}


def _pf(spark, data) -> PetroFrame:
    pdf = pd.DataFrame(data)
    pdf.insert(0, "id", range(len(pdf)))
    return PetroFrame.ingest(spark.createDataFrame(pdf))


def _sorted(pf) -> pd.DataFrame:
    out = pf.df.toPandas()
    return out.sort_values("id").reset_index(drop=True).drop(columns=["id"])


@pytest.mark.parametrize("kw,ref_method", [
    (dict(system="MnNCKFMASHTO"), "TCbulk"),
    (dict(system="NCKFMASHTO", oxygen=0.05), "TCbulk"),
    (dict(system="KFMASH"), "TCbulk"),
    (dict(system="MnNCKFMASHTO", H2O=5.0), "TCbulk"),
    (dict(system="MnNCKFMASHTO"), "Perplexbulk"),
    (dict(db="mp"), "MAGEMin"),
    (dict(db="ig", sys_in="wt"), "MAGEMin"),
])
def test_bulk_prep_matches_reference(spark, kw, ref_method):
    expected = getattr(pd.DataFrame(BULK).bulk, ref_method)(
        dataframe=True, **kw
    )
    mine = {"TCbulk": "tc_bulk", "Perplexbulk": "perplex_bulk",
            "MAGEMin": "magemin_bulk"}[ref_method]
    got = _sorted(getattr(_pf(spark, BULK), mine)(dataframe=True, **kw))
    assert list(got.columns) == list(expected.columns)
    pd.testing.assert_frame_equal(
        got, expected.reset_index(drop=True), atol=1e-9, rtol=1e-9
    )


def test_tc_bulk_text(spark):
    text = _pf(spark, BULK).tc_bulk()
    lines = text.splitlines()
    assert lines[0].startswith("bulk")
    assert len(lines) == 3  # header + 2 rows
    assert "%" in lines[1]


def test_perplex_text(spark):
    text = _pf(spark, BULK).perplex_bulk()
    assert text.startswith("begin thermodynamic component list")
    assert text.endswith("end thermodynamic component list")


def test_magemin_text(spark):
    text = _pf(spark, BULK).magemin_bulk()
    assert "# BULK-ROCK COMPOSITION" in text
    assert ";mp;mol;[" in text


def test_mean_matches_reference(spark):
    expected = pd.DataFrame(BULK).oxides.mean()
    got = _pf(spark, BULK).mean().df.toPandas()
    for c in expected.columns:
        assert got[c].iloc[0] == pytest.approx(expected[c].iloc[0], abs=1e-9)


def test_weighted_mean(spark):
    data = dict(BULK, w=[1.0, 3.0])
    got = _pf(spark, data).mean(weights="w").df.toPandas()
    exp = (pd.DataFrame(BULK) * [1.0, 3.0][0]).iloc[0:1]  # manual check below
    manual = (pd.DataFrame(BULK).mul(pd.Series([1.0, 3.0]), axis=0).sum()
              / 4.0)
    for c in BULK:
        assert got[c].iloc[0] == pytest.approx(manual[c], abs=1e-9)
    del exp


def test_config_call_time_reads(spark):
    from petropandas_spark import config as ppconfig

    pf = _pf(spark, BULK)
    ppconfig.set("default_system", "KFMASH")
    try:
        out = pf.tc_bulk(dataframe=True)
        assert list(out.df.columns)[1:] == ["H2O", "SiO2", "Al2O3", "MgO",
                                            "FeO", "K2O"]
    finally:
        ppconfig.reset()
