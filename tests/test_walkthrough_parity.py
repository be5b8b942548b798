"""End-to-end walkthrough parity on the BUNDLED datasets.

The reference's documented workflow (docs/notebooks/walkthrough.ipynb)
drives its accessor API over the shipped CSVs (minerals, grt_profile,
bulk).  This file replays each step through the engine's PetroFrame API
on the same data and requires 1e-9 agreement with the reference's own
pandas output — the "a reference user can switch" statement, on real
data rather than synthetic fixtures.
"""

from __future__ import annotations

import sys

import pandas as pd
import pytest

REPO = "/root/repo"
for p in (f"{REPO}/tools/refshim", "/root/reference/src"):
    if p not in sys.path:
        sys.path.insert(0, p)

ref = pytest.importorskip("petropandas")

from petropandas_spark import datasets, minerals, minerals_ext as me  # noqa: E402
from petropandas_spark.frame import PetroFrame  # noqa: E402


@pytest.fixture(scope="module")
def ref_minerals():
    from petropandas.data import minerals as df
    return df


@pytest.fixture(scope="module")
def ref_profile():
    from petropandas.data import grt_profile as pro
    return pro


@pytest.fixture(scope="module")
def ref_bulk():
    from petropandas.data import bulk as rock
    return rock


@pytest.fixture(scope="module")
def pf_minerals(spark):
    return datasets.load_petro(spark, "minerals")


def _aligned(got: pd.DataFrame, expected: pd.DataFrame, key="Analysis_ID"):
    """Row-align on the analysis id, restrict to the expected columns."""
    g = got.sort_values(key).reset_index(drop=True)
    e = expected.sort_values(key).reset_index(drop=True)
    cols = [c for c in e.columns if c in g.columns]
    assert cols, (list(g.columns), list(e.columns))
    return g[cols], e[cols]


WALKTHROUGH_MINERALS = [
    ("Garnet", minerals.GARNET, "Grt"),
    ("Muscovite", me.MUSCOVITE, "Ms"),
    ("Biotite", me.BIOTITE, "Bt"),
    ("Amphibole", me.AMPHIBOLE, "Amp"),
    ("Staurolite", me.STAUROLITE, "St"),
    ("Cordierite", me.CORDIERITE, "Crd"),
]


@pytest.mark.parametrize("name,config,short",
                         WALKTHROUGH_MINERALS,
                         ids=[c[2] for c in WALKTHROUGH_MINERALS])
def test_end_members_on_bundled_data(spark, pf_minerals, ref_minerals,
                                     name, config, short):
    from petropandas import _minerals as rm

    expected = (ref_minerals.oxides.select(name, on="Mineral")
                .mineral.end_members(getattr(rm, short)))
    sel = ref_minerals["Mineral"] == name
    expected = expected.assign(
        Analysis_ID=ref_minerals.loc[sel, "Analysis_ID"].values)

    got = (pf_minerals.select_rows(name, on="Mineral")
           .end_members(config).df.toPandas())
    g, e = _aligned(got, expected)
    pd.testing.assert_frame_equal(g, e, atol=1e-9, rtol=1e-9)


@pytest.mark.parametrize("method", ["droop", "schumacher"])
def test_split_valence_on_bundled_garnet(spark, pf_minerals, ref_minerals,
                                         method):
    """walkthrough: g.oxides.split_valence("Fe", method, 12, 8) — the
    reference converts wt% → APFU → split → back to wt%; the engine
    chain is cations(12) → split_valence → oxides() (the documented
    round-trip), which must land on identical numbers."""
    g_ref = ref_minerals.oxides.select("Garnet", on="Mineral")
    expected = g_ref.oxides.split_valence("Fe", method, 12, 8)
    expected = expected.assign(
        Analysis_ID=ref_minerals.loc[
            ref_minerals["Mineral"] == "Garnet", "Analysis_ID"].values)

    got = (pf_minerals.select_rows("Garnet", on="Mineral")
           .cations(n_oxygens=12)
           .split_valence("Fe", method, 12, 8)
           .oxides().df.toPandas())
    g, e = _aligned(got, expected)
    pd.testing.assert_frame_equal(g, e, atol=1e-9, rtol=1e-9)


def test_afm_projection_chain(spark, pf_minerals, ref_minerals):
    """walkthrough AFM ternary inputs: select → reduce → apatite
    correction → moles → normalized, per mineral."""
    for name in ["Garnet", "Biotite", "Muscovite", "Staurolite"]:
        expected = (ref_minerals.oxides.select(name, on="Mineral")
                    .oxides.reduce().oxides.apatite_correction()
                    .moles.normalized())
        expected = expected.assign(
            Analysis_ID=ref_minerals.loc[
                ref_minerals["Mineral"] == name, "Analysis_ID"].values)
        # .oxides() first: the reference's oxides accessor operates on
        # oxide columns only (minerals.csv also carries elemental F/Cl,
        # nonzero for biotite/amphibole — they must not enter the
        # normalization denominator)
        got = (pf_minerals.select_rows(name, on="Mineral")
               .oxides().reduce().apatite_correction()
               .to_moles().normalize().df.toPandas())
        g, e = _aligned(got, expected)
        pd.testing.assert_frame_equal(g, e, atol=1e-9, rtol=1e-9,
                                      obj=name)


def test_profile_end_members_match(spark, ref_profile):
    """walkthrough: ProfilePlot feeds Grt end-members of the traverse —
    the per-point end-member values must match the reference's."""
    from petropandas import _minerals as rm

    expected = ref_profile.mineral.end_members(rm.Grt)
    expected = expected.assign(Label=ref_profile["Label"].values)
    pro = datasets.load_petro(spark, "grt_profile")
    got = pro.end_members(minerals.GARNET).df.toPandas()
    # the traverse has no Analysis_ID; its unique point Label aligns rows
    g, e = _aligned(got, expected, key="Label")
    pd.testing.assert_frame_equal(g, e, atol=1e-9, rtol=1e-9)


def test_bulk_mean_and_software_configs(spark, ref_bulk):
    """walkthrough: rock.oxides.mean() then TCbulk / Perplexbulk /
    MAGEMin on the averaged bulk — text artifacts must be identical."""
    expected_avg = ref_bulk.oxides.mean()
    rock = datasets.load_petro(spark, "bulk")
    got_avg = rock.mean()
    gp = got_avg.df.toPandas()
    cols = [c for c in expected_avg.columns if c in gp.columns]
    pd.testing.assert_frame_equal(
        gp[cols].reset_index(drop=True),
        expected_avg[cols].reset_index(drop=True),
        atol=1e-9, rtol=1e-9,
    )
    for ref_m, mine_m, kw in [
        ("TCbulk", "tc_bulk", dict(H2O=1.5, oxygen=0.1)),
        ("Perplexbulk", "perplex_bulk", dict(H2O=1.5, oxygen=0.1)),
        ("MAGEMin", "magemin_bulk", dict(H2O=1.5, oxygen=0.1, db="mp")),
    ]:
        expected = getattr(expected_avg.bulk, ref_m)(dataframe=True, **kw)
        got = getattr(got_avg, mine_m)(dataframe=True, **kw).df.toPandas()
        ec = [c for c in expected.columns if c != "Analysis_ID"]
        gc = [c for c in got.columns if c in ec]
        pd.testing.assert_frame_equal(
            got[gc].reset_index(drop=True),
            expected[ec].reset_index(drop=True),
            atol=1e-9, rtol=1e-9, obj=ref_m,
        )
