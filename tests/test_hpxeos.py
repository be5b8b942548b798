"""hpxeos compiled-expression engine parity vs the reference (tools/refshim).

Each metapelite PhaseSpec's end-members are compared at 1e-9 against the
reference ``TC_*`` phases on the reference suite's own compositions
(``/root/reference/tests/test_tc_minerals.py:36-560``), including non-zero
order parameters (X6) where the phase accepts them.
"""

from __future__ import annotations

import sys

import pandas as pd
import pytest

REPO = "/root/repo"
for p in (f"{REPO}/tools/refshim", "/root/reference/src"):
    if p not in sys.path:
        sys.path.insert(0, p)

ref_mp = pytest.importorskip("petropandas.hpxeos.metapelite")

from petropandas_spark.frame import clean_plan  # noqa: E402
from petropandas_spark.hpxeos import add_phase_end_members  # noqa: E402
from petropandas_spark.hpxeos.metapelite import PHASES  # noqa: E402
from petropandas_spark.sqlgen import Plan  # noqa: E402

FIXTURES = {
    "g": {"SiO2": [38.5, 38.0, 42.0], "Al2O3": [22.1, 21.5, 23.0],
          "FeO": [28.3, 32.0, 10.0], "MgO": [5.2, 3.0, 20.0],
          "CaO": [3.8, 4.0, 4.0], "MnO": [1.5, 1.0, 0.5]},
    "bi": {"SiO2": [35.0], "Al2O3": [18.0], "FeO": [22.0], "MgO": [10.0],
           "TiO2": [3.0], "MnO": [0.3], "K2O": [9.0], "Na2O": [0.3]},
    "mu": {"SiO2": [45.0], "Al2O3": [35.0], "FeO": [3.0], "MgO": [1.0],
           "CaO": [0.2], "Na2O": [1.0], "K2O": [10.0]},
    "ma": {"SiO2": [30.0], "Al2O3": [50.0], "FeO": [2.0], "MgO": [0.5],
           "CaO": [12.0], "Na2O": [0.5], "K2O": [0.1]},
    "chl": {"SiO2": [25.0, 30.0], "Al2O3": [22.0, 20.0],
            "FeO": [18.0, 5.0], "MgO": [18.0, 25.0], "MnO": [0.3, 0.1]},
    "ctd": {"SiO2": [25.0], "Al2O3": [40.0], "FeO": [22.0], "MgO": [5.0],
            "MnO": [0.5]},
    "cd": {"SiO2": [48.0, 48.0], "Al2O3": [34.0, 34.0], "FeO": [10.0, 3.0],
           "MgO": [8.0, 12.0], "MnO": [0.0, 0.1]},
    "st": {"SiO2": [28.0], "Al2O3": [53.0], "FeO": [13.0], "MgO": [2.0],
           "MnO": [0.3], "TiO2": [0.8]},
    "ep": {"SiO2": [38.0], "Al2O3": [25.0], "FeO": [10.0], "CaO": [23.0]},
    "pl4tr": {"SiO2": [60.0, 55.0], "Al2O3": [25.0, 28.0],
              "CaO": [7.0, 12.0], "Na2O": [7.0, 4.0], "K2O": [1.0, 0.5]},
    "k4tr": {"SiO2": [60.0], "Al2O3": [25.0], "CaO": [7.0],
             "Na2O": [7.0], "K2O": [1.0]},
    "opx": {"SiO2": [52.0, 50.0], "Al2O3": [3.5, 6.0], "FeO": [15.0, 20.0],
            "MgO": [27.0, 20.0], "CaO": [1.0, 2.0], "MnO": [0.4, 0.6],
            "TiO2": [0.2, 0.3]},
    "ilm": {"TiO2": [50.0, 48.0], "FeO": [47.0, 49.0], "MnO": [0.5, 0.3],
            "MgO": [0.3, 0.2]},
    "ilmm": {"TiO2": [50.0, 48.0], "FeO": [44.0, 46.0], "MnO": [2.0, 1.0],
             "MgO": [1.5, 0.8]},
    "sp": {"Al2O3": [55.0, 30.0], "FeO": [15.0, 30.0], "Fe2O3": [4.0, 8.0],
           "MgO": [20.0, 8.0], "TiO2": [1.0, 5.0]},
    # magnetite: Q defaults to the random-inversion expression 2x/(2+x)
    "mt1": {"FeO": [85.0, 80.0], "TiO2": [8.0, 12.0]},
}

ORDER_PARAMS = {
    "bi": {"Q": 0.25}, "chl": {"QAl": 0.3, "Q1": 0.1, "Q4": 0.05},
    "cd": {"h": 0.4}, "ep": {"Q": 0.2}, "opx": {"Q": 0.2},
    "ilm": {"Q": 0.3}, "ilmm": {"Q": 0.4},
}

REF_PHASE = {
    "g": "TC_g", "bi": "TC_bi", "mu": "TC_mu", "ma": "TC_ma",
    "chl": "TC_chl", "ctd": "TC_ctd", "cd": "TC_cd", "st": "TC_st",
    "ep": "TC_ep", "pl4tr": "TC_pl4tr", "k4tr": "TC_k4tr",
    "opx": "TC_opx", "ilm": "TC_ilm", "ilmm": "TC_ilmm", "sp": "TC_sp",
    "mt1": "TC_mt1",
}


def _run_phase(spark, data: dict, abbrev: str, order_parameters=None):
    pdf = pd.DataFrame(data)
    pdf.insert(0, "id", range(len(pdf)))
    df = spark.createDataFrame(pdf)
    plan, fcols, _ = clean_plan(df.columns)
    add_phase_end_members(
        plan, fcols, PHASES[abbrev],
        order_parameters=order_parameters, carry=["id"],
    )
    out = plan.apply(df).toPandas()
    return out.sort_values("id").reset_index(drop=True).drop(columns=["id"])


@pytest.mark.parametrize("abbrev", list(FIXTURES))
def test_phase_matches_reference(spark, abbrev):
    ref_phase = getattr(ref_mp, REF_PHASE[abbrev])
    expected = ref_phase.end_members(pd.DataFrame(FIXTURES[abbrev]))
    got = _run_phase(spark, FIXTURES[abbrev], abbrev)
    assert list(got.columns) == list(expected.columns)
    pd.testing.assert_frame_equal(
        got, expected.reset_index(drop=True), atol=1e-9, rtol=1e-9
    )


@pytest.mark.parametrize("abbrev", list(ORDER_PARAMS))
def test_phase_with_order_parameters(spark, abbrev):
    op = ORDER_PARAMS[abbrev]
    ref_phase = getattr(ref_mp, REF_PHASE[abbrev])
    expected = ref_phase.end_members(
        pd.DataFrame(FIXTURES[abbrev]), order_parameters=op
    )
    got = _run_phase(spark, FIXTURES[abbrev], abbrev, order_parameters=op)
    pd.testing.assert_frame_equal(
        got, expected.reset_index(drop=True), atol=1e-9, rtol=1e-9
    )


def test_proportions_sum_to_100(spark):
    for abbrev, data in FIXTURES.items():
        got = _run_phase(spark, data, abbrev)
        for s in got.sum(axis=1):
            assert s == pytest.approx(100.0, abs=0.01), abbrev


# -- cross-set phases (metapelite extras, metabasite, igneous) ----------------

ref_mb = pytest.importorskip("petropandas.hpxeos.metabasite")
ref_ig = pytest.importorskip("petropandas.hpxeos.igneous")

from petropandas_spark.hpxeos import igneous as my_ig  # noqa: E402
from petropandas_spark.hpxeos import metabasite as my_mb  # noqa: E402

EXTRA_CASES = [
    (PHASES["sa"], ref_mp.TC_sa,
     {"SiO2": [13.0, 14.0], "Al2O3": [60.0, 57.0], "FeO": [8.0, 12.0],
      "MgO": [16.0, 13.0]}, {"Q": 0.1}),
    (PHASES["plc"], ref_mp.TC_plc,
     {"SiO2": [60.0], "Al2O3": [25.0], "CaO": [7.0], "Na2O": [7.0],
      "K2O": [1.0]}, None),
    (PHASES["ksp"], ref_mp.TC_ksp,
     {"SiO2": [64.0], "Al2O3": [19.0], "CaO": [0.5], "Na2O": [3.0],
      "K2O": [12.0]}, None),
    (my_mb.PHASES["ol"], ref_mb.TC_ol,
     {"SiO2": [39.0, 36.0], "MgO": [45.0, 25.0], "FeO": [14.0, 38.0]}, None),
    (my_ig.PHASES["g_W24"], ref_ig.TC_g_W24,
     {"SiO2": [38.5, 38.0], "Al2O3": [22.1, 20.0], "Cr2O3": [0.5, 2.0],
      "TiO2": [0.3, 1.0], "FeO": [25.0, 20.0], "MgO": [6.0, 10.0],
      "CaO": [3.8, 5.0]}, None),
]


@pytest.mark.parametrize(
    "spec,ref_phase,data,op", EXTRA_CASES,
    ids=[c[0].abbreviation for c in EXTRA_CASES],
)
def test_cross_set_phases_match_reference(spark, spec, ref_phase, data, op):
    for params in ({}, op) if op else ({},):
        expected = ref_phase.end_members(
            pd.DataFrame(data), order_parameters=params or None
        )
        pdf = pd.DataFrame(data)
        pdf.insert(0, "id", range(len(pdf)))
        df = spark.createDataFrame(pdf)
        plan, fcols, _ = clean_plan(df.columns)
        add_phase_end_members(
            plan, fcols, spec, order_parameters=params or None, carry=["id"]
        )
        got = (
            plan.apply(df).toPandas()
            .sort_values("id").reset_index(drop=True).drop(columns=["id"])
        )
        assert list(got.columns) == list(expected.columns)
        pd.testing.assert_frame_equal(
            got, expected.reset_index(drop=True), atol=1e-9, rtol=1e-9
        )


MB_CASES = [
    (lambda: my_mb.PHASES["hb"], "TC_hb",
     {"SiO2": [43.0, 50.0], "TiO2": [1.5, 0.5], "Al2O3": [11.0, 6.0],
      "FeO": [12.0, 10.0], "MgO": [13.0, 16.0], "CaO": [11.5, 12.0],
      "Na2O": [1.5, 1.0], "K2O": [0.8, 0.2]},
     {"z": 0.1, "a": 0.3, "k": 0.2, "Q1": 0.05, "Q2": 0.1}),
    (lambda: my_mb.PHASES["aug"], "TC_aug",
     {"SiO2": [52.0, 50.0], "Al2O3": [3.0, 5.0], "FeO": [7.0, 9.0],
      "MgO": [15.0, 13.0], "CaO": [20.0, 19.0], "Na2O": [0.8, 1.2]},
     {"Qfm": 0.1, "Qal": 0.2}),
    (lambda: my_mb.PHASES["dio"], "TC_dio",
     {"SiO2": [55.5, 55.0], "Al2O3": [9.0, 7.0], "FeO": [5.0, 6.0],
      "MgO": [8.0, 9.0], "CaO": [13.0, 14.0], "Na2O": [6.0, 5.0]},
     {"Q": 0.2, "Qaf": 0.1, "Qfm": 0.05}),
]


@pytest.mark.parametrize(
    "spec_fn,ref_name,data,op", MB_CASES, ids=["hb", "aug", "dio"]
)
def test_metabasite_phases_match_reference(spark, spec_fn, ref_name, data, op):
    ref_phase = getattr(ref_mb, ref_name)
    for params in ({}, op):
        expected = ref_phase.end_members(
            pd.DataFrame(data), order_parameters=params or None
        )
        pdf = pd.DataFrame(data)
        pdf.insert(0, "id", range(len(pdf)))
        df = spark.createDataFrame(pdf)
        plan, fcols, _ = clean_plan(df.columns)
        add_phase_end_members(
            plan, fcols, spec_fn(), order_parameters=params or None,
            carry=["id"],
        )
        got = (
            plan.apply(df).toPandas()
            .sort_values("id").reset_index(drop=True).drop(columns=["id"])
        )
        pd.testing.assert_frame_equal(
            got, expected.reset_index(drop=True), atol=1e-9, rtol=1e-9
        )


IG_CASES = [
    ("ol_H18", "TC_ol_H18",
     {"SiO2": [38.0, 35.0], "MgO": [42.0, 25.0], "FeO": [16.0, 33.0],
      "CaO": [0.3, 1.0]}, {"Q": 0.1}),
    ("cd_G25", "TC_cd_G25",
     {"SiO2": [49.0], "Al2O3": [33.0], "FeO": [6.0], "MgO": [10.0]},
     {"h": 0.3}),
    ("ilm_W24", "TC_ilm_W24",
     {"TiO2": [51.0, 49.0], "FeO": [44.0, 46.0], "MgO": [2.0, 1.0]},
     {"Q": 0.2, "Qt": 0.1}),
    ("bi_G25", "TC_bi_G25",
     {"SiO2": [37.0], "Al2O3": [16.0], "FeO": [16.0], "MgO": [13.0],
      "TiO2": [2.5], "K2O": [9.5]}, {"Q": 0.15}),
    ("opx_W24", "TC_opx_W24",
     {"SiO2": [53.0, 51.0], "Al2O3": [3.0, 5.0], "FeO": [14.0, 18.0],
      "MgO": [27.0, 22.0], "CaO": [1.2, 2.0], "Na2O": [0.1, 0.2],
      "TiO2": [0.2, 0.4], "Cr2O3": [0.3, 0.5]}, {"Q": 0.2}),
    ("cpx_W24", "TC_cpx_W24",
     {"SiO2": [51.0, 49.0], "Al2O3": [4.0, 6.5], "FeO": [7.5, 9.0],
      "MgO": [15.0, 13.0], "CaO": [19.0, 18.0], "Na2O": [0.8, 1.2],
      "K2O": [0.05, 0.1], "TiO2": [0.4, 0.8], "Cr2O3": [0.4, 0.2]},
     {"Q": 0.1}),
    ("spl_T21", "TC_spl_T21",
     {"Al2O3": [52.0, 20.0], "FeO": [18.0, 28.0], "MgO": [17.0, 9.0],
      "Cr2O3": [8.0, 38.0], "TiO2": [1.0, 3.0]},
     {"Q1": 0.2, "Q2": 0.1, "Q3": 0.05}),
]

MB2_CASES = [
    ("abc", "TC_abc", {"SiO2": [64.0, 62.0], "Al2O3": [22.0, 23.0],
                       "Na2O": [10.0, 8.0], "CaO": [1.0, 3.0]}, None),
    ("pli", "TC_pli", {"SiO2": [60.0], "Al2O3": [25.0], "CaO": [7.0],
                       "Na2O": [7.0], "K2O": [1.0]}, None),
]


@pytest.mark.parametrize(
    "abbrev,ref_name,data,op", IG_CASES + MB2_CASES,
    ids=[c[0] for c in IG_CASES + MB2_CASES],
)
def test_igneous_and_legacy_phases(spark, abbrev, ref_name, data, op):
    registries = {**my_ig.PHASES, **my_mb.PHASES}
    ref_mod = ref_ig if hasattr(ref_ig, ref_name) else ref_mb
    ref_phase = getattr(ref_mod, ref_name)
    for params in ({}, op) if op else ({},):
        expected = ref_phase.end_members(
            pd.DataFrame(data), order_parameters=params or None
        )
        pdf = pd.DataFrame(data)
        pdf.insert(0, "id", range(len(pdf)))
        df = spark.createDataFrame(pdf)
        plan, fcols, _ = clean_plan(df.columns)
        add_phase_end_members(
            plan, fcols, registries[abbrev], order_parameters=params or None,
            carry=["id"],
        )
        got = (
            plan.apply(df).toPandas()
            .sort_values("id").reset_index(drop=True).drop(columns=["id"])
        )
        pd.testing.assert_frame_equal(
            got, expected.reset_index(drop=True), atol=1e-9, rtol=1e-9
        )


def test_site_occupancies_match_reference(spark):
    """X10: sf-block evaluation — garnet and biotite occupancies equal the
    reference's ``site_occupancies`` given the same recovered variables."""
    from petropandas_spark.hpxeos import add_site_occupancies

    for abbrev, ref_name, op in (("g", "TC_g", None),
                                 ("bi", "TC_bi", {"Q": 0.2})):
        data = FIXTURES[abbrev]
        ref_phase = getattr(ref_mp, REF_PHASE[abbrev])
        raw = ref_phase._raw_apfu(pd.DataFrame(data))
        sf = ref_phase.site_fractions(raw)
        v = ref_phase.variables(sf, op)
        expected = ref_phase.site_occupancies(v)

        pdf = pd.DataFrame(data)
        pdf.insert(0, "id", range(len(pdf)))
        df = spark.createDataFrame(pdf)
        plan, fcols, _ = clean_plan(df.columns)
        add_site_occupancies(
            plan, fcols, PHASES[abbrev], order_parameters=op, carry=["id"]
        )
        got = (
            plan.apply(df).toPandas()
            .sort_values("id").reset_index(drop=True).drop(columns=["id"])
        )
        pd.testing.assert_frame_equal(
            got, expected.reset_index(drop=True), atol=1e-9, rtol=1e-9
        )


MB_VARIANT_CASES = [
    ("g", "TC_g", {"SiO2": [38.5, 38.0], "Al2O3": [22.1, 21.0],
                   "FeO": [28.3, 25.0], "MgO": [5.2, 8.0],
                   "CaO": [3.8, 4.0]}, None),
    ("bi", "TC_bi", {"SiO2": [36.0], "Al2O3": [17.0], "FeO": [18.0],
                     "MgO": [11.0], "TiO2": [2.0], "K2O": [9.5]},
     {"Q": 0.2}),
    ("chl", "TC_chl", {"SiO2": [26.0, 28.0], "Al2O3": [21.0, 20.0],
                       "FeO": [18.0, 12.0], "MgO": [20.0, 24.0]},
     {"QAl": 0.2, "Q1": 0.1, "Q4": 0.05}),
    ("opx", "TC_opx", {"SiO2": [52.0], "Al2O3": [4.0], "FeO": [16.0],
                       "MgO": [26.0], "CaO": [1.5]}, {"Q": 0.15}),
    ("ilmm", "TC_ilmm", {"TiO2": [50.0], "FeO": [46.0], "MgO": [1.5]},
     {"Q": 0.3}),
    ("mu", "TC_mu", {"SiO2": [46.0], "Al2O3": [34.0], "FeO": [2.5],
                     "MgO": [1.0], "CaO": [0.3], "Na2O": [1.0],
                     "K2O": [10.0]}, None),
]


@pytest.mark.parametrize(
    "abbrev,ref_name,data,op", MB_VARIANT_CASES,
    ids=[f"mb_{c[0]}" for c in MB_VARIANT_CASES],
)
def test_metabasite_mn_free_variants(spark, abbrev, ref_name, data, op):
    """The tc-mb51 axfile's Mn-free re-derivations (not reuses!): end-member
    lists and blocks differ from the metapelite versions."""
    ref_phase = getattr(ref_mb, ref_name)
    for params in ({}, op) if op else ({},):
        expected = ref_phase.end_members(
            pd.DataFrame(data), order_parameters=params or None
        )
        pdf = pd.DataFrame(data)
        pdf.insert(0, "id", range(len(pdf)))
        df = spark.createDataFrame(pdf)
        plan, fcols, _ = clean_plan(df.columns)
        add_phase_end_members(
            plan, fcols, my_mb.PHASES[abbrev],
            order_parameters=params or None, carry=["id"],
        )
        got = (
            plan.apply(df).toPandas()
            .sort_values("id").reset_index(drop=True).drop(columns=["id"])
        )
        assert list(got.columns) == list(expected.columns)
        pd.testing.assert_frame_equal(
            got, expected.reset_index(drop=True), atol=1e-9, rtol=1e-9
        )


def test_petroframe_phase_api(spark):
    from petropandas_spark.frame import PetroFrame

    pdf = pd.DataFrame(FIXTURES["g"])
    pf = PetroFrame.ingest(spark.createDataFrame(pdf))
    out = pf.phase_end_members(PHASES["g"]).df.toPandas()
    assert set(out.columns) == {"py", "alm", "spss", "gr", "kho"}
    for s in out.sum(axis=1):
        assert s == pytest.approx(100.0, abs=0.01)


def test_chlorite_site_occupancies_match_reference(spark):
    """X10 on the order-parameter-rich chlorite model (28-charge basis)."""
    from petropandas_spark.hpxeos import add_site_occupancies

    data = {"SiO2": [26.0, 28.0], "Al2O3": [21.0, 20.0],
            "FeO": [18.0, 12.0], "MgO": [20.0, 24.0], "MnO": [0.3, 0.1]}
    op = {"QAl": 0.2, "Q1": 0.1, "Q4": 0.05}
    ref_phase = ref_mp.TC_chl
    raw = ref_phase._raw_apfu(pd.DataFrame(data))
    v = ref_phase.variables(ref_phase.site_fractions(raw), op)
    expected = ref_phase.site_occupancies(v)

    pdf = pd.DataFrame(data)
    pdf.insert(0, "id", range(len(pdf)))
    df = spark.createDataFrame(pdf)
    plan, fcols, _ = clean_plan(df.columns)
    add_site_occupancies(
        plan, fcols, PHASES["chl"], order_parameters=op, carry=["id"]
    )
    got = (
        plan.apply(df).toPandas()
        .sort_values("id").reset_index(drop=True).drop(columns=["id"])
    )
    pd.testing.assert_frame_equal(
        got, expected.reset_index(drop=True), atol=1e-9, rtol=1e-9
    )


# -- X10 full-inventory site-occupancy parity ---------------------------------

IG_REUSE_DATA = {
    "ep": FIXTURES["ep"], "mu": FIXTURES["mu"], "pl4tr": FIXTURES["pl4tr"],
    "hb": MB_CASES[0][2],
}


def _x10_cases():
    """(spec, ref_phase, data, op, id) for EVERY phase in all three sets."""
    cases = {}

    def put(spec, ref_phase, data, op, cid):
        cases.setdefault(cid, (spec, ref_phase, data, op, cid))

    for ab in FIXTURES:
        put(PHASES[ab], getattr(ref_mp, REF_PHASE[ab]), FIXTURES[ab],
            ORDER_PARAMS.get(ab), f"mp_{ab}")
    for spec, ref_phase, data, op in EXTRA_CASES:
        setname = "mp" if spec.abbreviation in PHASES and PHASES.get(
            spec.abbreviation) is spec else "x"
        put(spec, ref_phase, data, op, f"{setname}_{spec.abbreviation}")
    for spec_fn, ref_name, data, op in MB_CASES:
        put(spec_fn(), getattr(ref_mb, ref_name), data, op,
            f"mb_{spec_fn().abbreviation}")
    for ab, ref_name, data, op in MB_VARIANT_CASES:
        put(my_mb.PHASES[ab], getattr(ref_mb, ref_name), data, op, f"mb_{ab}")
    for ab, ref_name, data, op in IG_CASES:
        put(my_ig.PHASES[ab], getattr(ref_ig, ref_name), data, op, f"ig_{ab}")
    for ab, ref_name, data, op in MB2_CASES:
        put(my_mb.PHASES[ab], getattr(ref_mb, ref_name), data, op, f"mb_{ab}")
    for ab, ref_phase in (("ep", ref_ig.TC_ep), ("mu", ref_ig.TC_mu),
                          ("pl4tr", ref_ig.TC_pl4tr), ("hb", ref_ig.TC_hb)):
        put(my_ig.PHASES[ab], ref_phase, IG_REUSE_DATA[ab],
            MB_CASES[0][3] if ab == "hb" else ORDER_PARAMS.get(ab),
            f"ig_{ab}")
    # EXTRA_CASES covers mb ol / ig g_W24 under their own registries
    put(my_mb.PHASES["ol"], ref_mb.TC_ol, EXTRA_CASES[3][2], None, "mb_ol")
    put(my_ig.PHASES["g_W24"], ref_ig.TC_g_W24, EXTRA_CASES[4][2], None,
        "ig_g_W24")
    return list(cases.values())


X10_CASES = _x10_cases()


def test_x10_covers_every_phase():
    """The parity inventory below must span all phases in all three sets."""
    covered = {id(spec) for spec, *_ in X10_CASES}
    missing = []
    from petropandas_spark.hpxeos import igneous as ig
    from petropandas_spark.hpxeos import metabasite as mb
    from petropandas_spark.hpxeos import metapelite as mp

    for mod, nm in ((mp, "mp"), (mb, "mb"), (ig, "ig")):
        for ab, spec in mod.PHASES.items():
            if id(spec) not in covered:
                missing.append(f"{nm}:{ab}")
    assert not missing, missing


@pytest.mark.parametrize(
    "spec,ref_phase,data,op,cid", X10_CASES, ids=[c[4] for c in X10_CASES]
)
def test_x10_site_occupancies_full_inventory(spark, spec, ref_phase, data,
                                             op, cid):
    """X10 for the FULL phase inventory: the compiled sf block's site
    occupancies equal the reference's ``site_occupancies`` at 1e-9 given
    the same composition and order parameters — the transcription
    self-check for every p/sf block in all three model sets."""
    from petropandas_spark.hpxeos import add_site_occupancies

    raw = ref_phase._raw_apfu(pd.DataFrame(data))
    v = ref_phase.variables(ref_phase.site_fractions(raw), op)
    expected = ref_phase.site_occupancies(v)

    pdf = pd.DataFrame(data)
    pdf.insert(0, "id", range(len(pdf)))
    df = spark.createDataFrame(pdf)
    plan, fcols, _ = clean_plan(df.columns)
    add_site_occupancies(plan, fcols, spec, order_parameters=op, carry=["id"])
    got = (
        plan.apply(df).toPandas()
        .sort_values("id").reset_index(drop=True).drop(columns=["id"])
    )
    pd.testing.assert_frame_equal(
        got, expected.reset_index(drop=True), atol=1e-9, rtol=1e-9
    )
