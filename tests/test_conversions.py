"""Golden tests for U*/V* conversions on ideal compositions (parity with
reference ``tests/test_calc.py`` strategy: exact APFU on ideal diopside)."""

import pandas as pd
import pytest

from petropandas_spark.frame import PetroFrame


def _pf(spark, pdf: pd.DataFrame) -> PetroFrame:
    return PetroFrame.ingest(spark.createDataFrame(pdf))


def test_diopside_apfu(spark, diopside):
    out = _pf(spark, diopside).cations(n_oxygens=6).df.toPandas()
    assert out["Si{4+}"].iloc[0] == pytest.approx(2.0, abs=1e-9)
    assert out["Ca{2+}"].iloc[0] == pytest.approx(1.0, abs=1e-9)
    assert out["Mg{2+}"].iloc[0] == pytest.approx(1.0, abs=1e-9)


def test_diopside_cation_basis(spark, diopside):
    out = _pf(spark, diopside).cations(n_cations=4).df.toPandas()
    assert out["Si{4+}"].iloc[0] == pytest.approx(2.0, abs=1e-9)
    assert out["Ca{2+}"].iloc[0] == pytest.approx(1.0, abs=1e-9)


def test_apfu_roundtrip(spark, diopside):
    """cations(n_oxygens=6).oxides() restores the original wt% values."""
    pf = _pf(spark, diopside)
    back = pf.cations(n_oxygens=6).oxides().df.toPandas()
    for ox, want in diopside.iloc[0].items():
        assert back[ox].iloc[0] == pytest.approx(want, abs=1e-9), ox


def test_to_moles(spark, diopside):
    from petropandas_spark import core

    out = _pf(spark, diopside).to_moles().df.toPandas()
    for ox in diopside.columns:
        assert out[ox].iloc[0] == pytest.approx(
            diopside[ox].iloc[0] / core.MW(ox), abs=1e-12
        )


def test_normalize(spark):
    pdf = pd.DataFrame([{"SiO2": 30.0, "MgO": 20.0, "Sample": "a"}])
    out = _pf(spark, pdf).normalize().df.toPandas()
    assert out["SiO2"].iloc[0] == pytest.approx(60.0)
    assert out["MgO"].iloc[0] == pytest.approx(40.0)
    assert out["Sample"].iloc[0] == "a"


def test_normalize_all_zero_row_yields_nan_not_abort(spark):
    """A blank analysis row (all oxides 0 — real below-detection data)
    sums to 0; the reference's unguarded pandas division gives NaN for
    every cell, and Spark's plain ``/`` ABORTED the whole job under
    ANSI mode.  ieee_div reproduces the pandas row exactly while
    leaving non-blank rows bit-identical."""
    import math

    pdf = pd.DataFrame([
        {"SiO2": 30.0, "MgO": 20.0, "Sample": "a"},
        {"SiO2": 0.0, "MgO": 0.0, "Sample": "blank"},
    ])
    out = (_pf(spark, pdf).normalize().df.toPandas()
           .sort_values("Sample").reset_index(drop=True))
    assert out["SiO2"].iloc[0] == pytest.approx(60.0)
    assert math.isnan(out["SiO2"].iloc[1])
    assert math.isnan(out["MgO"].iloc[1])


def test_apfu_all_zero_row_yields_nan_not_abort(spark):
    """Same hazard as normalize: the APFU oxygen/charge factor divides
    by the row's mole sum, which is 0 on a blank analysis row — the
    reference's unguarded pandas factor gives +inf and 0·inf = NaN
    per cell; Spark's plain ``/`` aborted the job under ANSI mode."""
    import math

    pdf = pd.DataFrame([
        {"SiO2": 40.0, "MgO": 10.0, "Sample": "a"},
        {"SiO2": 0.0, "MgO": 0.0, "Sample": "blank"},
    ])
    out = (_pf(spark, pdf).cations(n_oxygens=12).df.toPandas()
           .sort_values("Sample").reset_index(drop=True))
    si = [c for c in out.columns if c.startswith("Si")][0]
    assert out[si].iloc[0] > 0
    assert math.isnan(out[si].iloc[1])


def test_split_valence_blank_row_yields_nan_not_abort(spark):
    """Droop and Schumacher divide by the row's APFU sum (reference
    _calc.py:728,753 — unguarded); a blank analysis row must flow NaN
    through the split on both methods instead of aborting under ANSI."""
    import math

    pdf = pd.DataFrame([
        {"SiO2": 38.0, "FeO": 30.0, "MgO": 5.0, "Sample": "a"},
        {"SiO2": 0.0, "FeO": 0.0, "MgO": 0.0, "Sample": "blank"},
    ])
    pf = _pf(spark, pdf).cations(n_oxygens=12)
    for method in ("droop", "schumacher"):
        out = pf.split_valence("Fe", method=method).df.toPandas()
        blank = out[out["Sample"] == "blank"].iloc[0]
        good = out[out["Sample"] == "a"].iloc[0]
        fe = [c for c in out.columns if c.startswith("Fe")]
        assert fe and all(math.isnan(blank[c]) for c in fe), method
        assert all(not math.isnan(good[c]) for c in fe), method


def test_ingest_cleans_negatives_and_nans(spark):
    pdf = pd.DataFrame([{"SiO2": -1.0, "MgO": None, "Sample": "x"}])
    out = PetroFrame.ingest(spark.createDataFrame(pdf)).df.toPandas()
    assert out["SiO2"].iloc[0] == 0.0
    assert out["MgO"].iloc[0] == 0.0
    assert out["Sample"].iloc[0] == "x"


def test_ingest_applies_aliases(spark):
    pdf = pd.DataFrame([{"FeO*": 10.0, " SiO2 ": 50.0}])
    out = PetroFrame.ingest(spark.createDataFrame(pdf)).df
    assert "FeO" in out.columns
    assert "SiO2" in out.columns


def test_select_rows(spark):
    pdf = pd.DataFrame(
        [
            {"SiO2": 40.0, "Mineral": "Garnet"},
            {"SiO2": 55.0, "Mineral": "Cpx"},
        ]
    )
    pf = _pf(spark, pdf)
    assert pf.select_rows("Grt", on="Mineral").df.count() == 0
    assert pf.select_rows("Garnet", on="Mineral").df.count() == 1
    assert pf.select_rows(["Garnet", "Cpx"], on="Mineral").df.count() == 2


def test_reframe(spark):
    pdf = pd.DataFrame([{"SiO2": 40.0, "MgO": 10.0}])
    out = _pf(spark, pdf).reframe(["SiO2", "CaO"]).df.toPandas()
    assert list(out.columns) == ["SiO2", "CaO"]
    assert out["CaO"].iloc[0] == 0.0


def test_split_valence_mn_and_ti(spark):
    """V6 beyond Fe: the VALENCE_PAIRS table also covers Mn (2/3) and
    Ti (4/3) — verified against the reference's split on the same APFU."""
    import sys
    for p in ("/root/repo/tools/refshim", "/root/reference/src"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import pandas as pd
    import pytest as _pt
    ref_calc = _pt.importorskip("petropandas._calc")

    from petropandas_spark.functions.valence import add_split_valence
    from petropandas_spark.sqlgen import Plan

    apfu = pd.DataFrame({
        "Si{4+}": [2.9, 3.0], "Al{3+}": [1.9, 2.0], "Mn{2+}": [1.2, 0.8],
        "Mg{2+}": [1.5, 1.6], "Ca{2+}": [0.5, 0.6],
    })
    for element in ("Mn", "Ti"):
        if element == "Ti":
            work = apfu.rename(columns={"Mn{2+}": "Ti{4+}"})
        else:
            work = apfu
        expected = ref_calc.split_valence(
            work, element=element, method="droop",
            n_oxygens=12, ideal_cations=8,
        )
        pdf = work.copy()
        pdf.insert(0, "id", range(len(pdf)))
        df = spark.createDataFrame(pdf)
        plan = Plan()
        add_split_valence(
            plan, list(work.columns), element=element, method="droop",
            n_oxygens=12, ideal_cations=8, carry=["id"],
        )
        got = (
            plan.apply(df).toPandas()
            .sort_values("id").reset_index(drop=True).drop(columns=["id"])
        )
        assert list(got.columns) == list(expected.columns)
        pd.testing.assert_frame_equal(
            got, expected.reset_index(drop=True), atol=1e-9, rtol=1e-9
        )


def test_concat_union_by_name(spark):
    import pandas as pd

    from petropandas_spark.frame import PetroFrame

    a = PetroFrame.ingest(spark.createDataFrame(
        pd.DataFrame({"SiO2": [50.0], "MgO": [10.0]})))
    b = PetroFrame.ingest(spark.createDataFrame(
        pd.DataFrame({"SiO2": [60.0], "CaO": [5.0]})))
    out = a.concat(b).df.toPandas().sort_values("SiO2").reset_index(drop=True)
    assert list(out["SiO2"]) == [50.0, 60.0]
    assert pd.isna(out["CaO"].iloc[0]) and out["CaO"].iloc[1] == 5.0
    assert out["MgO"].iloc[0] == 10.0 and pd.isna(out["MgO"].iloc[1])


def test_oxidize_moles_per_row_o_excess(spark):
    """V7 with a per-row Series o_excess (the reference accepts both)."""
    import sys
    for p in ("/root/repo/tools/refshim", "/root/reference/src"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import pandas as pd
    import pytest as _pt
    ref_calc = _pt.importorskip("petropandas._calc")

    from petropandas_spark.functions.conversions import add_oxidize_moles
    from petropandas_spark.sqlgen import Plan

    moles = pd.DataFrame({
        "SiO2": [0.6, 0.7], "FeO": [0.3, 0.2], "MgO": [0.1, 0.15],
    })
    o_excess = pd.Series([2.0, 5.0])
    expected = ref_calc.oxidize_moles(moles, o_excess)

    pdf = moles.copy()
    pdf.insert(0, "id", range(len(pdf)))
    pdf["o_x"] = o_excess.values
    df = spark.createDataFrame(pdf)
    plan = Plan()
    st = plan.stage()
    st.passthrough(["id", "o_x"] + list(moles.columns))
    add_oxidize_moles(plan, list(moles.columns), o_excess="o_x",
                      carry=["id"])
    got = (
        plan.apply(df).toPandas()
        .sort_values("id").reset_index(drop=True).drop(columns=["id"])
    )
    for c in expected.columns:
        assert (abs(got[c] - expected[c].reset_index(drop=True)) < 1e-9).all(), c


def test_cations_oxides_roundtrip_matches_reference(spark):
    """The documented round-trip ``df.cations(n_oxygens=N).oxides()``
    (ref README.md:139-141): APFU with stamped per-row total back to the
    original oxide wt% — compared against the reference accessors."""
    import sys
    for p in ("/root/repo/tools/refshim", "/root/reference/src"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import pandas as pd
    import pytest as _pt
    _pt.importorskip("petropandas")  # registers accessors

    from petropandas_spark.frame import PetroFrame

    data = {
        "SiO2": [38.5, 52.0], "Al2O3": [22.1, 4.5], "FeO": [28.3, 8.5],
        "MgO": [5.2, 15.0], "CaO": [3.8, 18.0],
    }
    ref_df = pd.DataFrame(data)
    ref_cat = ref_df.cations(n_oxygens=12)
    ref_round = ref_cat.oxides()

    pdf = pd.DataFrame(data)
    pdf.insert(0, "id", range(len(pdf)))
    pf = PetroFrame.ingest(spark.createDataFrame(pdf))
    cat = pf.cations(n_oxygens=12)
    got_cat = (cat.df.toPandas().sort_values("id")
               .reset_index(drop=True))
    for c in ref_cat.columns:
        assert (abs(got_cat[c] - ref_cat[c]) < 1e-9).all(), c

    got_round = (cat.oxides().df.toPandas().sort_values("id")
                 .reset_index(drop=True))
    for c in ref_round.columns:
        assert (abs(got_round[c] - ref_round[c]) < 1e-9).all(), c


def test_split_valence_idempotent(spark):
    """V6 idempotence: if both ion columns already exist the split is a
    passthrough (ref ``_calc.py:820-821``, decided driver-side)."""
    import pandas as pd

    from petropandas_spark.functions.valence import add_split_valence
    from petropandas_spark.sqlgen import Plan

    cols = ["Si{4+}", "Fe{2+}", "Fe{3+}", "Mg{2+}"]
    pdf = pd.DataFrame({c: [1.0, 2.0] for c in cols})
    pdf.insert(0, "id", range(2))
    df = spark.createDataFrame(pdf)
    plan = Plan()
    out = add_split_valence(
        plan, cols, element="Fe", method="droop",
        n_oxygens=12, ideal_cations=8, carry=["id"],
    )
    assert out == cols  # unchanged column list
    got = plan.apply(df).toPandas().sort_values("id").reset_index(drop=True)
    for c in cols:
        assert (got[c] == pdf[c].values).all()
