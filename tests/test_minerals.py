"""Mineral pipeline golden tests (parity with reference
``tests/test_minerals.py`` strategy: ideal compositions with analytically
known end-members; sums-to-100 and non-negativity invariants)."""

import pandas as pd
import pytest

from petropandas_spark import minerals
from petropandas_spark.frame import PetroFrame


def _pf(spark, pdf: pd.DataFrame) -> PetroFrame:
    return PetroFrame.ingest(spark.createDataFrame(pdf))


class TestGarnet:
    def test_almandine_end_members(self, spark, almandine):
        out = _pf(spark, almandine).end_members(minerals.GARNET).df.toPandas()
        assert out["Alm"].iloc[0] == pytest.approx(100.0, abs=1e-6)
        for em in ["Prp", "Sps", "Grs", "Adr", "Uvr"]:
            assert out[em].iloc[0] == pytest.approx(0.0, abs=1e-6)

    def test_pyrope_grossular_mix(self, spark, pyrope_grossular):
        out = _pf(spark, pyrope_grossular).end_members(minerals.GARNET).df.toPandas()
        assert out["Prp"].iloc[0] == pytest.approx(50.0, abs=1e-6)
        assert out["Grs"].iloc[0] == pytest.approx(50.0, abs=1e-6)

    def test_sums_to_100(self, spark, almandine, pyrope_grossular):
        for pdf in (almandine, pyrope_grossular):
            out = _pf(spark, pdf).end_members(minerals.GARNET).df.toPandas()
            assert out.sum(axis=1).iloc[0] == pytest.approx(100.0, abs=1e-6)

    def test_site_allocation_almandine(self, spark, almandine):
        out = _pf(spark, almandine).site_allocations(minerals.GARNET).df.toPandas()
        # Z site: Si=3 fills to capacity 3; Y: Al=2; X: Fe2=3
        assert out["Z__Si{4+}"].iloc[0] == pytest.approx(3.0, abs=1e-9)
        assert out["Y__Al{3+}"].iloc[0] == pytest.approx(2.0, abs=1e-9)
        assert out["X__Fe{2+}"].iloc[0] == pytest.approx(3.0, abs=1e-9)
        assert out["Z___unallocated"].iloc[0] == pytest.approx(0.0, abs=1e-9)
        assert out["Y___unallocated"].iloc[0] == pytest.approx(0.0, abs=1e-9)
        assert out["X___unallocated"].iloc[0] == pytest.approx(0.0, abs=1e-9)

    def test_mineral_apfu(self, spark, almandine):
        out = _pf(spark, almandine).mineral_apfu(minerals.GARNET).df.toPandas()
        assert out["Si{4+}"].iloc[0] == pytest.approx(3.0, abs=1e-9)
        assert out["Al{3+}"].iloc[0] == pytest.approx(2.0, abs=1e-9)
        assert out["Fe{2+}"].iloc[0] == pytest.approx(3.0, abs=1e-9)

    def test_check_stoichiometry_ideal(self, spark, almandine):
        out = _pf(spark, almandine).check_stoichiometry(minerals.GARNET).df.toPandas()
        # ideal composition scores 1.0 on every criterion
        for crit in [
            "analytical_total", "cation_deviation", "charge_balance",
            "fe3+_validity", "site_vacancies", "leftover_cations",
        ]:
            assert out[crit].iloc[0] == pytest.approx(1.0, abs=1e-6), crit
        for c in out.columns:
            assert 0.0 <= out[c].iloc[0] <= 1.0


class TestFeldspar:
    def test_anorthite(self, spark, anorthite):
        # reference parity: only ions present in the input produce columns
        # (``_minerals.py:404-416`` iterates allocated M-site columns)
        out = _pf(spark, anorthite).end_members(minerals.FELDSPAR).df.toPandas()
        assert out["An"].iloc[0] == pytest.approx(100.0, abs=1e-6)
        assert "Ab" not in out.columns and "Or" not in out.columns

    def test_sanidine(self, spark, sanidine):
        out = _pf(spark, sanidine).end_members(minerals.FELDSPAR).df.toPandas()
        assert out["Or"].iloc[0] == pytest.approx(100.0, abs=1e-6)

    def test_ternary_feldspar(self, spark):
        from tests.conftest import oxide_wt_from_formula

        # (Ca0.3 Na0.5 K0.2)(Al1.3 Si2.7)O8 — An=30, Ab=50, Or=20
        pdf = pd.DataFrame([
            oxide_wt_from_formula({
                "CaO": 0.3, "Na2O": 0.25, "K2O": 0.1,
                "Al2O3": 0.65, "SiO2": 2.7,
            })
        ])
        out = _pf(spark, pdf).end_members(minerals.FELDSPAR).df.toPandas()
        assert out["An"].iloc[0] == pytest.approx(30.0, abs=1e-6)
        assert out["Ab"].iloc[0] == pytest.approx(50.0, abs=1e-6)
        assert out["Or"].iloc[0] == pytest.approx(20.0, abs=1e-6)

    def test_sanidine_apfu(self, spark, sanidine):
        out = _pf(spark, sanidine).cations(n_oxygens=8).df.toPandas()
        assert out["Si{4+}"].iloc[0] == pytest.approx(3.0, abs=1e-9)
        assert out["Al{3+}"].iloc[0] == pytest.approx(1.0, abs=1e-9)
        assert out["K{+}"].iloc[0] == pytest.approx(1.0, abs=1e-9)


class TestClinopyroxene:
    def test_diopside(self, spark, diopside):
        out = _pf(spark, diopside).end_members(minerals.CLINOPYROXENE).df.toPandas()
        assert out["Di"].iloc[0] == pytest.approx(100.0, abs=1e-6)
        assert out.sum(axis=1).iloc[0] == pytest.approx(100.0, abs=1e-6)

    def test_jadeite(self, spark):
        from tests.conftest import oxide_wt_from_formula

        # NaAlSi2O6: at 6 O — Na=1, Al=1, Si=2 → Jd=100
        pdf = pd.DataFrame(
            [oxide_wt_from_formula({"Na2O": 0.5, "Al2O3": 0.5, "SiO2": 2})]
        )
        out = _pf(spark, pdf).end_members(minerals.CLINOPYROXENE).df.toPandas()
        assert out["Jd"].iloc[0] == pytest.approx(100.0, abs=1e-6)

    def test_multirow_nonnegative(self, spark, diopside):
        pdf = pd.concat([diopside] * 3, ignore_index=True)
        pdf.iloc[1] = pdf.iloc[1] * 0.99  # slightly low total
        out = _pf(spark, pdf).end_members(minerals.CLINOPYROXENE).df.toPandas()
        assert (out >= -1e-12).all().all()
        for s in out.sum(axis=1):
            assert s == pytest.approx(100.0, abs=1e-6)
