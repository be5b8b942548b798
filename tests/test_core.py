"""Driver-side chemistry unit tests (parity targets: reference
``tests/test_core.py`` semantics, re-derived not copied)."""

import pytest

from petropandas_spark import core


def test_mw_oxides():
    assert core.MW("SiO2") == pytest.approx(60.0843, abs=1e-3)
    assert core.MW("Al2O3") == pytest.approx(101.9613, abs=1e-3)
    assert core.MW("FeO") == pytest.approx(71.8444, abs=1e-3)
    assert core.MW("Fe2O3") == pytest.approx(159.6882, abs=1e-3)
    assert core.MW("H2O") == pytest.approx(18.0153, abs=1e-3)


def test_is_oxide_and_formula():
    assert core.is_oxide("SiO2")
    assert core.is_oxide("Cr2O3")
    assert not core.is_oxide("F")          # element, not oxide
    assert core.is_formula("F")
    assert core.is_formula("Cl")
    assert not core.is_formula("Sample")
    assert not core.is_formula("Mineral")
    assert not core.is_formula("Total")    # "To" not an element... ("T"+"o"? no)


def test_ion_parsing():
    assert core.parse_ion("Fe{2+}") == ("Fe", 2)
    assert core.parse_ion("Fe{3+}") == ("Fe", 3)
    assert core.parse_ion("Na{+}") == ("Na", 1)
    assert core.parse_ion("Cl{-}") == ("Cl", -1)
    assert core.parse_ion("SiO2") is None


def test_ion_names_roundtrip():
    assert core.ion_name("Fe", 2) == "Fe{2+}"
    assert core.ion_name("Na", 1) == "Na{+}"
    assert core.oxide_to_ion_col("SiO2") == "Si{4+}"
    assert core.oxide_to_ion_col("Al2O3") == "Al{3+}"
    assert core.oxide_to_ion_col("FeO") == "Fe{2+}"
    assert core.oxide_to_ion_col("Na2O") == "Na{+}"
    assert core.ion_to_oxide("Si", 4) == "SiO2"
    assert core.ion_to_oxide("Al", 3) == "Al2O3"
    assert core.ion_to_oxide("Fe", 2) == "FeO"
    assert core.ion_to_oxide("Na", 1) == "Na2O"
    assert core.ion_to_oxide("K", 1) == "K2O"


def test_cations_oxygens_per():
    assert core.cations_per("SiO2") == 1
    assert core.oxygens_per("SiO2") == 2
    assert core.cations_per("Al2O3") == 2
    assert core.oxygens_per("Al2O3") == 3
    assert core.cations_per("P2O5") == 2


def test_aliases():
    assert core.ALIASES["FeO*"] == "FeO"
    assert core.ALIASES["H2O+"] == "H2O"


def test_petro_sorted():
    cols = ["Sample", "MgO", "SiO2", "ZnO", "H2O", "Al2O3"]
    assert core.petro_sorted(cols) == [
        "SiO2", "Al2O3", "MgO", "ZnO", "H2O", "Sample"
    ]


def test_detect_col():
    assert core.detect_col(["SiO2", "FeO", "Fe2O3"], "Fe") == "FeO"
    assert core.detect_cols(["SiO2", "FeO", "Fe2O3"], "Fe") == ["FeO", "Fe2O3"]
    with pytest.raises(KeyError):
        core.detect_col(["SiO2"], "Fe")


class TestFrameValenceAPI:
    """Accessor-level V* wrappers (ref _accessors.py:295-364)."""

    def _pf(self, spark):
        import pandas as pd

        from petropandas_spark.frame import PetroFrame

        pdf = pd.DataFrame({
            "Sample": ["a", "b"],
            "SiO2": [38.5, 38.0], "Al2O3": [22.1, 21.5],
            "FeO": [28.3, 32.0], "MgO": [5.2, 3.0],
            "CaO": [3.8, 4.0], "MnO": [1.5, 1.0],
        })
        return PetroFrame.ingest(spark.createDataFrame(pdf))

    def test_feo_to_fe2o3_roundtrip_via_reduce(self, spark):
        pf = self._pf(spark)
        up = pf.feo_to_fe2o3()
        assert "Fe2O3" in up.df.columns and "FeO" not in up.df.columns
        back = up.reduce()
        a = pf.df.toPandas().sort_values("Sample")["FeO"].tolist()
        b = back.df.toPandas().sort_values("Sample")["FeO"].tolist()
        assert all(abs(x - y) < 1e-9 for x, y in zip(a, b))

    def test_oxidize_requires_moles(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            self._pf(spark).oxidize(2.0)
        out = self._pf(spark).to_moles().oxidize(2.0)
        assert "Fe2O3" in out.df.columns

    def test_split_valence_droop(self, spark):
        pf = self._pf(spark).cations(n_oxygens=12)
        out = pf.split_valence("Fe", "droop", n_oxygens=12, ideal_cations=8)
        cols = out.df.columns
        assert "Fe{2+}" in cols and "Fe{3+}" in cols
        with pytest.raises(ValueError):
            self._pf(spark).split_valence()  # wt% units -> error
