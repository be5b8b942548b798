"""IO layer: clean-on-read ingest, profile windows, A7 auto-split, U11."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from petropandas_spark import core, io


def test_read_analyses_csv_clean_on_read(spark, tmp_path):
    pdf = pd.DataFrame({
        " SiO2 ": [50.0, -1.0], "FeO*": [10.0, None], "Sample": ["a", "b"],
    })
    p = str(tmp_path / "t.csv")
    pdf.to_csv(p, index=False)
    pf = io.read_analyses(spark, p)
    out = pf.df.toPandas().sort_values("SiO2", na_position="first")
    # P1: whitespace stripped, alias applied, NaN/negative -> 0
    assert list(pf.df.columns) == ["SiO2", "FeO", "Sample"]
    assert sorted(out["SiO2"]) == [0.0, 50.0]
    assert sorted(out["FeO"]) == [0.0, 10.0]


def test_profile_windows(spark):
    pdf = pd.DataFrame({"pos": [3, 1, 2], "MgO": [30.0, 10.0, 20.0]})
    df = io.with_position(spark.createDataFrame(pdf), "pos")
    out = io.profile_neighborhood(df, ["MgO"]).orderBy("position").toPandas()
    assert list(out["MgO"]) == [10.0, 20.0, 30.0]
    assert out["MgO__prev"].tolist()[1:] == [10.0, 20.0]
    assert out["MgO__roll3"].iloc[1] == pytest.approx(20.0)


def test_auto_split(spark):
    # sorted means [0.55, 1.05, 21, 51]: the minimum summed within-group
    # variance split isolates SiO2 (var {.55,1.05,21}+{51} ≈ 91 beats
    # {.55,1.05}+{21,51} ≈ 225) — secondary axis = the non-SiO2 side
    pdf = pd.DataFrame({
        "SiO2": [50.0, 52.0], "Al2O3": [20.0, 22.0],
        "MnO": [0.5, 0.6], "CaO": [1.0, 1.1],
    })
    groups = [spark.createDataFrame(pdf)]
    secondary = io.auto_split(groups, ["SiO2", "Al2O3", "MnO", "CaO"])
    assert secondary == {"Al2O3", "MnO", "CaO"}

    # clean two-scale case: trace elements split off the majors
    pdf2 = pd.DataFrame({
        "SiO2": [50.0], "Al2O3": [48.0], "MnO": [0.5], "CaO": [1.0],
    })
    secondary2 = io.auto_split(
        [spark.createDataFrame(pdf2)], ["SiO2", "Al2O3", "MnO", "CaO"]
    )
    assert secondary2 == {"MnO", "CaO"}


def test_series_helpers(spark):
    pdf = pd.DataFrame({"SiO2": [60.0843]})  # exactly 1 mole
    df = spark.createDataFrame(pdf)
    out = df.select(io.col_to_mole("SiO2").alias("m")).collect()
    assert out[0]["m"] == pytest.approx(1.0, abs=1e-9)
    total_oxy = io.col_to_mole("SiO2") * F.lit(float(core.oxygens_per("SiO2")))
    cat = df.select(
        io.col_to_cation("SiO2", 6.0, total_oxy).alias("c")
    ).collect()
    # one SiO2: 6 oxygens basis on 2 oxygen moles -> Si = 1 * 1 * (6/2) = 3
    assert cat[0]["c"] == pytest.approx(3.0, abs=1e-9)


def test_bucketed_write_enables_shuffle_free_join(spark, tmp_path):
    import pandas as pd

    pdf = pd.DataFrame({"k": range(100), "v": range(100)})
    df = spark.createDataFrame(pdf)
    io.write_bucketed(df, "t_bucketed_a", ["k"], n_buckets=4)
    io.write_bucketed(df, "t_bucketed_b", ["k"], n_buckets=4)
    a = spark.table("t_bucketed_a")
    b = spark.table("t_bucketed_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucket join: no exchange on either side
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 100
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_b")


def test_named_datasets_load_with_reference_row_counts(spark):
    """S7: every reference-bundled dataset loads by name with the
    reference's row count (ref data/__init__.py:1-33)."""
    from petropandas_spark import datasets

    for name in datasets.NAMES:
        df = datasets.load(spark, name)
        assert df.count() == datasets.ROWS[name], name
    # unknown names are a loud KeyError, not a blank read
    import pytest as _pytest

    with _pytest.raises(KeyError):
        datasets.load(spark, "nope")


def test_named_dataset_petro_ingest_runs_pipeline(spark):
    """grt_profile ingests as a PetroFrame and runs the garnet end-member
    pipeline end-to-end (the reference walkthrough workflow)."""
    from petropandas_spark import datasets, minerals

    pf = datasets.load_petro(spark, "grt_profile")
    em = pf.end_members(minerals.GARNET).df.toPandas()
    assert len(em) == 99
    # real profile analyses carry minor components (Y2O3, ZnO, Cr2O3…)
    # outside the four-member model, so sums land just under 100
    s = em[["Prp", "Alm", "Sps", "Grs"]].sum(axis=1)
    assert ((s > 90.0) & (s <= 100.0 + 1e-9)).all()
    assert em[["Prp", "Alm", "Sps", "Grs"]].notna().all().all()
