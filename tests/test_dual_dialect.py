"""The engine's load-bearing property: a ``sqlgen.Plan`` evaluates to
*identical* results in Spark (``selectExpr`` chain) and DuckDB (nested
sub-selects) — this is what makes the driver's duckdb-oracle correctness
gate pass by construction."""

import duckdb
import pandas as pd
import pytest

from petropandas_spark import minerals
from petropandas_spark.frame import clean_plan
from petropandas_spark.sqlgen import Plan


def run_both(spark, pdf: pd.DataFrame, plan: Plan) -> tuple[pd.DataFrame, pd.DataFrame]:
    sdf = plan.apply(spark.createDataFrame(pdf)).toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    ddf = con.execute(plan.to_sql("SELECT * FROM t")).df()
    con.close()
    return sdf, ddf


def assert_identical(sdf: pd.DataFrame, ddf: pd.DataFrame):
    assert list(sdf.columns) == list(ddf.columns)
    for c in sdf.columns:
        s, d = sdf[c], ddf[c]
        if s.dtype.kind == "f":
            # bitwise-identical IEEE-754 doubles, not approx
            assert (s.values == d.values).all(), c
        else:
            assert (s.values == d.values).all(), c


@pytest.fixture
def garnet_pdf(almandine, pyrope_grossular):
    pdf = pd.concat([almandine, pyrope_grossular], ignore_index=True).fillna(0.0)
    pdf["id"] = [1, 2]
    return pdf


def test_clean_identical(spark):
    pdf = pd.DataFrame([{"SiO2": -1.0, "MgO": 3.0, "Sample": "x"}])
    plan, _f, _out = clean_plan(list(pdf.columns))
    assert_identical(*run_both(spark, pdf, plan))


def test_apfu_identical(spark, garnet_pdf):
    from petropandas_spark.functions.conversions import add_to_apfu

    plan = Plan()
    add_to_apfu(plan, [c for c in garnet_pdf.columns if c != "id"],
                n_oxygens=12, carry=["id"])
    assert_identical(*run_both(spark, garnet_pdf, plan))


def test_end_members_identical(spark, garnet_pdf):
    plan = Plan()
    minerals.add_garnet_end_members(
        plan, [c for c in garnet_pdf.columns if c != "id"], carry=["id"]
    )
    assert_identical(*run_both(spark, garnet_pdf, plan))


def test_check_stoichiometry_identical(spark, garnet_pdf):
    plan = Plan()
    minerals.add_check_stoichiometry(
        plan, [c for c in garnet_pdf.columns if c != "id"],
        minerals.GARNET, carry=["id"],
    )
    assert_identical(*run_both(spark, garnet_pdf, plan))
