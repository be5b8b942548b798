"""Cross-engine fuzz of the dual-dialect Plan machinery.

Random multi-stage plans built from the real sqlgen combinators run on
the SAME data through BOTH engines — Spark via ``Plan.apply`` and DuckDB
via ``Plan.to_sql`` — and every double must match bit-for-bit (repr
equality, no tolerance).  This is the engine's core correctness claim
("both dialects evaluate the identical IEEE-754 expression tree")
exercised over a far larger expression space than the hand-written
queries cover.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from petropandas_spark.sqlgen import (
    DUCKDB,
    Plan,
    add_chain,
    clip,
    flit,
    safe_denom,
    trapezoid,
    where_positive,
)

COLS = ["SiO2", "Al2O3", "FeO", "MgO"]

BASE = pd.DataFrame({
    "id": [0, 1, 2, 3, 4, 5],
    "SiO2": [38.5, 0.0, 61.2, 1e-8, 99.9, 47.3],
    "Al2O3": [22.1, 15.0, 0.0, 21.7, 3.3e2, 0.05],
    "FeO": [28.3, 1e6, 31.0, 0.0, 7.7, 12.1],
    "MgO": [5.2, 0.1, 0.0, 8.8, 2.5, 1e-3],
})


@pytest.fixture(scope="module")
def engines(spark):
    sdf = spark.createDataFrame(BASE)
    con = duckdb.connect()
    con.register("base_t", BASE)
    return sdf, con


# -- expression strategy: compositions of the real combinators --------------

lit = st.floats(min_value=-1e3, max_value=1e3, allow_nan=False).map(flit)
col = st.sampled_from(COLS)


def col_expr(c):
    return lambda q, c=c: q(c)


@st.composite
def expr(draw, depth=2):
    """quote -> sql-string builders over the combinator grammar."""
    if depth == 0:
        if draw(st.booleans()):
            c = draw(col)
            return col_expr(c)
        v = draw(lit)
        return lambda q, v=v: v

    kind = draw(st.sampled_from(
        ["add_chain", "clip", "safe_denom", "where_positive",
         "trapezoid", "mul", "div"]
    ))
    if kind == "add_chain":
        terms = draw(st.lists(expr(depth=depth - 1), min_size=1, max_size=3))
        return lambda q, t=terms: add_chain([e(q) for e in t])
    if kind == "clip":
        e = draw(expr(depth=depth - 1))
        lo = draw(st.floats(min_value=-100, max_value=0, allow_nan=False))
        hi = draw(st.floats(min_value=0.001, max_value=100, allow_nan=False))
        return lambda q, e=e, lo=lo, hi=hi: clip(e(q), lo, hi)
    if kind == "safe_denom":
        e = draw(expr(depth=depth - 1))
        return lambda q, e=e: safe_denom(e(q))
    if kind == "where_positive":
        v = draw(expr(depth=depth - 1))
        c = draw(col)
        o = draw(st.floats(min_value=-10, max_value=10, allow_nan=False))
        return lambda q, v=v, c=c, o=o: where_positive(v(q), q(c), o)
    if kind == "trapezoid":
        e = draw(expr(depth=depth - 1))
        lo = draw(st.floats(min_value=0, max_value=10, allow_nan=False))
        width = draw(st.floats(min_value=0.1, max_value=50, allow_nan=False))
        return lambda q, e=e, lo=lo, hi=lo + width: trapezoid(e(q), lo, hi)
    if kind == "mul":
        a = draw(expr(depth=depth - 1))
        b = draw(lit)
        return lambda q, a=a, b=b: f"({a(q)} * {b})"
    # div — denominator guarded the way every domain operator guards it
    a = draw(expr(depth=depth - 1))
    b = draw(expr(depth=depth - 1))
    return lambda q, a=a, b=b: f"({a(q)} / {safe_denom(b(q))})"


@st.composite
def plans(draw):
    """1-3 stage plans; later stages reference earlier stage aliases."""
    plan = Plan()
    n_stages = draw(st.integers(min_value=1, max_value=3))
    prev_cols = list(COLS)
    for _ in range(n_stages):
        stage = draw(
            st.lists(expr(), min_size=1, max_size=4).map(tuple)
        )
        s = plan.stage()
        s.add("id", lambda q: q("id"))
        out_cols = []
        for j, e in enumerate(stage):
            # reference columns that exist at this depth: the grammar
            # only names COLS, so pass them through every stage
            out_cols.append(f"x{j}")
            s.add(f"x{j}", e)
        s.passthrough(prev_cols)
    return plan


@given(plans())
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_plans_agree_across_engines(engines, plan):
    sdf, con = engines
    spark_rows = {
        r["id"]: [repr(r[c]) for c in sorted(r.asDict()) if c != "id"]
        for r in plan.apply(sdf).collect()
    }
    sql = plan.to_sql("SELECT * FROM base_t", DUCKDB)
    duck = con.sql(sql).df()
    duck_rows = {
        int(row["id"]): [
            repr(float(row[c])) for c in sorted(duck.columns) if c != "id"
        ]
        for _, row in duck.iterrows()
    }
    assert spark_rows == duck_rows
