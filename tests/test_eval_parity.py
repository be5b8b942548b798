"""Parity fuzz for the pandas-eval-dialect expression rewriter (P10/G1,
``plotting.rewrite_eval_expr``) against the REFERENCE implementation
(``/root/reference/src/petropandas/_plotting.py:210-250`` ``BasePlot._eval``,
imported read-only through ``tools/refshim``).

The reference evaluates expressions with ``DataFrame.eval`` (python
engine here — no numexpr in the container); the engine rewrites the same
text to a Spark SQL expression.  For arithmetic (+ - * / and parens) both
run the identical IEEE-754 op sequence over float64, so equality is
bit-for-bit (repr).  numpy vs java.lang.Math transcendental rounding is
not pinned, so function cases compare at 1e-15 relative.

Backtick corner cases pinned explicitly: backticked exotic names (space,
%, +), a column literally named ``log`` (backticked → column, bare →
natural-log function), whole-name matching for names the tokenizer can't
parse (``Al{3+}``), cross-group zero-fill of missing names, and the
single-missing-name raise.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (f"{REPO}/tools/refshim", "/root/reference/src"):
    if p not in sys.path:
        sys.path.append(p)

ref_plotting = pytest.importorskip("petropandas._plotting")
REF_EVAL = ref_plotting.BasePlot._eval

from petropandas_spark.plotting import eval_expr, rewrite_eval_expr  # noqa: E402

BASE = pd.DataFrame({
    "id": [0, 1, 2, 3, 4],
    "Prp": [12.7, 0.0, 99.9, 1e-8, 45.3],
    "Alm": [75.2, 1e3, 0.0, 21.7, 0.05],
    "Sps": [7.6, 0.1, 31.0, 0.0, 12.1],
    "H2O wt%": [1.2, 0.0, 3.4, 0.8, 2.2],
    "Fe+Mg": [5.5, 2.0, 1.0, 0.25, 8.0],
    "log": [2.0, 4.0, 8.0, 16.0, 32.0],  # column shadowing a function name
})


@pytest.fixture(scope="module")
def sdf(spark):
    clean = BASE.rename(columns=str)  # pandas→Spark keeps exotic names
    return spark.createDataFrame(clean)


def both(spark_df, expr):
    """(reference Series, engine Series) for the same expression text."""
    got = (
        spark_df.select("id", eval_expr(spark_df, expr).alias("v"))
        .toPandas().sort_values("id")["v"].reset_index(drop=True)
    )
    want = REF_EVAL(expr, BASE).reset_index(drop=True).astype("float64")
    return want, got


# -- randomized arithmetic over backticked + plain names (bitwise) ----------

TERMS = ["Prp", "Alm", "Sps", "`H2O wt%`", "`Fe+Mg`", "`log`"]


@st.composite
def arith_sub(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        choice = draw(st.integers(0, len(TERMS)))
        if choice == len(TERMS):
            return repr(draw(st.floats(min_value=-100, max_value=100,
                                       allow_nan=False)))
        return TERMS[choice]
    left = draw(arith_sub(depth=depth + 1))
    right = draw(arith_sub(depth=depth + 1))
    op = draw(st.sampled_from(["+", "-", "*", "/"]))
    return f"({left} {op} {right})"


@st.composite
def arith_expr(draw):
    # top level always references a column: the reference raises
    # TypeError for constant-only expressions (not a Series) by design
    col = draw(st.sampled_from(TERMS))
    op = draw(st.sampled_from(["+", "-", "*", "/"]))
    return f"({col} {op} {draw(arith_sub(depth=1))})"


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(expr=arith_expr())
def test_arithmetic_bitwise_parity(sdf, expr):
    want, got = both(sdf, expr)
    assert [repr(a) for a in want] == [repr(b) for b in got], expr


# -- backtick / tokenizer corner cases (pinned) -----------------------------

def test_whole_name_match_beats_tokenizer(sdf, spark):
    """A name the tokenizer can't parse (braces, ion notation) still
    resolves via the whole-name fast path — mirrors the reference's
    ``stripped in data.columns`` branch."""
    exotic = BASE.assign(**{"Al{3+}": [1.0, 2.0, 3.0, 4.0, 5.0]})
    sdf2 = spark.createDataFrame(exotic)
    got = (sdf2.select("id", eval_expr(sdf2, "Al{3+}").alias("v"))
           .toPandas().sort_values("id")["v"].tolist())
    want = REF_EVAL("Al{3+}", exotic).tolist()
    assert got == want == [1.0, 2.0, 3.0, 4.0, 5.0]


def test_backticked_function_name_is_a_column(sdf):
    """`log` (backticked) reads the column in both dialects.  Calling the
    bare function while a column shadows its name is where they part:
    pandas eval resolves the NAME first and tries to call the Series
    (TypeError); the engine keeps function position = function (ln).
    Documented divergence — the engine's rule is the usable one."""
    want, got = both(sdf, "`log` + 1.0")
    assert [repr(a) for a in want] == [repr(b) for b in got]
    import math

    got_fn = (sdf.select("id", eval_expr(sdf, "log(`log`)").alias("v"))
              .toPandas().sort_values("id")["v"].tolist())
    assert got_fn == pytest.approx(
        [math.log(v) for v in BASE["log"]], rel=1e-15)
    with pytest.raises(TypeError):  # pandas: Series is not callable
        REF_EVAL("log(`log`)", BASE)


def test_missing_name_zero_fill_matches_reference(sdf):
    """Cross-group default: names absent from the frame become 0.0 inside
    a multi-term expression (the reference's documented Sps+Grs case)."""
    for expr in ("Sps + Grs", "`H2O wt%` + `No Such Column`",
                 "(Prp + Grs) / (Alm - Grs)"):
        want, got = both(sdf, expr)
        assert [repr(a) for a in want] == [repr(b) for b in got], expr


def test_single_missing_name_raises_both(sdf):
    with pytest.raises(Exception):
        REF_EVAL("Grs", BASE)
    with pytest.raises(KeyError):
        rewrite_eval_expr("Grs", list(BASE.columns))
    with pytest.raises(KeyError):
        rewrite_eval_expr("`No Such Column`", list(BASE.columns))


def test_function_spellings_match_reference(sdf):
    """numpy→Spark SQL function-name mapping (log→ln, arcsin→asin,
    arctan2→atan2 …) agrees with the reference at 1e-15 relative
    (transcendental rounding is libm-vs-Java, not pinned bitwise)."""
    cases = [
        "sqrt(abs(Alm - Prp))",
        "log10(Alm + 1.0)",
        "log1p(Sps)",
        "exp(Prp / 100.0)",
        "arctan2(Prp, Alm + 1.0)",
        # no tan(): pandas's python-engine MATHOPS list omits it (its own
        # quirk — the engine supports tan, the reference oracle can't)
        "sin(Sps) + cos(Sps)",
        "arcsin(Prp / 100.0) + arccos(Prp / 100.0) + arctan(Alm)",
        "sinh(Prp / 50.0) + cosh(Sps / 40.0) + tanh(Alm / 1000.0)",
    ]
    for expr in cases:
        want, got = both(sdf, expr)
        assert got.tolist() == pytest.approx(want.tolist(), rel=1e-15), expr


def test_where_and_boolean_ops(sdf):
    """``where(cond, a, b)`` with ``&``/``|``/comparison conditions — the
    conditional-axis idiom.  The reference's python-engine eval cannot
    run ``where`` (pandas MATHOPS needs numexpr for it), so the oracle
    here is the hand-computed expectation; ``&``/``|``/``~`` themselves
    are compared against the reference."""
    got = (sdf.select("id", eval_expr(
        sdf, "where((Prp > 10.0) & (Alm < 100.0), Prp, 0.0 - 1.0)")
        .alias("v")).toPandas().sort_values("id")["v"].tolist())
    want = [p if (p > 10.0 and a < 100.0) else -1.0
            for p, a in zip(BASE["Prp"], BASE["Alm"])]
    assert got == want
    # & | ~ compare bit-for-bit against pandas eval (python engine
    # rewrites and/or to & | itself; ~ is elementwise logical NOT)
    for expr in ("(Prp > 10.0) & (Sps < 8.0)", "(Prp > 50.0) | (Sps > 8.0)",
                 "~(Prp > 10.0)", "~((Prp > 10.0) & (Sps < 8.0))"):
        ref = REF_EVAL(expr, BASE).tolist()
        eng = (sdf.select("id", eval_expr(sdf, expr).alias("v"))
               .toPandas().sort_values("id")["v"].tolist())
        assert eng == ref, expr
    # ^ is rejected by pandas eval (no visit_BitXor) — rejected here too
    with pytest.raises((ValueError, AttributeError)):
        REF_EVAL("(Prp > 1.0) ^ (Sps > 1.0)", BASE)
    with pytest.raises(ValueError, match="pandas-eval dialect"):
        rewrite_eval_expr("(Prp > 1.0) ^ (Sps > 1.0)", list(BASE.columns))


def test_floor_division_ieee_parity(sdf):
    """// follows numpy floor_divide (NOT naive floor(a/b) — see
    _ieee_floordiv's npy_divmod description), in float64 with IEEE
    edges preserved: x//0 → ±inf, 0//0 → nan — Spark's BIGINT floor()
    would collapse these to Long.MAX/0."""
    for expr in ("Prp // 2.0", "(0.0 - Prp) // 2.0", "Prp // Grs",
                 "Alm // (Sps - Sps)"):
        want, got = both(sdf, expr)
        assert [repr(a) for a in want] == [repr(b) for b in got], expr


def test_nan_comparison_semantics(sdf):
    """numpy: every comparison with NaN is False except != (True).
    Spark natively orders NaN above everything and NaN = NaN — now that
    IEEE division can produce NaN, the rewriter must guard each
    comparison link (found by the offline 400-example fuzz)."""
    # Prp/Grs is NaN on the Prp == 0.0 row (0/0 with Grs zero-filled)
    for expr in ("(Prp / Grs) > 0.1", "(Prp / Grs) <= 1e6",
                 "(Prp / Grs) == (Prp / Grs)", "(Prp / Grs) != 5.0"):
        want, got = both(sdf, expr)
        assert want.tolist() == got.tolist(), expr


def test_string_comparison_survives_nan_guard(spark):
    """The NaN guard uses TRY_CAST: a plain CAST throws under ANSI for
    the dialect's string comparisons (review regression — worked before
    the guard, must keep working after)."""
    pdf = BASE.assign(Sample=["grt", "cpx", "grt", "amp", "grt"])
    sdf2 = spark.createDataFrame(pdf)
    got = (sdf2.select("id", eval_expr(sdf2, "Sample == 'grt'").alias("v"))
           .toPandas().sort_values("id")["v"].tolist())
    want = REF_EVAL("Sample == 'grt'", pdf).tolist()
    assert got == want == [True, False, True, False, True]


def test_string_nan_text_not_misrouted_by_guard(spark):
    """A STRING operand whose text casts to NaN ('NaN'/'nan') must take
    plain string equality — pandas compares strings, never floats.  The
    guard is typeof-gated to float operands (round-4 advice: the
    TRY_CAST-only guard returned False for ``Sample == 'NaN'`` on rows
    literally holding 'NaN')."""
    pdf = BASE.assign(Sample=["grt", "NaN", "cpx", "NaN", "nan"])
    sdf2 = spark.createDataFrame(pdf)

    def run(expr):
        got = (sdf2.select("id", eval_expr(sdf2, expr).alias("v"))
               .toPandas().sort_values("id")["v"].tolist())
        want = REF_EVAL(expr, pdf).tolist()
        return got, want

    got, want = run("Sample == 'NaN'")
    assert got == want == [False, True, False, True, False]
    got, want = run("Sample != 'NaN'")
    assert got == want == [True, False, True, False, True]
    got, want = run("Sample == 'nan'")
    assert got == want == [False, False, False, False, True]
    # float-typed operands still take numpy NaN semantics through the
    # typeof gate — engine-produced NaN (0/0 via the zero-filled Grs on
    # the Prp == 0.0 row; ingested NaN would arrive as NULL instead)
    for expr in ("(Prp / Grs) == (Prp / Grs)", "(Prp / Grs) != 5.0",
                 "(Prp / Grs) > 0.1"):
        got, want = run(expr)
        assert got == want, expr


def test_floordiv_huge_quotient_no_bigint_saturation(sdf):
    """|quotient| ≥ 2^63 must not clamp to Long.MAX through Spark's
    FLOOR(double)→BIGINT: (Alm / Prp) // Prp reaches ~1e19 on the
    Alm=1e3, Prp=1e-8 row (review finding, confirmed vs numpy)."""
    want, got = both(sdf, "(Alm / Prp) // Prp")
    assert [repr(a) for a in want] == [repr(b) for b in got]
    assert max(got) >= 9.3e18  # past Long.MAX, not clamped


def test_nested_floordiv_no_plan_blowup(sdf):
    """Operand text is bound once via the transform(named_struct) form
    past the size threshold — a depth-3 // nest previously exploded the
    Catalyst tree to a driver OOM."""
    want, got = both(sdf, "((Prp // 2.0) // (Alm // 3.0)) // (Sps + 1.0)")
    assert [repr(a) for a in want] == [repr(b) for b in got]


def test_rewrite_text_backtick_forms():
    cols = ["Prp", "H2O wt%", "log"]
    # backticks survive; reserved bare names become functions
    assert rewrite_eval_expr("`H2O wt%` * 2", cols) == "(`H2O wt%` * 2)"
    assert rewrite_eval_expr("log(Prp)", cols) == "ln(`Prp`)"
    assert rewrite_eval_expr("`log` + log(Prp)", cols) == \
        "(`log` + ln(`Prp`))"
    # missing backticked name inside a multi-term expression → (0.0)
    assert rewrite_eval_expr("`Gone Col` + Prp", cols) == "((0.0) + `Prp`)"
    # single names normalize to backticked references
    assert rewrite_eval_expr("  Prp  ", cols) == "`Prp`"
    assert rewrite_eval_expr("`H2O wt%`", cols) == "`H2O wt%`"
    # ** has no Spark SQL spelling — the AST pass emits power()
    assert rewrite_eval_expr("Prp ** 2", cols) == "power(`Prp`, 2)"
    # chained comparison expands to the AND of its NaN-guarded links
    chained = rewrite_eval_expr("0 < Prp < 100", cols)
    assert chained.count("AND") >= 1 and chained.count("`Prp`") >= 2
    assert "isnan" in chained  # numpy NaN-comparison semantics guard


def test_division_ieee_semantics(sdf, spark):
    """x/0 → ±inf and 0/0 → NaN, matching the reference's pandas eval
    (Spark's native division throws under ANSI / yields NULL otherwise).
    Reachable through the documented zero-fill: Prp / Grs across groups
    lacking Grs."""
    import math

    want, got = both(sdf, "Prp / Grs")  # Grs missing → 0.0 denominator
    assert [repr(a) for a in want] == [repr(b) for b in got]
    assert math.isinf(got.iloc[0]) and got.iloc[0] > 0
    # 0/0 → NaN (row where Prp == 0.0)
    assert math.isnan(got.iloc[1]) and math.isnan(want.iloc[1])
    # negative numerator → -inf
    want2, got2 = both(sdf, "(0.0 - Prp) / Grs")
    assert [repr(a) for a in want2] == [repr(b) for b in got2]
    assert got2.iloc[0] == float("-inf")
    # NEGATIVE zero denominator flips the infinity sign (IEEE):
    # (Sps - Sps) * -1.0 is -0.0; found by the 300-example offline fuzz
    want3, got3 = both(sdf, "Prp / ((Sps - Sps) * (0.0 - 1.0))")
    assert [repr(a) for a in want3] == [repr(b) for b in got3]
    assert got3.iloc[0] == float("-inf")  # +Prp / -0.0
