"""Unit-conversion operators U1-U11 (SURVEY.md §2.3) as expression stages.

Every operator is embarrassingly parallel column arithmetic: molecular
weights / cation counts / oxygen counts are functions of the column NAME,
computed once on the driver (``core.py``) and folded into DOUBLE literals.
No shuffle, no UDF — one narrow projection per operator, collapsed by
Catalyst's ``CollapseProject`` when chained.

Reference semantics: ``/root/reference/src/petropandas/_calc.py:44-443``.
"""

from __future__ import annotations

from petropandas_spark import core
from petropandas_spark.sqlgen import (Ctx, Plan, add_chain, clip, flit,
                                      ieee_div, safe_denom)


def moles_expr(col: str, units: str = "wt%"):
    """moles of formula unit from a wt% (or moles) column — U1 kernel."""
    mw = flit(core.MW(col))
    if units == "moles":
        return lambda q: q(col)
    return lambda q: f"({q(col)} / {mw})"


def add_to_moles(plan: Plan, cols: list[str], carry: list[str] = ()) -> list[str]:
    """U1 ``to_moles``: each formula column ÷ MW (ref ``_calc.py:57-68``)."""
    fcols = core.formula_cols(cols)
    st = plan.stage()
    st.passthrough(list(carry))
    for c in fcols:
        st.add(c, moles_expr(c))
    return fcols


def add_to_oxides(plan: Plan, cols: list[str], carry: list[str] = ()) -> list[str]:
    """U2 ``to_oxides``: moles × MW (ref ``_calc.py:71-82``)."""
    fcols = core.formula_cols(cols)
    st = plan.stage()
    st.passthrough(list(carry))
    for c in fcols:
        mw = flit(core.MW(c))
        st.add(c, lambda q, c=c, mw=mw: f"({q(c)} * {mw})")
    return fcols


def _moles_terms(q, cols: list[str], units: str, per: dict[str, float]) -> list[str]:
    """Textual ``moles(col) * per[col]`` terms in column order."""
    out = []
    for c in cols:
        m = q(c) if units == "moles" else f"{q(c)} / {flit(core.MW(c))}"
        out.append(f"({m}) * {flit(per[c])}")
    return out


def add_to_apfu(
    plan: Plan,
    cols: list[str],
    *,
    n_oxygens: float | None = None,
    n_cations: float | None = None,
    units: str = "wt%",
    carry: list[str] = (),
) -> list[str]:
    """U5/U6 ``to_apfu``: oxides → atoms per formula unit, ion-named columns.

    Oxygen basis: ``factor = n_oxygens / Σ(moles·oxygens_per)``; cation
    basis: ``factor = n_cations / Σ(moles·cations_per)``.  Non-oxide
    formula columns (F, Cl, S) pass through as molar proportions.
    Reference: ``_calc.py:252-310``.
    """
    if (n_oxygens is None) == (n_cations is None):
        raise ValueError("Specify exactly one of n_oxygens or n_cations")
    ox = core.oxide_cols(cols)
    elem = [c for c in core.formula_cols(cols) if c not in ox]

    out_cols: list[str] = []
    factor_col = None
    if ox:
        cat_per = {c: float(core.cations_per(c)) for c in ox}
        if n_oxygens is not None:
            oxy_per = {c: float(core.oxygens_per(c)) for c in ox}
            ref_n, per = float(n_oxygens), oxy_per
        else:
            ref_n, per = float(n_cations), cat_per

        # The normalisation factor is bound ONCE as a named stage column
        # (the reference computes it once as a Series, _calc.py:296-299;
        # pandas semantics preserved by ieee_div: an all-zero row has
        # Σmoles = 0 → factor = +inf → apfu = 0·inf = NaN in pandas and
        # Spark alike, where a plain / would abort the job under ANSI
        # mode).  Inlining it textually per output column made the stage
        # O(N²) in SQL text (ieee_div repeats the N-term denominator ×3)
        # — and because each apfu column is referenced exactly once by
        # the first downstream consumer stage, CollapseProject merged the
        # exploded tree into the consumer, blowing past codegen limits
        # (measured 5× wall on the amphibole chain).  As a column the
        # factor is referenced N times, so the projection boundary holds.
        factor_col = f"__apfu_f_{len(plan.stages)}"
        ctx = Ctx(plan, list(carry) + [c for c in cols if c not in set(carry)])
        ctx.let([(factor_col, lambda q: ieee_div(
            flit(ref_n), add_chain(_moles_terms(q, ox, units, per))))])

    st = plan.stage()
    st.passthrough(list(carry))
    if ox:
        for c in ox:
            ion = core.oxide_to_ion_col(c)
            mw = flit(core.MW(c))
            m = (lambda q, c=c: q(c)) if units == "moles" else (
                lambda q, c=c, mw=mw: f"{q(c)} / {mw}"
            )
            st.add(
                ion,
                lambda q, m=m, cp=flit(cat_per[c]), f=factor_col: (
                    f"(({m(q)}) * {cp}) * ({q(f)})"
                ),
            )
            out_cols.append(ion)
    for c in elem:
        st.add(c, moles_expr(c, units))
        out_cols.append(c)
    return out_cols


def add_to_apfu_by_charge(
    plan: Plan,
    cols: list[str],
    *,
    target_charges: float,
    units: str = "wt%",
    carry: list[str] = (),
) -> list[str]:
    """U7: normalise cation moles to a target positive charge; columns stay
    oxide-named (ref ``_calc.py:313-345``)."""
    ox = core.oxide_cols(cols)
    charge_per = {
        c: float(core.cations_per(c) * core.element_charge(core.element_of(c)))
        for c in ox
    }
    cat_per = {c: float(core.cations_per(c)) for c in ox}

    # factor bound once as a named column — see add_to_apfu for the
    # rationale (same reference semantics, _calc.py:342: unguarded pandas
    # factor; ieee_div keeps the NaN flow without the ANSI abort, and the
    # named binding keeps the stage O(N) in SQL text).
    factor_col = f"__apfuq_f_{len(plan.stages)}"
    ctx = Ctx(plan, list(carry) + [c for c in cols if c not in set(carry)])
    ctx.let([(factor_col, lambda q: ieee_div(
        flit(float(target_charges)),
        add_chain(_moles_terms(q, ox, units, charge_per))))])

    st = plan.stage()
    st.passthrough(list(carry))
    for c in ox:
        mw = flit(core.MW(c))
        m = (lambda q, c=c: q(c)) if units == "moles" else (
            lambda q, c=c, mw=mw: f"{q(c)} / {mw}"
        )
        st.add(
            c,
            lambda q, m=m, cp=flit(cat_per[c]), f=factor_col: (
                f"(({m(q)}) * {cp}) * ({q(f)})"
            ),
        )
    return list(ox)


def add_from_apfu(
    plan: Plan,
    cols: list[str],
    *,
    n_oxygens: float | None = None,
    n_cations: float | None = None,
    total: float | str | None = None,
    carry: list[str] = (),
) -> list[str]:
    """U8 ``from_apfu``: ion columns → oxide wt% (ref ``_calc.py:348-429``).

    ``total`` rescales each row's oxide sum to the given value; a string is
    treated as a per-row column name (the reference's ``petro_total``).
    """
    if (n_oxygens is None) == (n_cations is None):
        raise ValueError("Specify exactly one of n_oxygens or n_cations")
    ions = [(c, core.parse_ion(c)) for c in cols]
    ions = [(c, p) for c, p in ions if p is not None]
    if not ions:
        return []

    info = []  # (ion_col, oxide, cat_per, oxy_per, mw)
    for c, (el, charge) in ions:
        oxide = core.ion_to_oxide(el, charge)
        cat_per = 1.0 if charge % 2 == 0 else 2.0
        oxy_per = float(charge // 2) if charge % 2 == 0 else float(charge)
        info.append((c, oxide, cat_per, oxy_per, core.MW(oxide)))

    ref_n = float(n_oxygens if n_oxygens is not None else n_cations)
    use_oxy = n_oxygens is not None

    # stage 1: proportional moles per oxide + normalisation denominator
    st1 = plan.stage()
    st1.passthrough(list(carry))
    for c, oxide, cat_per, oxy_per, _mw in info:
        st1.add(
            "__pm_" + oxide,
            lambda q, c=c, cp=flit(cat_per): f"({q(c)} / {cp})",
        )

    def den(q):
        terms = [
            f"({q('__pm_' + oxide)}) * {flit(oxy_per if use_oxy else cat_per)}"
            for _c, oxide, cat_per, oxy_per, _mw in info
        ]
        return add_chain(terms)

    if isinstance(total, str):
        st1.add("__total", lambda q, t=total: q(t))

    # stage 2: oxide wt = prop_moles * (ref / safe(den)) * MW
    st2 = plan.stage()
    st2.passthrough(list(carry))
    out = []
    for _c, oxide, _cp, _op, mw in info:
        st2.add(
            oxide,
            lambda q, oxide=oxide, mw=flit(mw), rn=flit(ref_n): (
                f"({q('__pm_' + oxide)}) * ({rn} / {safe_denom(den(q))}) * {mw}"
            ),
        )
        out.append(oxide)
    if isinstance(total, str):
        st2.add("__total", lambda q: q("__total"))

    if total is not None:
        # stage 3: rescale rows so oxide sums equal `total`
        st3 = plan.stage()
        st3.passthrough(list(carry))

        def rowsum(q):
            return add_chain([q(o) for o in out])

        tot_expr = (lambda q: q("__total")) if isinstance(total, str) else (
            lambda q, t=flit(float(total)): t
        )
        for oxide in out:
            st3.add(
                oxide,
                lambda q, oxide=oxide, te=tot_expr: (
                    f"({q(oxide)} / {safe_denom(rowsum(q))}) * ({te(q)})"
                ),
            )
    return out


def add_normalize(plan: Plan, cols: list[str], carry: list[str] = ()) -> list[str]:
    """U9 ``normalize``: scale each row's formula columns to sum 100
    (ref ``_calc.py:432-443``).  The reference divides UNGUARDED —
    pandas gives the all-zero row NaN (0/0) — so the division is
    :func:`ieee_div`, not ``/``: Spark's ``/`` would abort the whole
    job on that row under ANSI mode."""
    fcols = core.formula_cols(cols)

    # rowsum bound once as a named column (O(N) stage text instead of
    # O(N²) — see add_to_apfu); arithmetic unchanged, pandas computes the
    # same per-row sum once.
    rs_col = f"__norm_rs_{len(plan.stages)}"
    ctx = Ctx(plan, list(carry) + [c for c in cols if c not in set(carry)])
    ctx.let([(rs_col, lambda q: add_chain([q(c) for c in fcols]))])

    st = plan.stage()
    st.passthrough(list(carry))
    for c in fcols:
        st.add(c, lambda q, c=c:
               f"({ieee_div(q(c), q(rs_col))}) * 100e0")
    return fcols


# ---------------------------------------------------------------------------
# Iron interconversion V1-V3, V7 (ref ``_calc.py:633-694,845-914``)
# ---------------------------------------------------------------------------


def _merge_pair(
    plan: Plan,
    cols: list[str],
    src: str,
    dst: str,
    factor: float,
    carry: list[str] = (),
) -> list[str]:
    """Drop *src*, adding ``src * factor`` into *dst* (created if absent)."""
    cols = list(cols)
    if src not in cols:
        st = plan.stage()
        st.passthrough(list(carry) + cols)
        return cols
    out = []
    st = plan.stage()
    st.passthrough(list(carry))
    converted = lambda q: f"({q(src)} * {flit(factor)})"  # noqa: E731
    has_dst = dst in cols
    for c in cols:
        if c == src:
            if not has_dst:
                out.append(dst)
                st.add(dst, converted)
            continue
        if c == dst:
            out.append(dst)
            st.add(dst, lambda q: f"({q(dst)} + {converted(q)})")
            continue
        out.append(c)
        st.add(c, lambda q, c=c: q(c))
    return out


def add_feo_to_fe2o3(plan: Plan, cols, carry=()) -> list[str]:
    """V1: FeO wt% → Fe₂O₃ wt% (mole-conserving merge, ref ``_calc.py:633-662``)."""
    factor = 0.5 * core.MW("Fe2O3") / core.MW("FeO")
    return _merge_pair(plan, cols, "FeO", "Fe2O3", factor, carry)


def add_fe2o3_to_feo(plan: Plan, cols, carry=()) -> list[str]:
    """V2: Fe₂O₃ wt% → FeO wt% merge (ref ``_calc.py:665-694``)."""
    factor = 2.0 * core.MW("FeO") / core.MW("Fe2O3")
    return _merge_pair(plan, cols, "Fe2O3", "FeO", factor, carry)


def add_reduce_moles(plan: Plan, cols, carry=()) -> list[str]:
    """V3: Fe₂O₃ moles → 2×FeO moles merge (ref ``_calc.py:888-914``)."""
    return _merge_pair(plan, cols, "Fe2O3", "FeO", 2.0, carry)


def add_oxidize_moles(
    plan: Plan, cols: list[str], o_excess: float | str, carry=()
) -> list[str]:
    """V7 ``oxidize_moles``: split FeO into FeO+Fe₂O₃ from excess oxygen mol%
    (THERMOCALC convention, ref ``_calc.py:845-885``).

    ``o_excess`` — scalar mol% or a per-row column name.  Assumes no
    pre-existing positive Fe2O3 column (the idempotence early-return is a
    driver-side decision made by the caller from the column set).
    """
    cols = list(cols)
    if "FeO" not in cols:
        st = plan.stage()
        st.passthrough(list(carry) + cols)
        return cols

    def rowsum(q):
        return add_chain([q(c) for c in cols])

    o_expr = (lambda q: q(o_excess)) if isinstance(o_excess, str) else (
        lambda q, o=flit(float(o_excess)): o
    )

    def fe3(q):
        o_moles = f"({o_expr(q)} / 100e0) * {rowsum(q)}"
        return clip(f"2e0 * ({o_moles})", "0e0", q("FeO"))

    out = []
    st = plan.stage()
    st.passthrough(list(carry))
    for c in cols:
        if c == "FeO":
            st.add("FeO", lambda q: f"({q('FeO')} - {fe3(q)})")
            out.append("FeO")
        else:
            st.add(c, lambda q, c=c: q(c))
            out.append(c)
    if "Fe2O3" not in cols:
        st.add("Fe2O3", lambda q: f"({fe3(q)} / 2e0)")
        out.append("Fe2O3")
    return out
