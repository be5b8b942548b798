"""Bulk-rock geochemistry operators B1-B5 (SURVEY.md §2.10) as expressions.

Schema-driven: which output columns exist is decided on the driver from the
input column set (the reference's "computed only when inputs present",
``_calc.py:955-1012``); every emitted expression is pure clip arithmetic
with MW constants folded to literals.

Reference semantics: ``/root/reference/src/petropandas/_calc.py:922-1049``
(B1 alumina_saturation, B3 oxide_ratios, B4 apatite_correction),
``_calc.py:1855-1993`` (B5 cipw_norm_simple),
``_accessors.py:640-661`` (B2 Shand classification).
"""

from __future__ import annotations

from petropandas_spark import core
from petropandas_spark.minerals import Ctx
from petropandas_spark.sqlgen import Plan, clip_upper, flit, safe_denom

MW = core.MW


def _get(cols: list[str], name: str):
    """quote->expr: the column if present, else literal 0 (``df.get``)."""
    if name in cols:
        return lambda q, n=name: q(n)
    return lambda q: "0e0"


def add_alumina_saturation(
    plan: Plan, cols: list[str], classify: bool = False, carry: list[str] = ()
) -> list[str]:
    """B1 molar A/NK and A/CNK (+B2 Shand class) — ref ``_calc.py:922-952``."""
    ctx = Ctx(plan, list(cols) + list(carry))
    ctx.let([
        ("__al", lambda q: f"({_get(cols, 'Al2O3')(q)} / {flit(MW('Al2O3'))})"),
        ("__na", lambda q: f"({_get(cols, 'Na2O')(q)} / {flit(MW('Na2O'))})"),
        ("__k", lambda q: f"({_get(cols, 'K2O')(q)} / {flit(MW('K2O'))})"),
        ("__ca", lambda q: f"({_get(cols, 'CaO')(q)} / {flit(MW('CaO'))})"),
    ])
    ctx.let([
        ("__nk", lambda q: f"({q('__na')} + {q('__k')})"),
    ])
    ctx.let([
        ("__cnk", lambda q: f"({q('__ca')} + {q('__nk')})"),
    ])
    st = plan.stage()
    st.passthrough(list(carry))
    st.add("A/NK", lambda q: f"({q('__al')} / {safe_denom(q('__nk'))})")
    st.add("A/CNK", lambda q: f"({q('__al')} / {safe_denom(q('__cnk'))})")
    out = ["A/NK", "A/CNK"]
    if classify:
        # ref ``_accessors.py:652-660``: peralkaline (A/NK<1) overrides
        # peraluminous (A/CNK>=1) overrides metaluminous.
        st.add("shand_class", lambda q: (
            f"(CASE WHEN ({q('__al')} / {safe_denom(q('__nk'))}) < 1e0 "
            f"THEN 'peralkaline' "
            f"WHEN ({q('__al')} / {safe_denom(q('__cnk'))}) >= 1e0 "
            f"THEN 'peraluminous' ELSE 'metaluminous' END)"
        ))
        out.append("shand_class")
    return out


def add_oxide_ratios(plan: Plan, cols: list[str], carry: list[str] = ()) -> list[str]:
    """B3 FeOT / Mg# / alkali ratios, emitted only when inputs are present
    (ref ``_calc.py:955-1012``)."""
    st = plan.stage()
    st.passthrough(list(carry))
    out: list[str] = []
    has = set(cols)

    if "FeO" in has and "Fe2O3" in has:
        st.add("FeOT", lambda q: f"({q('FeO')} + 0.8998e0 * {q('Fe2O3')})")
        out.append("FeOT")
    elif "FeO" in has:
        st.add("FeOT", lambda q: q("FeO"))
        out.append("FeOT")

    if "MgO" in has and "FeO" in has:

        def mgn(q):
            mg_mol = f"({q('MgO')} / {flit(MW('MgO'))})"
            fe_mol = f"({q('FeO')} / {flit(MW('FeO'))})"
            return f"({mg_mol} / {safe_denom(f'({mg_mol} + {fe_mol})')})"

        st.add("Mg#", mgn)
        out.append("Mg#")

    if "Na2O" in has and "K2O" in has:
        st.add("Na2O+K2O", lambda q: f"({q('Na2O')} + {q('K2O')})")
        out.append("Na2O+K2O")
        st.add("K2O/Na2O", lambda q: f"({q('K2O')} / {safe_denom(q('Na2O'))})")
        out.append("K2O/Na2O")

    if "CaO" in has and "Na2O" in has:
        st.add("CaO/Na2O", lambda q: f"({q('CaO')} / {safe_denom(q('Na2O'))})")
        out.append("CaO/Na2O")

    for pt in ("SiO2", "TiO2"):
        if pt in has:
            st.add(pt, lambda q, pt=pt: q(pt))
            out.append(pt)
    return out


def add_apatite_correction(
    plan: Plan, cols: list[str], carry: list[str] = ()
) -> list[str]:
    """B4 fluorapatite CaO correction: CaO −= (10/3)·mol(P₂O₅)·MW(CaO),
    P₂O₅ := 0 (ref ``_calc.py:1015-1049``)."""
    st = plan.stage()
    st.passthrough(list(carry))
    out = []
    has = set(cols)
    for c in cols:
        if c == "CaO" and "P2O5" in has:
            st.add("CaO", lambda q: (
                f"({q('CaO')} - (10e0 / 3e0) * ({q('P2O5')} / "
                f"{flit(MW('P2O5'))}) * {flit(MW('CaO'))})"
            ))
        elif c == "P2O5":
            st.add("P2O5", lambda q: "0e0")
        else:
            st.add(c, lambda q, c=c: q(c))
        out.append(c)
    return out


# -- B5 simplified CIPW norm -------------------------------------------------

_CIPW_OXIDES = [
    "SiO2", "TiO2", "Al2O3", "Fe2O3", "FeO", "MgO", "CaO", "Na2O", "K2O",
    "P2O5", "Cr2O3",
]


def add_cipw_norm_simple(
    plan: Plan, cols: list[str], carry: list[str] = ()
) -> list[str]:
    """B5 vectorized sequential norm Ap→Il→Mt→Chr→Or→Ab→An→C→Di→Hy→Q
    (ref ``_calc.py:1855-1993``), as chained clip expressions.

    The reference's final "drop zero-only columns" is a data scan (A4);
    here all normative columns are emitted — callers needing the drop run
    the two-pass ``agg(max(abs(c)))`` action (PetroFrame does).
    """
    ctx = Ctx(plan, list(cols) + list(carry))
    g = lambda e: f"GREATEST({e}, 0e0)"  # noqa: E731
    # molar proportions, absent oxides → 0
    ctx.let([
        (f"__m_{ox}", lambda q, ox=ox: f"({_get(cols, ox)(q)} / {flit(MW(ox))})")
        for ox in _CIPW_OXIDES
    ])
    # sequential allocation with running remainders
    ctx.let([("__ap", lambda q: q("__m_P2O5"))])
    ctx.let([("__cao1", lambda q: f"({q('__m_CaO')} - 3e0 * {q('__ap')})")])
    ctx.let([("__il", lambda q: q("__m_TiO2"))])
    ctx.let([("__feo1", lambda q: f"({q('__m_FeO')} - {q('__il')})")])
    ctx.let([("__mt", lambda q: q("__m_Fe2O3"))])
    ctx.let([("__feo2", lambda q: f"({q('__feo1')} - {q('__mt')})")])
    ctx.let([("__cr", lambda q: q("__m_Cr2O3"))])
    ctx.let([("__feo3", lambda q: f"({q('__feo2')} - {q('__cr')})")])
    ctx.let([("__or", lambda q: q("__m_K2O"))])
    ctx.let([
        ("__al1", lambda q: f"({q('__m_Al2O3')} - {q('__or')})"),
        ("__si1", lambda q: f"({q('__m_SiO2')} - 6e0 * {q('__or')})"),
    ])
    ctx.let([("__ab", lambda q: q("__m_Na2O"))])
    ctx.let([
        ("__al2", lambda q: f"({q('__al1')} - {q('__ab')})"),
        ("__si2", lambda q: f"({q('__si1')} - 6e0 * {q('__ab')})"),
    ])
    ctx.let([("__an", lambda q: clip_upper(g(q('__al2')), q('__cao1')))])
    ctx.let([
        ("__al3", lambda q: f"({q('__al2')} - {q('__an')})"),
        ("__si3", lambda q: f"({q('__si2')} - 2e0 * {q('__an')})"),
        ("__cao2", lambda q: f"({q('__cao1')} - {q('__an')})"),
    ])
    ctx.let([("__c", lambda q: g(q("__al3")))])
    ctx.let([("__di", lambda q: clip_upper(g(q('__cao2')), g(q('__m_MgO'))))])
    ctx.let([
        ("__mgo1", lambda q: f"({q('__m_MgO')} - {q('__di')})"),
        ("__si4", lambda q: f"({q('__si3')} - 2e0 * {q('__di')})"),
    ])
    ctx.let([
        ("__hymg0", lambda q: g(q("__mgo1"))),
        ("__hyfe0", lambda q: g(q("__feo3"))),
    ])
    ctx.let([("__hytot0", lambda q: f"({q('__hymg0')} + {q('__hyfe0')})")])
    ctx.let([("__hytot", lambda q: clip_upper(q('__hytot0'), g(q('__si4'))))])
    ctx.let([("__scale", lambda q: f"({q('__hytot')} / {safe_denom(q('__hytot0'))})")])
    ctx.let([
        ("__hymg", lambda q: f"({q('__hymg0')} * {q('__scale')})"),
        ("__hyfe", lambda q: f"({q('__hyfe0')} * {q('__scale')})"),
    ])
    ctx.let([("__qz", lambda q: g(
        f"({q('__si4')} - {q('__hymg')} - {q('__hyfe')})"
    ))])
    # normative moles → wt%
    members = [
        ("Ap", "__ap", MW("Ca3(PO4)2")),
        ("Il", "__il", MW("FeTiO3")),
        ("Mt", "__mt", MW("Fe3O4")),
        ("Crn", "__cr", MW("FeCr2O4")),
        ("Or", "__or", MW("K2Al2Si6O16")),
        ("Ab", "__ab", MW("Na2Al2Si6O16")),
        ("An", "__an", MW("CaAl2Si2O8")),
        ("C", "__c", MW("Al2O3")),
        ("Di", "__di", MW("CaMgSi2O6")),
        ("Q", "__qz", MW("SiO2")),
    ]
    st = plan.stage()
    st.passthrough(list(carry))
    out = []
    for name, alias, mw in members[:-1]:
        st.add(name, lambda q, a=alias, w=flit(mw): f"({q(a)} * {w})")
        out.append(name)
        if name == "Di":  # Hy sits between Di and Q in reference order
            st.add("Hy", lambda q: (
                f"({q('__hymg')} * {flit(MW('MgSiO3'))} + "
                f"{q('__hyfe')} * {flit(MW('FeSiO3'))})"
            ))
            out.append("Hy")
    st.add("Q", lambda q: f"({q('__qz')} * {flit(MW('SiO2'))})")
    out.append("Q")
    return out
