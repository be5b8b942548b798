"""Mineral framework M1-M6 + end-members (SURVEY.md §2.6) as expression stages.

A ``MineralConfig`` is a stateless driver-side parameter bundle (reference
``/root/reference/src/petropandas/_minerals.py:29-64``).  The greedy
sequential site allocation (M3, ref ``_minerals.py:191-218``) is unrolled on
the driver into a chain of projection stages with named intermediates —
each ``take`` is a pandas-semantics ``clip(upper=remaining)`` over the *previous* stage's
aliases, so no expression subtree is ever duplicated across stages (DuckDB
evaluates each nesting level once; Spark keeps multiply-referenced aliases
as separate project nodes).  No UDFs anywhere.

End-member algorithms are chained clip arithmetic (ref Locock 2008 garnet
``_minerals.py:251-299``, Morimoto/IMA cpx ``_minerals.py:427-519``, …)
expressed with LEAST/GREATEST/CASE.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from petropandas_spark import core
from petropandas_spark.functions.conversions import (
    add_feo_to_fe2o3,
    add_fe2o3_to_feo,
    add_to_apfu,
    add_to_oxides,
)
from petropandas_spark.functions.scores import add_stoichiometry_scores
from petropandas_spark.functions.valence import add_split_valence
from petropandas_spark.sqlgen import (Ctx, Plan,  # noqa: F401 — Ctx re-export
                                      add_chain, clip_upper, flit, ieee_div,
                                      safe_denom)


@dataclass(frozen=True)
class SiteDef:
    """One crystallographic site: name, capacity, cation priority order."""

    name: str
    capacity: float
    priority: tuple[str, ...]


@dataclass(frozen=True)
class MineralConfig:
    """Stateless mineral parameter bundle (ref ``_minerals.py:29-64``)."""

    name: str
    n_oxygens: float
    ideal_cations: float | None = None
    valence_splits: tuple[dict, ...] = ()
    site_definitions: tuple[SiteDef, ...] = ()
    analytical_total_range: tuple[float, float] = (98.5, 101.5)
    #: oxide preprocessing hook (M1): None | "feo_to_fe2o3" | "fe2o3_to_feo"
    preprocess: str | None = None


# The expression-chain helper Ctx (named intermediates over a Plan) lives in
# sqlgen.py so leaf modules (functions/valence.py) can use it without a
# circular import; re-exported above for existing importers.

# ---------------------------------------------------------------------------
# M1+M2: preprocess + raw APFU (+ valence splits)
# ---------------------------------------------------------------------------


def add_raw_apfu(
    plan: Plan, cols: list[str], mineral: MineralConfig,
    units: str = "wt%", carry: list[str] = (),
) -> list[str]:
    """M2 ``_raw_apfu``: units→wt% → preprocess hook → to_apfu(n_oxygens) →
    valence splits in sequence (ref ``_minerals.py:83-100,165-189``)."""
    if units == "moles":
        cols = add_to_oxides(plan, cols, carry=carry)
        units = "wt%"
    if mineral.preprocess == "feo_to_fe2o3":
        cols = add_feo_to_fe2o3(plan, cols, carry=carry)
    elif mineral.preprocess == "fe2o3_to_feo":
        cols = add_fe2o3_to_feo(plan, cols, carry=carry)
    ion_cols = add_to_apfu(
        plan, cols, n_oxygens=mineral.n_oxygens, units=units, carry=carry
    )
    for split in mineral.valence_splits:
        element = split["element"]
        if not core.detect_cols(ion_cols, element):
            continue  # reference's KeyError-skip (``_minerals.py:185-189``)
        ion_cols = add_split_valence(
            plan,
            ion_cols,
            element=element,
            method=split["method"],
            n_oxygens=split.get("n_oxygens", mineral.n_oxygens),
            ideal_cations=split.get("ideal_cations", mineral.ideal_cations),
            carry=carry,
        )
    return ion_cols


# ---------------------------------------------------------------------------
# M3: greedy sequential site allocation, unrolled on the driver
# ---------------------------------------------------------------------------


def site_col(site: str, ion: str) -> str:
    """Flat column name for the reference's ``(site, ion)`` MultiIndex."""
    return f"{site}__{ion}"


def add_site_allocation(
    plan: Plan, ion_cols: list[str], mineral: MineralConfig,
    carry: list[str] = (),
) -> tuple[dict[str, list[str]], dict[str, str]]:
    """M3 ``_allocate_sites`` (ref ``_minerals.py:191-218``).

    Greedy fill in declared site order; each site consumes from a shared
    pool in priority order: ``take = min(pool[ion], site_remaining)``.

    Returns ``(site_cols, unalloc_cols)`` where ``site_cols`` maps site
    name → list of emitted allocated columns and ``unalloc_cols`` maps
    site name → its ``_unallocated`` column name.
    """
    ctx = Ctx(plan, list(carry) + list(ion_cols))
    site_cols: dict[str, list[str]] = {}
    unalloc_cols: dict[str, str] = {}
    # pool aliases: start as the ion columns themselves; consumed copies
    # get fresh __pool_ aliases as they shrink.
    pool = {c: c for c in ion_cols}

    for s in mineral.site_definitions:
        rem = f"__rem_{s.name}"
        ctx.let([(rem, lambda q, cap=flit(s.capacity): cap)])
        site_cols[s.name] = []
        for ion in s.priority:
            if ion not in pool:
                continue
            take = site_col(s.name, ion)
            p_old, p_new = pool[ion], f"__pool_{s.name}_{ion}"
            ctx.let(
                [
                    # clip_upper, not LEAST: pandas' clip(upper=rem)
                    # keeps a NaN pool NaN (ref _minerals.py:211) — bare
                    # LEAST returns the FINITE capacity and fabricates a
                    # fully-allocated site from a blank analysis row
                    (take, lambda q, p=p_old, r=rem:
                        clip_upper(q(p), q(r))),
                    (
                        p_new,
                        lambda q, p=p_old, r=rem: (
                            f"({q(p)} - {clip_upper(q(p), q(r))})"
                        ),
                    ),
                    (
                        rem,
                        lambda q, p=p_old, r=rem: (
                            f"({q(r)} - {clip_upper(q(p), q(r))})"
                        ),
                    ),
                ],
                drop={p_old, rem},
            )
            pool[ion] = p_new
            site_cols[s.name].append(take)
        un = site_col(s.name, "_unallocated")
        ctx.let([(un, lambda q, r=rem: q(r))], drop={rem})
        unalloc_cols[s.name] = un
    return site_cols, unalloc_cols


def add_apfu(
    plan: Plan, cols: list[str], mineral: MineralConfig,
    units: str = "wt%", carry: list[str] = (),
) -> list[str]:
    """M4 site-filtered APFU: allocate, drop ``_unallocated``, sum the same
    ion across sites (ref ``_minerals.py:107-127``) — a column-wise sum on
    the driver, not a shuffle."""
    ion_cols = add_raw_apfu(plan, cols, mineral, units, carry=carry)
    site_cols, _un = add_site_allocation(plan, ion_cols, mineral, carry=carry)
    # group emitted (site, ion) columns by ion, in first-appearance order
    # of the ion name (reference groups by MultiIndex level 1, sorted)
    by_ion: dict[str, list[str]] = {}
    for s in mineral.site_definitions:
        for ion in s.priority:
            c = site_col(s.name, ion)
            if c in site_cols.get(s.name, []):
                by_ion.setdefault(ion, []).append(c)
    ions_sorted = sorted(by_ion)  # pandas groupby(level=1) sorts keys
    st = plan.stage()
    st.passthrough(list(carry))
    for ion in ions_sorted:
        parts = by_ion[ion]
        # pandas ``groupby(level=1).sum()`` SKIPS NaN parts (a blank
        # analysis row's all-NaN allocation sums to 0.0 in the
        # reference, not NaN) — wrap each part so the chain matches
        st.add(ion, lambda q, parts=parts: add_chain([
            f"(CASE WHEN isnan({q(c)}) THEN 0e0 ELSE {q(c)} END)"
            for c in parts
        ]))
    return ions_sorted


def add_site_allocations_flat(
    plan: Plan, cols: list[str], mineral: MineralConfig,
    units: str = "wt%", carry: list[str] = (),
) -> list[str]:
    """M5 ``site_allocations`` with flattened ``site__ion`` columns."""
    ion_cols = add_raw_apfu(plan, cols, mineral, units, carry=carry)
    site_cols, unalloc = add_site_allocation(plan, ion_cols, mineral, carry=carry)
    out: list[str] = []
    for s in mineral.site_definitions:
        out.extend(site_cols[s.name])
        out.append(unalloc[s.name])
    st = plan.stage()
    st.passthrough(list(carry) + out)
    return out


# ---------------------------------------------------------------------------
# check_stoichiometry composite (ref ``_accessors.py:168-228``)
# ---------------------------------------------------------------------------


def add_check_stoichiometry(
    plan: Plan, cols: list[str], mineral: MineralConfig,
    units: str = "wt%", carry: list[str] = (),
) -> list[str]:
    """Emit one 0-1 score column per applicable criterion."""
    ox = core.oxide_cols(cols)
    fcols = core.formula_cols(cols)
    st = plan.stage()
    st.passthrough(list(carry))
    st.add("__oxtotal", lambda q: add_chain([q(c) for c in ox]))
    for c in fcols:
        st.add(c, lambda q, c=c: q(c))
    carry2 = list(carry) + ["__oxtotal"]
    ion_cols = add_raw_apfu(plan, fcols, mineral, units, carry=carry2)
    fe_split_ok = any(
        sp["element"] == "Fe" for sp in mineral.valence_splits
    ) and "Fe{3+}" in ion_cols
    # site allocation consumes the pool columns — keep pristine APFU copies
    # for the score expressions
    copies = {ion: f"__apfu_{ion}" for ion in ion_cols}
    st2 = plan.stage()
    st2.passthrough(carry2 + list(ion_cols))
    for ion, alias in copies.items():
        st2.add(alias, lambda q, ion=ion: q(ion))
    site_cols, unalloc = add_site_allocation(
        plan, ion_cols, mineral, carry=carry2 + list(copies.values())
    )
    return add_stoichiometry_scores(
        plan,
        oxide_total_col="__oxtotal",
        apfu_cols=ion_cols,
        apfu_aliases=copies,
        site_cols=site_cols,
        unalloc_cols=unalloc,
        mineral=mineral,
        fe_split_ok=fe_split_ok,
        carry=carry,
    )


# ---------------------------------------------------------------------------
# Normalisation helper shared by end-member emitters
# ---------------------------------------------------------------------------


def _emit_normalized(
    ctx: Ctx, members: list[tuple[str, str]], carry: list[str]
) -> list[str]:
    """``x / safe(total) * 100 where total > 0 else 0`` for each member.

    *members* is ``[(out_name, intermediate_col)]``; reference pattern at
    ``_minerals.py:290-298``.
    """
    total = "__em_total"
    inter = [c for _n, c in members]
    ctx.let([(total, lambda q: add_chain([q(c) for c in inter]))])
    st = ctx.plan.stage()
    st.passthrough(list(carry))
    for out_name, c in members:
        st.add(
            out_name,
            # NOT isnan: numpy's NaN > 0 is False (blank rows gate to
            # the reference's 0.0), Spark/DuckDB's is true (NaN sorts
            # largest) and would leak NaN through the THEN branch
            lambda q, c=c: (
                f"(CASE WHEN {q(total)} > 0e0 AND NOT isnan({q(total)}) THEN "
                f"{q(c)} / {safe_denom(q(total))} * 100e0 ELSE 0e0 END)"
            ),
        )
    return [n for n, _ in members]


# ---------------------------------------------------------------------------
# Mineral configs + end-member emitters (E1, E3, E4 here; others in
# minerals_ext.py as coverage widens)
# ---------------------------------------------------------------------------

GARNET = MineralConfig(
    name="Garnet",
    n_oxygens=12,
    ideal_cations=8,
    analytical_total_range=(99.0, 101.0),
    valence_splits=({"element": "Fe", "method": "droop"},),
    site_definitions=(
        SiteDef("Z", 3.0, ("Si{4+}", "Al{3+}")),
        SiteDef("Y", 2.0, ("Al{3+}", "Ti{4+}", "Cr{3+}", "Fe{3+}")),
        SiteDef("X", 3.0, ("Fe{2+}", "Mg{2+}", "Ca{2+}", "Mn{2+}")),
    ),
)

FELDSPAR = MineralConfig(
    name="Feldspar",
    n_oxygens=8,
    ideal_cations=5,
    analytical_total_range=(99.0, 101.0),
    site_definitions=(
        SiteDef("T", 4.0, ("Si{4+}", "Al{3+}")),
        SiteDef("M", 1.0, ("Ca{2+}", "Na{+}", "K{+}")),
    ),
)

CLINOPYROXENE = MineralConfig(
    name="Clinopyroxene",
    n_oxygens=6,
    ideal_cations=4,
    analytical_total_range=(99.0, 101.0),
    valence_splits=({"element": "Fe", "method": "droop"},),
    site_definitions=(
        SiteDef("T", 2.0, ("Si{4+}", "Al{3+}")),
        SiteDef("M1", 1.0, ("Al{3+}", "Ti{4+}", "Cr{3+}", "Fe{3+}", "Mg{2+}", "Fe{2+}")),
        SiteDef("M2", 1.0, ("Ca{2+}", "Na{+}", "Mn{2+}", "Fe{2+}", "Mg{2+}")),
    ),
)


def add_garnet_end_members(
    plan: Plan, cols: list[str], units: str = "wt%", carry: list[str] = ()
) -> list[str]:
    """E1: Locock (2008) sequential garnet end-members, normalized to 100%
    (ref ``_minerals.py:251-299``)."""
    ion_cols = add_raw_apfu(plan, cols, GARNET, units, carry=carry)
    ctx = Ctx(plan, list(carry) + list(ion_cols))
    g = lambda e: f"GREATEST({e}, 0e0)"  # noqa: E731
    # clip all inputs ≥ 0 (absent columns → 0)
    ctx.let([
        ("__ca", lambda q: g(ctx.col("Ca{2+}")(q))),
        ("__mg", lambda q: g(ctx.col("Mg{2+}")(q))),
        ("__fe2", lambda q: g(ctx.col("Fe{2+}")(q))),
        ("__fe3", lambda q: g(ctx.col("Fe{3+}")(q))),
        ("__mn", lambda q: g(ctx.col("Mn{2+}")(q))),
        ("__cr", lambda q: g(ctx.col("Cr{3+}")(q))),
    ])
    # 1. Uvarovite: Uvr = min(Cr/2, Ca/3); Ca -= 3·Uvr
    ctx.let([("__uvr", lambda q: clip_upper(f"({q('__cr')} / 2e0)", f"({q('__ca')} / 3e0)"))])
    ctx.let([("__ca1", lambda q: g(f"({q('__ca')} - 3e0 * {q('__uvr')})"))])
    # 2. Andradite: Adr = min(Fe3/2, Ca/3); Ca -= 3·Adr
    ctx.let([("__adr", lambda q: clip_upper(f"({q('__fe3')} / 2e0)", f"({q('__ca1')} / 3e0)"))])
    ctx.let([
        ("__ca2", lambda q: g(f"({q('__ca1')} - 3e0 * {q('__adr')})")),
    ])
    # 3.-4. Grossular + X-site members
    ctx.let([
        ("__grs", lambda q: g(f"({q('__ca2')} / 3e0)")),
        ("__prp", lambda q: g(f"({q('__mg')} / 3e0)")),
        ("__alm", lambda q: g(f"({q('__fe2')} / 3e0)")),
        ("__sps", lambda q: g(f"({q('__mn')} / 3e0)")),
    ])
    return _emit_normalized(
        ctx,
        [("Prp", "__prp"), ("Alm", "__alm"), ("Sps", "__sps"),
         ("Grs", "__grs"), ("Adr", "__adr"), ("Uvr", "__uvr")],
        carry,
    )


def add_feldspar_end_members(
    plan: Plan, cols: list[str], units: str = "wt%", carry: list[str] = ()
) -> list[str]:
    """E3: feldspar An/Ab/Or from M-site fractions (ref ``_minerals.py:404-416``).

    Matches the reference's arithmetic: division by the M-site total with
    no replace-zero guard — an alkali-free degenerate frame flows NaN
    (ieee_div; the reference's pandas 0/0) instead of aborting under
    ANSI.  Output columns in M-site priority order.
    """
    ion_cols = add_raw_apfu(plan, cols, FELDSPAR, units, carry=carry)
    site_cols, _un = add_site_allocation(plan, ion_cols, FELDSPAR, carry=carry)
    m_cols = site_cols["M"]
    mapping = {"Ca{2+}": "An", "Na{+}": "Ab", "K{+}": "Or"}
    st = plan.stage()
    st.passthrough(list(carry))
    out = []

    def m_total(q):
        return add_chain([q(c) for c in m_cols])

    for c in m_cols:
        ion = c.split("__", 1)[1]
        name = mapping.get(ion, ion)
        st.add(name, lambda q, c=c:
               f"({ieee_div(q(c), m_total(q))} * 100e0)")
        out.append(name)
    return out


def add_cpx_end_members(
    plan: Plan, cols: list[str], units: str = "wt%", carry: list[str] = ()
) -> list[str]:
    """E4: clinopyroxene end-members via IMA/Morimoto sequential allocation
    (ref ``_minerals.py:458-519``)."""
    ion_cols = add_raw_apfu(plan, cols, CLINOPYROXENE, units, carry=carry)
    ctx = Ctx(plan, list(carry) + list(ion_cols))
    g = lambda e: f"GREATEST({e}, 0e0)"  # noqa: E731
    ctx.let([
        ("__si", ctx.col("Si{4+}")), ("__al", ctx.col("Al{3+}")),
        ("__cr", ctx.col("Cr{3+}")), ("__fe3", ctx.col("Fe{3+}")),
        ("__fe2", ctx.col("Fe{2+}")), ("__mg", ctx.col("Mg{2+}")),
        ("__ca", ctx.col("Ca{2+}")), ("__na", ctx.col("Na{+}")),
    ])
    # 1. T-site: AlIV = clip(2-Si, 0) capped by Al; AlVI = clip(Al-AlIV, 0)
    ctx.let([("__aliv", lambda q: clip_upper(g('(2e0 - ' + q('__si') + ')'), q('__al')))])
    ctx.let([("__alvi", lambda q: g(f"({q('__al')} - {q('__aliv')})"))])
    # 2. Na members: Kos = min(Na, Cr); Ae = min(clip(Na-Kos,0), Fe3); Jd = min(clip(Na-Kos-Ae,0), AlVI)
    ctx.let([("__krs", lambda q: clip_upper(q('__na'), q('__cr')))])
    ctx.let([("__ae", lambda q: clip_upper(g('(' + q('__na') + ' - ' + q('__krs') + ')'), q('__fe3')))])
    ctx.let([("__jd", lambda q: (
        clip_upper(g('(' + q('__na') + ' - ' + q('__krs') + ' - ' + q('__ae') + ')'), q('__alvi'))
    ))])
    # 3. CaTs = min((AlVI - Jd clipped)/2, Ca); Ca_rem = clip(Ca - CaTs, 0)
    ctx.let([("__alvirem", lambda q: g("(" + q("__alvi") + " - " + q("__jd") + ")"))])
    ctx.let([("__cats", lambda q: clip_upper(f"({q('__alvirem')} / 2e0)", q('__ca')))])
    ctx.let([("__carem", lambda q: g("(" + q("__ca") + " - " + q("__cats") + ")"))])
    # 4. Quad: Di/Hd proportional to Mg/Fe2, capped; Wo remainder; En/Fs halves
    ctx.let([("__mgfe", lambda q: safe_denom(f"({q('__mg')} + {q('__fe2')})"))])
    ctx.let([
        ("__di", lambda q: clip_upper(f"({q('__carem')} * {q('__mg')} / {q('__mgfe')})", q('__mg'))),
        ("__hd", lambda q: clip_upper(f"({q('__carem')} * {q('__fe2')} / {q('__mgfe')})", q('__fe2'))),
    ])
    ctx.let([
        ("__wo", lambda q: g("(" + q("__carem") + " - " + q("__di") + " - " + q("__hd") + ")")),
        ("__en", lambda q: f"({g('(' + q('__mg') + ' - ' + q('__di') + ')')} / 2e0)"),
        ("__fs", lambda q: f"({g('(' + q('__fe2') + ' - ' + q('__hd') + ')')} / 2e0)"),
    ])
    return _emit_normalized(
        ctx,
        [("Jd", "__jd"), ("Ae", "__ae"), ("Di", "__di"), ("Hd", "__hd"),
         ("Kosmochlor", "__krs"), ("CaTs", "__cats"), ("Wo", "__wo"),
         ("En", "__en"), ("Fs", "__fs")],
        carry,
    )


END_MEMBER_BUILDERS = {
    "Garnet": add_garnet_end_members,
    "Feldspar": add_feldspar_end_members,
    "Clinopyroxene": add_cpx_end_members,
}
