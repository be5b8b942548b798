"""Stoichiometry-validation scores Q1-Q8 (SURVEY.md §2.5) as expressions.

All row-wise scalar math — CASE/GREATEST/LEAST/EXP — no UDFs, no shuffle.
Reference semantics: ``/root/reference/src/petropandas/_calc.py:451-625``
orchestrated by ``_accessors.py:168-228``.

The reference computes criterion applicability dynamically then drops
all-NaN columns; here applicability is decided on the driver from the
mineral config + column set (SURVEY.md §2.8 A5), so NaN columns are never
emitted.
"""

from __future__ import annotations

from petropandas_spark import core
from petropandas_spark.sqlgen import (
    Plan,
    add_chain,
    clip_lower,
    flit,
    safe_denom,
    trapezoid,
)


def add_stoichiometry_scores(
    plan: Plan,
    *,
    oxide_total_col: str,
    apfu_cols: list[str],
    site_cols: dict[str, list[str]],
    unalloc_cols: dict[str, str],
    mineral,
    fe_split_ok: bool,
    carry: list[str] = (),
    apfu_aliases: dict[str, str] | None = None,
) -> list[str]:
    """Emit one score column per applicable criterion.

    Args:
        plan: target plan (a final stage is appended).
        oxide_total_col: hidden column holding Σ oxide wt% of the *input*
            table (computed before APFU conversion).
        apfu_cols: ion-named APFU columns (after valence splits).
        site_cols: ``{site_name: [allocated (site,ion) flat column names]}``.
        unalloc_cols: ``{site_name: flat "_unallocated" column name}``.
        mineral: a :class:`petropandas_spark.minerals.MineralConfig`.
        fe_split_ok: whether the Fe valence split actually ran.
        carry: extra columns passed through.
        apfu_aliases: optional ``{ion_name: live_column_alias}`` when the
            pristine APFU values were preserved under different aliases
            (site allocation consumes the originals).

    Returns:
        List of emitted score column names.
    """
    alias_of = apfu_aliases or {c: c for c in apfu_cols}
    st = plan.stage()
    st.passthrough(list(carry))
    out: list[str] = []

    # Q2 analytical_total — trapezoid on oxide wt% sum vs mineral range.
    lo, hi = mineral.analytical_total_range
    st.add(
        "analytical_total",
        lambda q: trapezoid(q(oxide_total_col), lo, hi, margin=1.5),
    )
    out.append("analytical_total")

    def apfu_sum(q):
        return add_chain([q(alias_of[c]) for c in apfu_cols])

    # Q3 cation_deviation — 1 - |Σapfu - ideal|/ideal, clip ≥ 0.
    if mineral.ideal_cations is not None:
        ideal = flit(float(mineral.ideal_cations))
        st.add(
            "cation_deviation",
            lambda q: clip_lower(
                f"(1e0 - ABS({apfu_sum(q)} - {ideal}) / {ideal})", 0.0
            ),
        )
        out.append("cation_deviation")

    # Q4 charge_balance — exp(-|Σ(apfu·charge) - 2·n_oxy| / 0.5).
    charges = {c: (core.parse_ion(c) or ("", 0))[1] for c in apfu_cols}
    expected = flit(2.0 * float(mineral.n_oxygens))

    def total_charge(q):
        return add_chain(
            [f"{q(alias_of[c])} * {flit(float(charges[c]))}" for c in apfu_cols]
        )

    # ROUND(...,10): EXP is the one libm-backed function here, and Spark
    # (Java Math.exp) vs DuckDB (C libm) may differ in the last ULP; both
    # engines' ROUND produce the correctly-rounded double of the 10-decimal
    # value, collapsing the ULP divergence.  Scores are in [0,1], so 10
    # decimals loses nothing meaningful.
    st.add(
        "charge_balance",
        lambda q: f"ROUND(EXP(-ABS({total_charge(q)} - {expected}) / 0.5e0), 10)",
    )
    out.append("charge_balance")

    # Q5 fe3+_validity — binary Fe{3+}≥0 ∧ Fe{2+}≥0 (NaN-dropped unless split ran).
    fe3, fe2 = "Fe{3+}", "Fe{2+}"
    if fe_split_ok and fe3 in apfu_cols:
        # NOT isnan: numpy's NaN >= 0 is False (a blank row scores 0),
        # Spark/DuckDB's is true (NaN sorts largest) — it would score 1
        conds = [lambda q: (
            f"({q(alias_of[fe3])} >= 0e0"
            f" AND NOT isnan({q(alias_of[fe3])}))")]
        if fe2 in apfu_cols:
            conds.append(lambda q: (
                f"({q(alias_of[fe2])} >= 0e0"
                f" AND NOT isnan({q(alias_of[fe2])}))"))
        st.add(
            "fe3+_validity",
            lambda q: "(CASE WHEN "
            + " AND ".join(c(q) for c in conds)
            + " THEN 1e0 ELSE 0e0 END)",
        )
        out.append("fe3+_validity")

    # Q6 site_vacancies — 1 - mean(unallocated)/mean(capacity>0), clip ≥ 0.
    caps = [
        s.capacity
        for name in unalloc_cols
        for s in mineral.site_definitions
        if s.name == name and s.capacity > 0
    ]
    if caps:
        mean_cap = flit(sum(caps) / len(caps))
        n_sites = flit(float(len(unalloc_cols)))

        def mean_unalloc(q):
            return f"({add_chain([q(c) for c in unalloc_cols.values()])} / {n_sites})"

        st.add(
            "site_vacancies",
            lambda q: clip_lower(f"(1e0 - {mean_unalloc(q)} / {mean_cap})", 0.0),
        )
        out.append("site_vacancies")

    # Q7 leftover_cations — 1 - clip((Σapfu - Σallocated)/safe(Σapfu), ≥0), clip ≥ 0.
    all_site_cols = [c for cols in site_cols.values() for c in cols]
    if all_site_cols:

        def allocated(q):
            return add_chain([q(c) for c in all_site_cols])

        st.add(
            "leftover_cations",
            lambda q: clip_lower(
                "(1e0 - "
                + clip_lower(
                    f"(({apfu_sum(q)} - {allocated(q)}) / {safe_denom(apfu_sum(q))})",
                    0.0,
                )
                + ")",
                0.0,
            ),
        )
        out.append("leftover_cations")

    # Q8 tetrahedral_fill — trapezoid(margin 0.15) on T-site sum vs capacity.
    t_site = next(
        (s for s in mineral.site_definitions if s.name.startswith("T")), None
    )
    if t_site is not None and site_cols.get(t_site.name):
        cap = float(t_site.capacity)
        t_cols = site_cols[t_site.name]
        st.add(
            "tetrahedral_fill",
            lambda q: trapezoid(
                add_chain([q(c) for c in t_cols]), cap, cap, margin=0.15
            ),
        )
        out.append("tetrahedral_fill")

    return out
