"""Valence-splitting operators V4-V6 (SURVEY.md §2.4) as expression stages.

Droop (1987) and Schumacher (1991) Fe³⁺ (or Mn³⁺/Ti³⁺) estimates —
row-sum + clip arithmetic, pure Catalyst expressions.

Reference semantics: ``/root/reference/src/petropandas/_calc.py:701-842``.
"""

from __future__ import annotations

from petropandas_spark import core
from petropandas_spark.sqlgen import (Ctx, Plan, add_chain, clip_lower, flit,
                                      ieee_div)

VALENCE_PAIRS: dict[str, dict[str, int]] = {
    "Fe": {"low_charge": 2, "high_charge": 3},
    "Mn": {"low_charge": 2, "high_charge": 3},
    "Ti": {"low_charge": 4, "high_charge": 3},
}


def _droop_high(q, cols, total_col, n_oxygens, ideal_cations):
    """Droop (1987): F = 2·n_oxy·(1 − ideal/S), high = total − clip(total − clip(F,0), 0)."""
    S = add_chain([q(c) for c in cols])
    # ieee_div: the reference divides unguarded (_calc.py:728) — a
    # zero APFU sum gives ideal/0 = +inf, F = -inf, clip → high = 0 in
    # pandas; Spark's plain / would abort the job under ANSI mode.
    # Text growth is LINEAR here (S repeats ×3 inside ieee_div, used
    # once) — measured no plan-time cost, so no named stage needed.
    F = (f"2e0 * {flit(float(n_oxygens))} * "
         f"(1e0 - {ieee_div(flit(float(ideal_cations)), S)})")
    high = clip_lower(F, 0.0)
    low = clip_lower(f"({q(total_col)} - {high})", 0.0)
    return f"({q(total_col)} - {low})"


def _schumacher_stages(
    ctx: Ctx, cols, total_col, n_oxygens, ideal_cations, tag: str
):
    """Schumacher (1991) high-charge APFU (ref ``_calc.py:734-780``).

    ``S``, ``norm``, ``oxy`` and the clipped high-charge APFU are bound as
    NAMED stage columns instead of textual inlining: the inlined form
    embedded the N-term row-sum inside ``norm``, ``norm`` inside every
    ``oxy`` term (O(N²) SQL text) and repeated the whole thing again in
    the rescale — runtime codegen CSE dedups the arithmetic, but Catalyst
    ANALYSIS time on the exploded tree does not (measured ~5 s of pure
    plan time per amphibole-width query, a 5-8.6× wall regression).  As
    named columns each expression is analyzed once; CollapseProject keeps
    them as separate projections because re-inlining would duplicate
    non-cheap expressions.  Arithmetic is unchanged — same IEEE-754
    operation tree, bit-identical results in both dialects.

    Returns the quote->expr builder for the high-charge output column.
    """
    # oxygens demanded per cation (charge/2), from ion charge or oxide ratio
    opc: dict[str, float] = {}
    for c in cols:
        ion = core.parse_ion(c)
        if ion is not None:
            opc[c] = ion[1] / 2.0
        elif core.is_oxide(c):
            opc[c] = (2.0 * core.oxygens_per(c)) / core.cations_per(c) / 2.0
    present = [c for c in cols if c in opc]
    # Both divisions use ieee_div to mirror the reference's unguarded
    # pandas arithmetic (_calc.py:753,773): a zero APFU sum flows
    # inf/NaN through the chain to a NaN split instead of aborting
    # under ANSI.
    c_s, c_norm, c_oxy, c_high = (
        f"__vs_{tag}_S", f"__vs_{tag}_norm", f"__vs_{tag}_oxy",
        f"__vs_{tag}_high",
    )
    ctx.let([(c_s, lambda q: add_chain([q(c) for c in cols]))])
    ctx.let([(c_norm,
              lambda q: ieee_div(flit(float(ideal_cations)), q(c_s)))])
    ctx.let([(c_oxy, lambda q: add_chain(
        [f"({q(c)} * {q(c_norm)}) * {flit(opc[c])}" for c in present]))])
    ctx.let([(c_high, lambda q: clip_lower(
        f"2e0 * ({flit(float(n_oxygens))} - {q(c_oxy)})", 0.0))])

    def high(q):
        high_scaled = ieee_div(q(c_high), q(c_norm))
        h = clip_lower(high_scaled, 0.0)
        low = clip_lower(f"({q(total_col)} - {h})", 0.0)
        return f"({q(total_col)} - {low})"

    return high


def add_split_valence(
    plan: Plan,
    cols: list[str],
    element: str,
    method: str,
    n_oxygens: float,
    ideal_cations: float,
    carry: list[str] = (),
) -> list[str]:
    """V6 ``split_valence``: replace the total-element column with low- and
    high-charge ion columns, high inserted right after low
    (ref ``_calc.py:783-842``).

    Idempotent: if both ion columns already exist the stage is a
    passthrough (decided here on the driver from the column set).
    Raises ``KeyError`` if no column contains *element* — callers of
    the mineral pipeline skip the split in that case
    (ref ``_minerals.py:179-189``).
    """
    method = method.lower()
    if element not in VALENCE_PAIRS:
        raise ValueError(f"Unknown element {element!r}")
    if method not in {"droop", "schumacher"}:
        raise ValueError(f"Unknown method {method!r}")
    cols = list(cols)
    pair = VALENCE_PAIRS[element]
    low_ion = core.ion_name(element, pair["low_charge"])
    high_ion = core.ion_name(element, pair["high_charge"])
    if low_ion in cols and high_ion in cols:
        st = plan.stage()
        st.passthrough(list(carry) + cols)
        return cols

    total_col = core.detect_col(cols, element)

    if method == "droop":
        def high(q):
            return _droop_high(q, cols, total_col, n_oxygens, ideal_cations)
    else:
        ctx = Ctx(plan, list(carry) + cols)
        high = _schumacher_stages(
            ctx, cols, total_col, n_oxygens, ideal_cations, tag=element
        )

    out = []
    st = plan.stage()
    st.passthrough(list(carry))
    for c in cols:
        if c == total_col:
            # Reference parity quirk (``_calc.py:825-841``): the low-charge
            # column is the total column *renamed* — `low` is computed there
            # but never assigned, so Fe{2+} keeps the TOTAL element APFU —
            # and the high-charge estimate is inserted right after it.
            # Verified against the reference via the tools/refshim oracle.
            st.add(low_ion, lambda q: q(total_col))
            out.append(low_ion)
            st.add(high_ion, lambda q: high(q))
            out.append(high_ion)
        else:
            st.add(c, lambda q, c=c: q(c))
            out.append(c)
    return out
