"""hpxeos — THERMOCALC a-x solution models as a compiled expression engine.

This is the engine's query-compiler layer (SURVEY.md §2.7): the THERMOCALC
axfile "compiled polynomial" notation (X1) is parsed into an IR on the
driver and compiled straight to dual-dialect SQL column expressions (X2) —
Catalyst constant-folds the literal coefficients and whole-stage-codegens
the arithmetic; the identical text is the DuckDB oracle.  No per-row
parsing, no UDFs.

Notation (public THERMOCALC axfile format; reference parser at
``/root/reference/src/petropandas/hpxeos/polynomial.py``):
``name numTerms { numFactors { const numPairs { coeff var }* }* }*`` —
value = Σ terms, term = Π factors, factor = const + Σ coeff·var;
fraction tokens ``num/den``; ``%`` starts a comment.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from petropandas_spark.functions.conversions import add_to_apfu_by_charge
from petropandas_spark.minerals import Ctx, MineralConfig, add_raw_apfu
from petropandas_spark import core
from petropandas_spark.sqlgen import Plan, flit

# IR: polynomial = tuple of terms; term = tuple of factors;
# factor = (const, ((coeff, var), ...)).
Polynomial = tuple


def parse_block(text: str) -> dict[str, Polynomial]:
    """Parse every named polynomial in an axfile block into IR."""
    toks: list[str] = []
    for line in text.splitlines():
        body = line.split("%", 1)[0].strip()
        if body:
            toks.extend(body.split())

    def num(tok: str) -> float:
        if "/" in tok:
            a, b = tok.split("/", 1)
            return float(a) / float(b)
        return float(tok)

    out: dict[str, Polynomial] = {}
    i = 0
    while i < len(toks):
        name = toks[i]
        n_terms = int(toks[i + 1])
        i += 2
        terms = []
        for _t in range(n_terms):
            n_factors = int(toks[i])
            i += 1
            factors = []
            for _f in range(n_factors):
                const = num(toks[i])
                n_pairs = int(toks[i + 1])
                i += 2
                pairs = []
                for _p in range(n_pairs):
                    pairs.append((num(toks[i]), toks[i + 1]))
                    i += 2
                factors.append((const, tuple(pairs)))
            terms.append(tuple(factors))
        out[name] = tuple(terms)
    return out


def compile_polynomial(poly: Polynomial, q) -> str:
    """IR → SQL expression; evaluation order mirrors the reference's
    left-fold (const + c1·v1 + c2·v2, then factor products, then term sums)
    so numbers agree to the last ULP in both engines."""
    terms = []
    for factors in poly:
        fs = []
        for const, pairs in factors:
            e = flit(const)
            for coeff, var in pairs:
                e = f"({e} + {flit(coeff)} * {q(var)})"
            fs.append(e)
        terms.append("(" + " * ".join(fs) + ")" if len(fs) > 1 else fs[0])
    return "(" + " + ".join(terms) + ")" if len(terms) > 1 else terms[0]


@dataclass(frozen=True)
class PhaseSpec:
    """One THERMOCALC solution-phase model, fully data-driven.

    ``build_variables(ctx, c)`` appends the variable-definition stages:
    ``c(ion)`` resolves an ion column (literal 0 when absent and optional).
    ``p_block`` is the axfile's p(...) polynomial block (public THERMOCALC
    data), compiled at plan build.
    """

    name: str
    abbreviation: str
    end_members: tuple[str, ...]
    p_block: str
    mineral: MineralConfig
    required: tuple[str, ...]
    build_variables: Callable
    optional: tuple[str, ...] = ("Fe{3+}",)
    order_parameters: tuple[str, ...] = ()
    charge_basis: float | None = None  # e.g. chlorite's 28 charges
    sf_block: str | None = None
    #: expression-valued defaults for order parameters not supplied by the
    #: caller (e.g. magnetite's random-inversion Q = 2x/(2+x)); a builder
    #: ``q -> expr`` over already-defined variable columns.
    order_defaults: dict = field(default_factory=dict)


def _phase_variables(plan: Plan, cols: list[str], spec: PhaseSpec,
                     units: str, carry: list[str]):
    """Shared X8/X10 front half: raw APFU (oxygen- or charge-basis per the
    spec), required-column validation, and the variable stages."""
    if spec.charge_basis is not None:
        ox_cols = add_to_apfu_by_charge(
            plan, cols, target_charges=spec.charge_basis, units=units, carry=carry
        )
        st = plan.stage()
        st.passthrough(list(carry))
        ion_cols = []
        for ocol in ox_cols:
            ion = core.oxide_to_ion_col(ocol)
            st.add(ion, lambda q, ocol=ocol: q(ocol))
            ion_cols.append(ion)
    else:
        ion_cols = add_raw_apfu(plan, cols, spec.mineral, units, carry=carry)

    missing = [
        r for r in spec.required
        if r not in ion_cols and r not in spec.optional
    ]
    if missing:
        raise ValueError(
            f"{spec.name} composition is missing required columns: {sorted(missing)}"
        )

    # carry only ions the model references: non-model ions (e.g. halogen
    # F from a full microprobe table) would otherwise ride along and can
    # case-collide with axfile variable names under Spark's
    # case-insensitive resolver (bare ``F`` vs garnet's variable ``f``)
    keep = set(spec.required) | set(spec.optional)
    ion_cols = [c for c in ion_cols if c in keep]

    ctx = Ctx(plan, list(carry) + list(ion_cols))

    def c(ion: str):
        if ion in ion_cols:
            return lambda q, n=ion: q(n)
        return lambda q: "0e0"

    spec.build_variables(ctx, c)
    return ctx


def _add_order_parameters(ctx, spec: PhaseSpec, order_parameters) -> None:
    """Order parameters: caller-supplied scalars become literals; otherwise
    an expression-valued default (magnetite's Q_random) or 0 (fully
    disordered) — ref ``hpxeos/base.py:26-44``."""
    op = order_parameters or {}
    if not spec.order_parameters:
        return
    defs = []
    for name in spec.order_parameters:
        if name in op:
            defs.append((name, lambda q, v=flit(float(op[name])): v))
        elif name in spec.order_defaults:
            defs.append((name, spec.order_defaults[name]))
        else:
            defs.append((name, lambda q: "0e0"))
    ctx.let(defs)


def add_phase_end_members(
    plan: Plan,
    cols: list[str],
    spec: PhaseSpec,
    units: str = "wt%",
    order_parameters: dict[str, float] | None = None,
    carry: list[str] = (),
) -> list[str]:
    """X8: raw APFU → variables → compiled p(...) polynomials × 100."""
    ctx = _phase_variables(plan, cols, spec, units, carry)
    _add_order_parameters(ctx, spec, order_parameters)
    polys = parse_block(spec.p_block)
    st = plan.stage()
    st.passthrough(list(carry))
    for em in spec.end_members:
        poly = polys[f"p({em})"]
        st.add(em, lambda q, poly=poly: f"({compile_polynomial(poly, q)} * 100e0)")
    return list(spec.end_members)


def add_site_occupancies(
    plan: Plan,
    cols: list[str],
    spec: PhaseSpec,
    units: str = "wt%",
    order_parameters: dict[str, float] | None = None,
    carry: list[str] = (),
) -> list[str]:
    """X10: evaluate the sf block (transcription self-check surface)."""
    if spec.sf_block is None:
        raise ValueError(f"{spec.name} has no sf block")
    ctx = _phase_variables(plan, cols, spec, units, carry)
    _add_order_parameters(ctx, spec, order_parameters)
    polys = parse_block(spec.sf_block)
    st = plan.stage()
    st.passthrough(list(carry))
    out = []
    for name, poly in polys.items():
        st.add(name, lambda q, poly=poly: compile_polynomial(poly, q))
        out.append(name)
    return out
