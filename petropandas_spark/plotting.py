"""Plotting layer: compute in Spark, render in matplotlib (SURVEY.md §2.11).

The compute parts — the pandas-``eval``-dialect expression rewriter (P10/G1)
and the ternary barycentric projection (G2) — are Spark expressions; only
the final (small) plotted projection is collected.  Rendering is gated on a
matplotlib import so the compute layer works headless.

Reference semantics: ``/root/reference/src/petropandas/_plotting.py``
(_eval :210-250, _referenced_names :26-68, _project :321-346).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame, functions as F

_SINGLE_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$|^`[^`]+`$")
_NAME_TOKEN_RE = re.compile(r"`([^`]+)`|\b([A-Za-z_][A-Za-z0-9_]*)\b")

# pandas-eval function names the rewriter must leave alone (mapped to the
# Spark SQL spelling where it differs).
_FUNC_MAP = {
    "abs": "abs", "sqrt": "sqrt", "log": "ln", "log10": "log10",
    "log1p": "log1p", "exp": "exp", "sin": "sin", "cos": "cos",
    "tan": "tan", "arcsin": "asin", "arccos": "acos", "arctan": "atan",
    "arctan2": "atan2", "sinh": "sinh", "cosh": "cosh", "tanh": "tanh",
    "where": "if",
}
_RESERVED = set(_FUNC_MAP) | {
    "and", "or", "not", "in", "is", "if", "else", "True", "False", "None",
}


def referenced_names(expr: str) -> set[str]:
    """Column names referenced by a pandas-eval-dialect expression."""
    names = set()
    for backtick, ident in _NAME_TOKEN_RE.findall(expr):
        name = backtick or ident
        if backtick or name not in _RESERVED:
            names.add(name)
    return names


def _ieee_div(a: str, b: str) -> str:
    """Division with pandas/numpy (IEEE-754) semantics instead of Spark
    SQL's: ``x/0`` → ±Infinity, ``0/0`` → NaN, NULL operands stay NULL.
    Spark's ``/`` throws under ANSI (the Spark 4 default) and yields NULL
    otherwise — both diverge from the reference dialect, and the
    reference's own cross-group zero-fill makes zero denominators
    reachable (plotting ``Prp/Grs`` across groups lacking ``Grs``).
    Operand text is duplicated (a×4, b×4 — codegen CSEs the repeats), so
    deeply NESTED divisions grow the SQL text geometrically; plot
    expressions are shallow.  ``-0.0`` denominators flip the infinity
    sign like IEEE requires (``(x-x) * -k`` makes them reachable): the
    zero branch reads the sign bit off the double's string form, the
    one place Spark exposes it — evaluated only when the denominator
    compares equal to zero.

    Operand text repeats inside the emitted SQL, so NESTED divisions
    grow geometrically — past ``_BIND_THRESHOLD`` characters the
    operands are bound ONCE via a single-element
    ``transform(array(named_struct(...)), s -> ...)`` lambda (linear
    growth; the lambda is interpreted, which only matters on the rare
    deep-nest path — a depth-3 // nest previously exploded Catalyst to
    an OOM, caught by the parity fuzz)."""
    if len(a) + len(b) > _BIND_THRESHOLD:
        return (f"transform(array(named_struct("
                f"'a', CAST({a} AS DOUBLE), 'b', CAST({b} AS DOUBLE))), "
                f"s -> {_div_core('s.a', 's.b')})[0]")
    return _div_core(a, b)


_BIND_THRESHOLD = 150


def _div_core(a: str, b: str) -> str:
    da, db = f"CAST({a} AS DOUBLE)", f"CAST({b} AS DOUBLE)"
    return (
        f"IF({a} IS NULL OR {b} IS NULL, CAST(NULL AS DOUBLE), "
        f"IF({db} = 0e0, "
        f"IF({da} = 0e0 OR isnan({da}), CAST('NaN' AS DOUBLE), "
        f"IF(({da} > 0e0) = (CAST({db} AS STRING) NOT LIKE '-%'), "
        f"CAST('Infinity' AS DOUBLE), "
        f"CAST('-Infinity' AS DOUBLE))), "
        f"{da} / {db}))"
    )


def _ieee_floordiv(a: str, b: str) -> str:
    """``//`` with numpy ``floor_divide`` semantics (what pandas eval
    computes), which is NOT ``floor(a/b)``: numpy routes through fmod —
    ``div = (a - fmod(a,b))/b``, minus 1 when the remainder sign needed
    adjusting, then ``floor`` with a ``+0.5`` correction for inexact
    quotients (``npy_divmod``, numpy's public C source).  The naive
    floor diverges one ulp away from exact multiples (21.7 // 1e-8:
    numpy 2169999999, floor(a/b) 2170000000 — caught by the parity
    fuzz).  b == 0 falls back to IEEE division (±inf/NaN, matching
    numpy); a zero quotient keeps the sign of a/b via ``* 0e0``.
    Operand text repeats many times, so this always goes through the
    once-bound ``transform`` form (see :func:`_ieee_div`'s blowup
    note) — the repeats are then 3-char struct references."""
    return (f"transform(array(named_struct("
            f"'a', CAST({a} AS DOUBLE), 'b', CAST({b} AS DOUBLE))), "
            f"s -> {_floordiv_core('s.a', 's.b')})[0]")


def _floordiv_core(a: str, b: str) -> str:
    da, db = f"CAST({a} AS DOUBLE)", f"CAST({b} AS DOUBLE)"
    m = f"({da} % {db})"
    adj = f"({m} != 0e0 AND (({db} < 0e0) != ({m} < 0e0)))"
    d1 = f"((({da} - {m}) / {db}) - IF({adj}, 1e0, 0e0))"
    fl = f"CAST(FLOOR({d1}) AS DOUBLE)"
    # |d1| ≥ 2^53 bypasses FLOOR: such doubles are already integral and
    # Spark's FLOOR(double)→BIGINT saturates at Long.MAX past 2^63
    # (silently clamping 1e19 to 9.22e18)
    fcorr = (f"IF(isnan({d1}) OR abs({d1}) >= 9007199254740992e0, {d1}, "
             f"IF({d1} - {fl} > 0.5e0, {fl} + 1e0, {fl}))")
    return (f"IF({a} IS NULL OR {b} IS NULL, CAST(NULL AS DOUBLE), "
            f"IF({db} = 0e0, {_div_core(a, b)}, "
            f"IF({d1} != 0e0, {fcorr}, ({da} / {db}) * 0e0)))")


def _ast_rewrite(expr: str, colset: set[str], missing: set[str]) -> str:
    """Structural (AST-based) pandas-eval → Spark SQL emitter.

    The eval dialect is Python expression syntax, so ``ast.parse`` gives
    the exact operator structure (precedence, chained comparisons,
    ``**`` associativity) instead of token-level text substitution.
    Backticked names are swapped for placeholders before parsing and
    restored on emission.  Raises ``SyntaxError`` for text that is not
    parseable Python — callers fall back to the token rewriter."""
    import ast

    placeholders: dict[str, str] = {}

    def stash(m: re.Match) -> str:
        key = f"__bt{len(placeholders)}__"
        placeholders[key] = m.group(1)
        return key

    src = re.sub(r"`([^`]+)`", stash, expr)
    tree = ast.parse(src, mode="eval")

    _BIN = {ast.Add: "+", ast.Sub: "-", ast.Mult: "*"}
    _CMP = {ast.Eq: "=", ast.NotEq: "!=", ast.Lt: "<", ast.LtE: "<=",
            ast.Gt: ">", ast.GtE: ">="}

    def name_sql(name: str) -> str:
        return "(0.0)" if name in missing else f"`{name}`"

    def emit(n) -> str:
        if isinstance(n, ast.Expression):
            return emit(n.body)
        if isinstance(n, ast.Constant):
            if n.value is True or n.value is False:
                return "TRUE" if n.value else "FALSE"
            if n.value is None:
                return "NULL"
            if isinstance(n.value, float):
                # bare decimal literals parse as DECIMAL in Spark SQL —
                # decimal arithmetic then rounds differently from the
                # pandas dialect's float64.  A string→double cast is the
                # repr round-trip (exact) in every engine.
                return f"CAST('{n.value!r}' AS DOUBLE)"
            return repr(n.value)
        if isinstance(n, ast.Name):
            if n.id in placeholders:
                return name_sql(placeholders[n.id])
            if n.id in _FUNC_MAP or n.id in _RESERVED:
                # bare reserved word outside a call position (e.g. the
                # unparenthesized `True`/`None` path lands in Constant;
                # a bare `log` here shadows nothing the dialect allows)
                raise SyntaxError(f"bare reserved name {n.id!r}")
            return name_sql(n.id)
        if isinstance(n, ast.UnaryOp):
            if isinstance(n.op, ast.USub):
                return f"(- {emit(n.operand)})"
            if isinstance(n.op, ast.UAdd):
                return f"(+ {emit(n.operand)})"
            if isinstance(n.op, (ast.Not, ast.Invert)):
                # pandas eval's ~ is elementwise logical NOT (Spark's ~
                # is bitwise and rejects BOOLEAN input)
                return f"(NOT {emit(n.operand)})"
            raise SyntaxError("unsupported unary op")
        if isinstance(n, ast.BinOp):
            if isinstance(n.op, ast.Div):
                return _ieee_div(f"({emit(n.left)})", f"({emit(n.right)})")
            if isinstance(n.op, ast.Pow):
                return f"power({emit(n.left)}, {emit(n.right)})"
            if isinstance(n.op, ast.Mod):
                # numpy mod: sign follows the divisor → Spark pmod for
                # positive divisors (negative divisors diverge; the
                # dialect's plot expressions don't use them)
                return f"pmod({emit(n.left)}, {emit(n.right)})"
            if isinstance(n.op, ast.FloorDiv):
                return _ieee_floordiv(f"({emit(n.left)})",
                                      f"({emit(n.right)})")
            if isinstance(n.op, ast.BitAnd):
                # pandas-eval elementwise boolean ops: `&`/`|` are the
                # idiomatic spellings (plain and/or are rewritten to them
                # by pandas itself)
                return f"({emit(n.left)} AND {emit(n.right)})"
            if isinstance(n.op, ast.BitOr):
                return f"({emit(n.left)} OR {emit(n.right)})"
            if isinstance(n.op, ast.BitXor):
                # pandas eval has no visit_BitXor — ^ is not part of the
                # dialect; reject loudly (ValueError is not the
                # token-fallback trigger) instead of inventing semantics
                raise ValueError(
                    "'^' is not part of the pandas-eval dialect")
            op = _BIN.get(type(n.op))
            if op is None:
                raise SyntaxError("unsupported binary op")
            return f"({emit(n.left)} {op} {emit(n.right)})"
        if isinstance(n, ast.BoolOp):
            word = " AND " if isinstance(n.op, ast.And) else " OR "
            return "(" + word.join(emit(v) for v in n.values) + ")"
        if isinstance(n, ast.Compare):
            # numpy comparison semantics for NaN: every comparison with
            # NaN is False EXCEPT != (True).  Spark SQL instead orders
            # NaN larger than everything and NaN = NaN — reachable now
            # that IEEE division produces NaN — so guard each link.
            # TRY_CAST, not CAST: a plain cast THROWS under ANSI for the
            # dialect's string comparisons (``Sample == 'grt'``), while
            # try_cast yields NULL → guard is NULL → IF takes the plain
            # comparison branch in both engines.  Booleans cast to
            # 1.0/0.0, never NaN.  Past the size threshold both
            # operands bind once through the transform struct (each
            # link otherwise emits its operands twice: guard + compare).
            def cmp_core(ls, rs, sym):
                # Guard only operands that are ACTUALLY float-typed at
                # runtime: a string operand whose TEXT casts to NaN
                # (``Sample == 'NaN'``) must compare as a plain string
                # (pandas semantics), not trip the numeric-NaN rule.
                # lower(typeof(..)) is portable — Spark spells
                # 'double'/'float', DuckDB 'DOUBLE'/'FLOAT'; non-float
                # types (int/decimal/string/bool) can never hold NaN so
                # their guard is statically false.
                def g(x):
                    return (f"(lower(typeof({x})) IN ('double', 'float')"
                            f" AND isnan(TRY_CAST({x} AS DOUBLE)))")

                guard = f"{g(ls)} OR {g(rs)}"
                nan_val = "TRUE" if sym == "!=" else "FALSE"
                return f"IF({guard}, {nan_val}, ({ls} {sym} {rs}))"

            def link(le, ri, sym):
                ls, rs = emit(le), emit(ri)
                if len(ls) + len(rs) > _BIND_THRESHOLD:
                    return (f"transform(array(named_struct("
                            f"'a', {ls}, 'b', {rs})), "
                            f"s -> {cmp_core('s.a', 's.b', sym)})[0]")
                return cmp_core(ls, rs, sym)

            parts, left = [], n.left
            for op, right in zip(n.ops, n.comparators):
                sym = _CMP.get(type(op))
                if sym is None:
                    raise SyntaxError("unsupported comparison")
                parts.append(link(left, right, sym))
                left = right
            return parts[0] if len(parts) == 1 else \
                "(" + " AND ".join(parts) + ")"
        if isinstance(n, ast.Call):
            if not isinstance(n.func, ast.Name) or n.keywords:
                raise SyntaxError("unsupported call form")
            fname = _FUNC_MAP.get(n.func.id)
            if fname is None:
                raise SyntaxError(f"unknown function {n.func.id!r}")
            return f"{fname}({', '.join(emit(a) for a in n.args)})"
        raise SyntaxError(f"unsupported syntax: {type(n).__name__}")

    return emit(tree)


def rewrite_eval_expr(expr: str, columns: list[str]) -> str:
    """P10: pandas ``DataFrame.eval`` dialect → Spark SQL expression text.

    * a bare column reference that is missing raises (KeyError);
    * names missing from *columns* inside a multi-term expression are
      substituted with ``0.0`` (the reference's cross-group default);
    * backtick quoting carries over unchanged (same syntax both dialects);
    * numpy function names map to Spark SQL spellings (arcsin → asin, …);
    * division carries IEEE (pandas) semantics — see :func:`_ieee_div`;
      ``**`` becomes ``power`` (Spark SQL has no ``**``).

    Structure comes from a real AST pass (:func:`_ast_rewrite`) so
    precedence, chained comparisons and ``and``/``or`` translate
    faithfully; text that isn't parseable Python falls back to the
    original token-level substitution (whose output Spark's parser then
    accepts or rejects with its own error)."""
    stripped = expr.strip()
    colset = set(columns)
    if stripped in colset:
        return f"`{stripped}`"
    if _SINGLE_NAME_RE.fullmatch(stripped):
        name = stripped.strip("`")
        if name not in colset:
            raise KeyError(f"column {name!r} not found")
        return f"`{name}`"
    missing = referenced_names(expr) - colset
    try:
        return _ast_rewrite(expr, colset, missing)
    except SyntaxError:
        pass

    def sub(m: re.Match) -> str:
        backtick, ident = m.groups()
        name = backtick or ident
        if backtick:
            return "(0.0)" if name in missing else f"`{name}`"
        if name in _FUNC_MAP:
            return _FUNC_MAP[name]
        if name in _RESERVED:
            return name
        return "(0.0)" if name in missing else f"`{name}`"

    return _NAME_TOKEN_RE.sub(sub, expr)


def eval_expr(df: DataFrame, expr: str) -> Column:
    """G1: evaluate a plot-axis expression against a DataFrame."""
    return F.expr(rewrite_eval_expr(expr, df.columns))


_X_SCALE = 1.0 / math.sqrt(3.0)


def ternary_xy(df: DataFrame, top: str, left: str, right: str) -> DataFrame:
    """G2: barycentric → Cartesian projection, scale-invariant
    (x = (fr − fl)/√3, y = ft after row-normalization).

    A row whose three coordinates sum to zero (legal degenerate data —
    e.g. an analysis missing all three oxides after clean-on-access
    zero-fill) row-normalizes to 0/0: NaN in the reference's pandas
    arithmetic, a job-aborting DIVIDE_BY_ZERO under Spark's ANSI mode
    with bare ``/`` — hence :func:`frame.ieee_div_col`.  matplotlib
    drops NaN points, so the row vanishes from the plot, same as the
    reference."""
    from petropandas_spark.frame import ieee_div_col

    t, l, r = (eval_expr(df, e) for e in (top, left, right))
    # bind the row sum once: each guarded division re-reads a COLUMN, not
    # a re-evaluated (t+l+r) tree ×3 inside 5-branch CASEs (same
    # arithmetic and results, ~3× less plan/codegen text)
    den = "__tern_den"
    staged = df.withColumn(den, t + l + r)
    out = staged.withColumns({
        "__tern_x": (ieee_div_col(r, F.col(den))
                     - ieee_div_col(l, F.col(den))) * F.lit(_X_SCALE),
        "__tern_y": ieee_div_col(t, F.col(den)),
    })
    return out.drop(den)


class BasePlot:
    """Accumulate (DataFrame, label, style) groups; compute lazily in
    Spark, collect only the plotted projection, render via matplotlib
    (ref ``_plotting.py:81-264``)."""

    #: legend outside the axes to the right, vertically centered — the
    #: reference's default placement (ref ``_plotting.py:16-19,196-208``);
    #: constrained_layout makes room when attached via ``Axes.legend``.
    _LEGEND_OUTSIDE_KWARGS = {
        "loc": "center left", "bbox_to_anchor": (1.02, 0.5),
    }

    def __init__(self, legend: bool = True,
                 legend_kwargs: dict | None = None, **kwargs):
        self._groups: list[tuple[DataFrame, str | None, dict]] = []
        self.legend = legend
        self.legend_kwargs = legend_kwargs or {}
        self.kwargs = kwargs

    def add(self, df, label: str | None = None, **style) -> "BasePlot":
        from petropandas_spark.frame import PetroFrame

        if isinstance(df, PetroFrame):
            df = df.df
        self._groups.append((df, label, style))
        return self

    # -- render lifecycle (ref ``_plotting.py:131-208``) ----------------------

    def _finalize_legend(self, ax) -> None:
        """Draw the legend once all groups are plotted — only when enabled
        and at least one group carries a label (unlabeled groups plot but
        stay out of the legend, matching the reference)."""
        if self.legend and any(label for _, label, _ in self._groups):
            ax.legend(**{**self._LEGEND_OUTSIDE_KWARGS, **self.legend_kwargs})

    def figure(self):
        """Build a (Figure, Axes) pair with constrained layout and render
        into it (ref ``render() -> tuple[Figure, Axes]``)."""
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(
            constrained_layout=True,
            **({"figsize": self.kwargs["figsize"]}
               if "figsize" in self.kwargs else {}),
        )
        self.render(ax=ax)
        return fig, ax

    def show(self) -> None:
        """Render and display (ref ``_plotting.py:147-155``)."""
        import matplotlib.pyplot as plt

        self.figure()
        plt.show()

    def savefig(self, *args, **kwargs):
        """Render and save; same signature as ``Figure.savefig``
        (ref ``_plotting.py:157-160``)."""
        fig, _ax = self.figure()
        fig.savefig(*args, **kwargs)

    def _collected(self, exprs: list[str]):
        """Per group: select the axis expressions and collect to pandas."""
        out = []
        for df, label, style in self._groups:
            cols = [
                eval_expr(df, e).alias(f"__ax{i}") for i, e in enumerate(exprs)
            ]
            out.append((df.select(*cols).toPandas(), label, style))
        return out

    def render(self, ax=None):
        """Subclass contract — concrete plots draw onto ``ax``.  All
        three shipped plots' render paths are executed in the tests via
        the recording fake matplotlib (``tests/fake_mpl.py``)."""
        raise NotImplementedError


class ScatterPlot(BasePlot):
    """x/y scatter; expressions in the pandas-eval dialect."""

    def __init__(self, x: str, y: str, **kwargs):
        super().__init__(**kwargs)
        self.x, self.y = x, y

    def collect(self):
        """Compute the plotted values (driver-side list of group frames)."""
        return self._collected([self.x, self.y])

    def render(self, ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            _fig, ax = plt.subplots()
        for pdf, label, style in self.collect():
            ax.scatter(pdf["__ax0"], pdf["__ax1"], label=label, **style)
        ax.set_xlabel(self.x)
        ax.set_ylabel(self.y)
        self._finalize_legend(ax)
        return ax


class TernaryPlot(BasePlot):
    """Ternary plot: three axis expressions projected barycentrically."""

    def __init__(self, top: str, left: str, right: str, **kwargs):
        super().__init__(**kwargs)
        self.top, self.left, self.right = top, left, right

    def collect(self):
        out = []
        for df, label, style in self._groups:
            proj = ternary_xy(df, self.top, self.left, self.right)
            pdf = proj.select(
                F.col("__tern_x").alias("x"), F.col("__tern_y").alias("y")
            ).toPandas()
            out.append((pdf, label, style))
        return out

    def render(self, ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            _fig, ax = plt.subplots()
        for pdf, label, style in self.collect():
            ax.scatter(pdf["x"], pdf["y"], label=label, **style)
        ax.set_aspect("equal")
        self._finalize_legend(ax)
        return ax


class ProfilePlot(BasePlot):
    """G5: line plot of columns against a profile index with optional
    dual-axis split (ref ``_plotting.py:851-1192``).

    Column routing reproduces the reference exactly:

      * ``columns``/``secondary_columns`` select and route columns;
      * ``split="auto"`` picks the 2-way partition of column means that
        minimizes summed within-group variance — the optimum is always a
        contiguous split of the sorted means (1-D k-means property), so
        only n-1 splits are checked;
      * the empty band between non-overlapping axis ranges is compressed
        via :func:`split_gap_limits`.

    The mean/count statistics that drive the auto split are computed IN
    SPARK (one partial-aggregatable agg per group — never a full collect),
    so routing a 100-TB profile costs one narrow aggregation; only the
    plotted projection is collected.
    """

    _GAP_FRACTION = 0.08

    def __init__(self, *, xlabel=None, ylabel=None, secondary_ylabel=None,
                 split: str = "off", columns=None, secondary_columns=None,
                 index_col: str | None = None, **kwargs):
        super().__init__(**kwargs)
        self.xlabel = xlabel
        self.ylabel = ylabel
        self.secondary_ylabel = secondary_ylabel
        self.split = split
        if isinstance(columns, str):
            columns = [columns]
        if isinstance(secondary_columns, str):
            secondary_columns = [secondary_columns]
        self.columns = list(columns) if columns is not None else None
        self.secondary_columns = (
            list(secondary_columns) if secondary_columns is not None else None
        )
        self.index_col = index_col

    # -- column routing (pure logic; mirrors the reference line-for-line) --

    @staticmethod
    def _numeric_cols(df) -> list[str]:
        """Plottable columns only — a string metadata column (Sample,
        Mineral…) must never reach SUM (ANSI-mode cast error) or the
        plotted projection."""
        from pyspark.sql.types import NumericType

        return [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, NumericType)
        ]

    def _all_columns(self) -> list[str]:
        seen: dict[str, None] = {}
        for df, _label, _style in self._groups:
            for c in self._numeric_cols(df):
                if c != self.index_col:
                    seen.setdefault(c, None)
        return list(seen)

    def _column_means(self, candidates: list[str] | None) -> dict[str, float]:
        """Per-column mean across every accumulated group — Spark-side
        SUM/COUNT aggs (map-side combinable), merged on the driver with
        the same NULL handling as :func:`petropandas_spark.io.auto_split`."""
        sums: dict[str, float] = {}
        counts: dict[str, int] = {}
        for df, _label, _style in self._groups:
            cols = [
                c for c in self._numeric_cols(df)
                if c != self.index_col
                and (candidates is None or c in candidates)
            ]
            if not cols:
                continue
            aggs = []
            for c in cols:
                aggs.append(F.sum(f"`{c}`").alias(f"__s_{c}"))
                aggs.append(F.count(f"`{c}`").alias(f"__c_{c}"))
            row = df.agg(*aggs).collect()[0]
            for c in cols:
                if row[f"__c_{c}"]:
                    sums[c] = sums.get(c, 0.0) + float(row[f"__s_{c}"] or 0.0)
                    counts[c] = counts.get(c, 0) + int(row[f"__c_{c}"])
        return {c: sums[c] / counts[c] for c in sums if counts.get(c)}

    def _auto_split(self, candidates: list[str] | None = None) -> set[str]:
        """Variance-minimizing contiguous split of the column means —
        delegates to the shared A7 search (``io.best_two_partition``,
        property-tested against exhaustive search)."""
        from petropandas_spark.io import best_two_partition

        order = candidates if candidates is not None else self._all_columns()
        means = self._column_means(list(order) if candidates else None)
        return best_two_partition(means, order=list(order))

    def _split_secondary_columns(self, candidates) -> set[str]:
        if self.split == "off":
            return set()
        if self.split == "auto":
            return self._auto_split(candidates)
        raise ValueError(f"split must be 'auto' or 'off', got {self.split!r}")

    def resolve_column_routing(self) -> tuple[set[str] | None, set[str]]:
        """(allowed_columns | None, secondary_axis_columns) — reference
        ``_resolve_column_routing`` semantics."""
        if self.columns is None:
            if self.secondary_columns is not None:
                return None, set(self.secondary_columns)
            return None, self._split_secondary_columns(None)
        selected = set(self.columns)
        if self.secondary_columns is None:
            return selected, self._split_secondary_columns(self.columns)
        secondary = set(self.secondary_columns)
        return selected | secondary, secondary

    def collect(self):
        """Compute the plotted projection per group: (pandas frame indexed
        by the profile position, label, style, secondary-column set)."""
        allowed, secondary = self.resolve_column_routing()
        out = []
        for df, label, style in self._groups:
            cols = [
                c for c in self._numeric_cols(df)
                if c != self.index_col and (allowed is None or c in allowed)
            ]
            sel = ([self.index_col] if self.index_col else []) + cols
            pdf = df.select(*sel).toPandas()
            if self.index_col:
                pdf = pdf.set_index(self.index_col)
            out.append((pdf, label, style, secondary))
        return out

    def render(self, ax=None):
        import itertools

        import matplotlib.pyplot as plt

        if ax is None:
            _fig, ax = plt.subplots()
        groups = self.collect()
        secondary = groups[0][3] if groups else set()
        sec_ax = ax.twinx() if secondary else None
        colors = itertools.cycle(plt.rcParams["axes.prop_cycle"].by_key()["color"])
        plotted: dict[str, None] = {}
        for pdf, label, style, _sec in groups:
            # never mutate the caller's stored style dict
            style = {k: v for k, v in style.items() if k != "color"}
            for column in pdf.columns:
                plotted.setdefault(column, None)
                target = sec_ax if column in secondary else ax
                target.plot(
                    pdf.index, pdf[column],
                    label=f"{label} ({column})" if label else column,
                    color=next(colors), **style,
                )
        if sec_ax is not None:
            lims = split_gap_limits(
                tuple(sorted(ax.dataLim.intervaly)),
                tuple(sorted(sec_ax.dataLim.intervaly)),
                ax.get_ylim(), sec_ax.get_ylim(),
                gap_fraction=self._GAP_FRACTION,
            )
            if lims is None:
                lims = split_gap_limits(
                    tuple(sorted(sec_ax.dataLim.intervaly)),
                    tuple(sorted(ax.dataLim.intervaly)),
                    sec_ax.get_ylim(), ax.get_ylim(),
                    gap_fraction=self._GAP_FRACTION,
                )
                if lims is not None:
                    sec_ax.set_ylim(*lims[0])
                    ax.set_ylim(*lims[1])
            else:
                ax.set_ylim(*lims[0])
                sec_ax.set_ylim(*lims[1])
        if self.xlabel:
            ax.set_xlabel(self.xlabel)
        ylabel = self.ylabel
        sec_ylabel = self.secondary_ylabel
        if sec_ax is not None:
            if ylabel is None:
                ylabel = " ".join(c for c in plotted if c not in secondary)
            if sec_ylabel is None:
                sec_ylabel = " ".join(c for c in plotted if c in secondary)
            if sec_ylabel:
                sec_ax.set_ylabel(sec_ylabel)
        if ylabel:
            ax.set_ylabel(ylabel)
        handles, labels = ax.get_legend_handles_labels()
        if sec_ax is not None:
            h2, l2 = sec_ax.get_legend_handles_labels()
            handles, labels = handles + h2, labels + l2
        if self.legend and handles:
            ax.legend(handles, labels,
                      **{**self._LEGEND_OUTSIDE_KWARGS,
                         "bbox_to_anchor": (1.08, 0.5),
                         **self.legend_kwargs})
        return ax


# ---------------------------------------------------------------------------
# G3: ternary visible-region geometry (driver-side, data-independent)
# ---------------------------------------------------------------------------


def clip_convex(vertices: list[tuple], axis: int, bound: float,
                keep_upper: bool) -> list[tuple]:
    """One Sutherland–Hodgman half-plane pass over barycentric vertices:
    keep points with ``v[axis] >= bound`` (or ``<=`` when not keep_upper),
    inserting exact edge intersections (ref ``_plotting.py:361-381``)."""
    out: list[tuple] = []
    for i, cur in enumerate(vertices):
        prev = vertices[i - 1]

        def inside(p):
            return p[axis] >= bound if keep_upper else p[axis] <= bound

        def cross(a, b):
            f = (bound - a[axis]) / (b[axis] - a[axis])
            return tuple(ai + f * (bi - ai) for ai, bi in zip(a, b))

        if inside(cur):
            if vertices and not inside(prev):
                out.append(cross(prev, cur))
            out.append(cur)
        elif inside(prev):
            out.append(cross(prev, cur))
    return out


def ternary_region(tlim=None, llim=None, rlim=None,
                   ternary_sum: float = 100.0) -> list[tuple]:
    """Exact visible-region polygon of a limit-clipped ternary plot, as
    (t, left, r) vertices in boundary order (ref ``_plotting.py:384-420``;
    exact clipping, so mpltern's rectangle-fit bug cannot occur)."""
    verts = [
        (ternary_sum, 0.0, 0.0),
        (0.0, 0.0, ternary_sum),
        (0.0, ternary_sum, 0.0),
    ]
    for axis, lim in ((0, tlim), (1, llim), (2, rlim)):
        if lim is None:
            continue
        lo, hi = lim
        verts = clip_convex(verts, axis, lo, keep_upper=True)
        verts = clip_convex(verts, axis, hi, keep_upper=False)
    return verts


# ---------------------------------------------------------------------------
# G4: dual-axis split-gap compression (pure computation; the matplotlib
# wiring applies the returned limits)
# ---------------------------------------------------------------------------


def split_gap_limits(lo_data: tuple[float, float], hi_data: tuple[float, float],
                     lo_lim: tuple[float, float], hi_lim: tuple[float, float],
                     gap_fraction: float = 0.05):
    """Compute compressed y-limits for a dual-axis profile plot whose two
    data ranges do not overlap (ref ``_plotting.py:974-1014``): each axis
    gets a height band proportional to its autoscaled span, separated by a
    fixed gap, so the empty middle is compressed.  Returns
    ``(lo_ylim, hi_ylim)`` or ``None`` when the ranges overlap or an axis
    span is degenerate (leave autoscale alone)."""
    if not (lo_data[1] <= hi_data[0]):
        return None
    lo_span = lo_lim[1] - lo_lim[0]
    hi_span = hi_lim[1] - hi_lim[0]
    if lo_span <= 0 or hi_span <= 0:
        return None
    available = 1.0 - gap_fraction
    lo_frac = available * lo_span / (lo_span + hi_span)
    hi_frac = available - lo_frac
    return (
        (lo_lim[0], lo_lim[0] + lo_span / lo_frac),
        (hi_lim[1] - hi_span / hi_frac, hi_lim[1]),
    )
