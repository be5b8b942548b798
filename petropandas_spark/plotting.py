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


def rewrite_eval_expr(expr: str, columns: list[str]) -> str:
    """P10: pandas ``DataFrame.eval`` dialect → Spark SQL expression text.

    * a bare column reference that is missing raises (KeyError);
    * names missing from *columns* inside a multi-term expression are
      substituted with ``0.0`` (the reference's cross-group default);
    * backtick quoting carries over unchanged (same syntax both dialects);
    * numpy function names map to Spark SQL spellings (arcsin → asin, …).
    """
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
    (x = (fr − fl)/√3, y = ft after row-normalization)."""
    t, l, r = (eval_expr(df, e) for e in (top, left, right))
    denom = t + l + r
    return df.withColumns({
        "__tern_x": (r / denom - l / denom) * F.lit(_X_SCALE),
        "__tern_y": t / denom,
    })


class BasePlot:
    """Accumulate (DataFrame, label, style) groups; compute lazily in
    Spark, collect only the plotted projection, render via matplotlib
    (ref ``_plotting.py:81-264``)."""

    def __init__(self, **kwargs):
        self._groups: list[tuple[DataFrame, str | None, dict]] = []
        self.kwargs = kwargs

    def add(self, df, label: str | None = None, **style) -> "BasePlot":
        from petropandas_spark.frame import PetroFrame

        if isinstance(df, PetroFrame):
            df = df.df
        self._groups.append((df, label, style))
        return self

    def _collected(self, exprs: list[str]):
        """Per group: select the axis expressions and collect to pandas."""
        out = []
        for df, label, style in self._groups:
            cols = [
                eval_expr(df, e).alias(f"__ax{i}") for i, e in enumerate(exprs)
            ]
            out.append((df.select(*cols).toPandas(), label, style))
        return out

    def render(self, ax=None):  # pragma: no cover - needs matplotlib
        raise NotImplementedError


class ScatterPlot(BasePlot):
    """x/y scatter; expressions in the pandas-eval dialect."""

    def __init__(self, x: str, y: str, **kwargs):
        super().__init__(**kwargs)
        self.x, self.y = x, y

    def collect(self):
        """Compute the plotted values (driver-side list of group frames)."""
        return self._collected([self.x, self.y])

    def render(self, ax=None):  # pragma: no cover - matplotlib not in container
        import matplotlib.pyplot as plt

        if ax is None:
            _fig, ax = plt.subplots()
        for pdf, label, style in self.collect():
            ax.scatter(pdf["__ax0"], pdf["__ax1"], label=label, **style)
        ax.set_xlabel(self.x)
        ax.set_ylabel(self.y)
        if any(lbl for _, lbl, _ in self._groups):
            ax.legend(loc="center left", bbox_to_anchor=(1.02, 0.5))
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

    def render(self, ax=None):  # pragma: no cover - matplotlib not in container
        import matplotlib.pyplot as plt

        if ax is None:
            _fig, ax = plt.subplots()
        for pdf, label, style in self.collect():
            ax.scatter(pdf["x"], pdf["y"], label=label, **style)
        ax.set_aspect("equal")
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
