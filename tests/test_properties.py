"""Property-based tests (hypothesis) for the pure driver-side layers.

Three families:
  * sqlgen combinators — the dual-dialect expression builders must agree
    bit-for-bit with a Python reference evaluation; checked by executing
    the DuckDB rendering against random inputs (no Spark session needed,
    same SQL text Spark executes for the plain-identifier subset).
  * geometry — ternary convex clipping and the dual-axis gap compression.
  * auto-split — the contiguous-split shortcut must equal exhaustive
    search over all 2-partitions (the 1-D k-means property the
    implementation relies on).
"""

from __future__ import annotations

import itertools
import math
from functools import reduce

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from petropandas_spark.io import best_two_partition
from petropandas_spark.plotting import (
    clip_convex,
    split_gap_limits,
    ternary_region,
)
from petropandas_spark.sqlgen import (
    add_chain,
    clip,
    flit,
    safe_denom,
    where_positive,
)

finite = st.floats(allow_nan=False, allow_infinity=False, width=64)
small = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _eval(con, expr: str) -> float:
    return con.sql(f"SELECT {expr} AS v").fetchone()[0]


class TestSqlgenCombinators:
    @given(finite)
    @settings(max_examples=200, deadline=None)
    def test_flit_roundtrips_exactly(self, con, x):
        got = _eval(con, flit(x))
        assert got == x and math.copysign(1, got) == math.copysign(1, x)

    def test_flit_specials(self, con):
        assert math.isnan(_eval(con, flit(float("nan"))))
        assert _eval(con, flit(float("inf"))) == float("inf")
        assert _eval(con, flit(float("-inf"))) == float("-inf")

    @given(st.lists(small, max_size=8))
    @settings(max_examples=100, deadline=None)
    def test_add_chain_is_left_fold(self, con, xs):
        expected = reduce(lambda a, b: a + b, xs, 0.0) if xs else 0.0
        got = _eval(con, add_chain([flit(x) for x in xs]))
        if xs:
            # bit-exact: textual order fixes the FP evaluation order
            assert got == reduce(lambda a, b: a + b, xs)
        else:
            assert got == expected

    @given(small, small, small)
    @settings(max_examples=100, deadline=None)
    def test_clip_matches_python(self, con, x, lo, hi):
        lo, hi = min(lo, hi), max(lo, hi)
        got = _eval(con, clip(flit(x), lo, hi))
        assert got == min(max(x, lo), hi)

    @given(small)
    @settings(max_examples=50, deadline=None)
    def test_safe_denom(self, con, x):
        got = _eval(con, safe_denom(flit(x)))
        assert got == (1.0 if x == 0.0 else x)

    @given(small, small, small)
    @settings(max_examples=50, deadline=None)
    def test_where_positive(self, con, v, subject, otherwise):
        got = _eval(
            con, where_positive(flit(v), flit(subject), otherwise)
        )
        assert got == (v if subject > 0 else otherwise)


coord = st.floats(min_value=0.0, max_value=100.0, allow_nan=False)


class TestTernaryGeometry:
    @given(
        st.tuples(coord, coord).map(sorted),
        st.tuples(coord, coord).map(sorted),
        st.tuples(coord, coord).map(sorted),
    )
    @settings(max_examples=100, deadline=None)
    def test_region_stays_in_simplex_and_limits(self, tlim, llim, rlim):
        verts = ternary_region(tlim=tlim, llim=llim, rlim=rlim)
        eps = 1e-9
        for v in verts:
            assert abs(sum(v) - 100.0) < 1e-6
            for (lo, hi), x in zip((tlim, llim, rlim), v):
                assert lo - eps <= x <= hi + eps

    @given(st.integers(min_value=0, max_value=2),
           st.floats(min_value=-50, max_value=-1))
    @settings(max_examples=25, deadline=None)
    def test_nonbinding_clip_is_identity(self, axis, bound):
        tri = [(100.0, 0.0, 0.0), (0.0, 0.0, 100.0), (0.0, 100.0, 0.0)]
        assert clip_convex(tri, axis, bound, keep_upper=True) == tri

    @given(st.integers(min_value=0, max_value=2), coord)
    @settings(max_examples=50, deadline=None)
    def test_clip_output_satisfies_halfplane(self, axis, bound):
        tri = [(100.0, 0.0, 0.0), (0.0, 0.0, 100.0), (0.0, 100.0, 0.0)]
        for keep_upper in (True, False):
            out = clip_convex(tri, axis, bound, keep_upper)
            for v in out:
                if keep_upper:
                    assert v[axis] >= bound - 1e-9
                else:
                    assert v[axis] <= bound + 1e-9


pos_span = st.tuples(
    st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
    st.floats(min_value=1e-3, max_value=1e3, allow_nan=False),
)


class TestSplitGapLimits:
    @given(pos_span, pos_span, st.floats(min_value=0.01, max_value=0.3))
    @settings(max_examples=100, deadline=None)
    def test_invariants(self, lo, hi, gap):
        lo_lim = (lo[0], lo[0] + lo[1])
        # place the hi range strictly above the lo range
        hi_lo = lo_lim[1] + 1.0
        hi_lim = (hi_lo, hi_lo + hi[1])
        out = split_gap_limits(lo_lim, hi_lim, lo_lim, hi_lim,
                               gap_fraction=gap)
        assert out is not None
        (lo0, lo1), (hi0, hi1) = out
        # anchored ends preserved; data ranges contained
        assert lo0 == lo_lim[0] and hi1 == hi_lim[1]
        assert lo1 >= lo_lim[1] - 1e-9 and hi0 <= hi_lim[0] + 1e-9
        # fractional heights sum to 1 - gap
        frac = (lo_lim[1] - lo_lim[0]) / (lo1 - lo0) + (
            hi_lim[1] - hi_lim[0]
        ) / (hi1 - hi0)
        assert abs(frac - (1.0 - gap)) < 1e-9

    def test_overlap_returns_none(self):
        assert split_gap_limits((0, 2), (1, 3), (0, 2), (1, 3)) is None


def _variance(xs):
    """Same objective as io._variance (and the reference): squared
    deviations divided by group size — NOT raw SSE."""
    if not xs:
        return 0.0
    m = sum(xs) / len(xs)
    return sum((x - m) ** 2 for x in xs) / len(xs)


class TestAutoSplitOptimality:
    @given(st.lists(st.floats(min_value=-100, max_value=100,
                              allow_nan=False),
                    min_size=2, max_size=8))
    @settings(max_examples=150, deadline=None)
    def test_contiguous_equals_exhaustive(self, vals):
        means = {f"c{i}": v for i, v in enumerate(vals)}
        secondary = best_two_partition(means)
        cols = list(means)
        chosen = _variance([means[c] for c in cols if c not in secondary]
                           ) + _variance([means[c] for c in secondary])
        best = min(
            _variance([means[c] for c in sub])
            + _variance([means[c] for c in cols if c not in sub])
            for k in range(1, len(cols))
            for sub in itertools.combinations(cols, k)
        )
        assert chosen <= best + 1e-7 * max(1.0, abs(best))

    def test_secondary_never_contains_first_column(self):
        means = {"a": 1.0, "b": 2.0, "c": 50.0}
        assert "a" not in best_two_partition(means)
