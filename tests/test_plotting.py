"""Plotting compute layer: eval-dialect rewriter (P10/G1) + ternary (G2).

Expression-eval semantics ported from the reference
(``_plotting.py:210-250``): missing-name-defaults-to-0 in multi-term
expressions, single missing name raises, backtick quoting for exotic
column names like ion notation.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from petropandas_spark import plotting


@pytest.fixture(scope="module")
def garnet_df(spark):
    return spark.createDataFrame(pd.DataFrame({
        "Prp": [10.0, 20.0], "Alm": [60.0, 50.0], "Grs": [30.0, 30.0],
        "Al{3+}": [2.0, 1.9], "Si{4+}": [3.0, 3.1],
    }))


class TestEvalRewriter:
    def test_plain_column(self, spark, garnet_df):
        out = garnet_df.select(plotting.eval_expr(garnet_df, "Prp").alias("v"))
        assert sorted(r.v for r in out.collect()) == [10.0, 20.0]

    def test_multi_term(self, spark, garnet_df):
        out = garnet_df.select(
            plotting.eval_expr(garnet_df, "Prp + Grs").alias("v")
        )
        assert sorted(r.v for r in out.collect()) == [40.0, 50.0]

    def test_missing_in_multi_term_defaults_zero(self, spark, garnet_df):
        # ref _plotting.py:219-227: "Sps+Grs" across groups without Sps
        out = garnet_df.select(
            plotting.eval_expr(garnet_df, "Sps + Grs").alias("v")
        )
        assert sorted(r.v for r in out.collect()) == [30.0, 30.0]

    def test_single_missing_raises(self, garnet_df):
        with pytest.raises(KeyError):
            plotting.eval_expr(garnet_df, "Sps")

    def test_backtick_names(self, spark, garnet_df):
        out = garnet_df.select(
            plotting.eval_expr(garnet_df, "`Al{3+}` + `Si{4+}`").alias("v")
        )
        assert sorted(round(r.v, 6) for r in out.collect()) == [5.0, 5.0]

    def test_numpy_function_names(self, spark, garnet_df):
        out = garnet_df.select(
            plotting.eval_expr(garnet_df, "sqrt(Prp) + arctan(0)").alias("v")
        )
        assert sorted(round(r.v, 6) for r in out.collect()) == [
            round(math.sqrt(10), 6), round(math.sqrt(20), 6)
        ]


class TestTernary:
    def test_projection(self, spark, garnet_df):
        proj = plotting.ternary_xy(garnet_df, "Prp", "Alm", "Grs").toPandas()
        # row 0: t=10, l=60, r=30, sum=100 → y=0.1, x=(0.3-0.6)/√3
        row = proj.sort_values("Prp").iloc[0]
        assert row["__tern_y"] == pytest.approx(0.1)
        assert row["__tern_x"] == pytest.approx((0.3 - 0.6) / math.sqrt(3))

    def test_scale_invariance(self, spark):
        a = spark.createDataFrame(pd.DataFrame(
            {"t": [1.0], "l": [2.0], "r": [3.0]}))
        b = spark.createDataFrame(pd.DataFrame(
            {"t": [10.0], "l": [20.0], "r": [30.0]}))
        pa = plotting.ternary_xy(a, "t", "l", "r").toPandas()
        pb = plotting.ternary_xy(b, "t", "l", "r").toPandas()
        assert pa["__tern_x"][0] == pytest.approx(pb["__tern_x"][0])
        assert pa["__tern_y"][0] == pytest.approx(pb["__tern_y"][0])


class TestPlots:
    def test_scatter_collect(self, spark, garnet_df):
        p = plotting.ScatterPlot("Prp", "Alm + Sps").add(garnet_df, "grp")
        (pdf, label, _style), = p.collect()
        assert label == "grp"
        assert sorted(pdf["__ax1"]) == [50.0, 60.0]  # Sps defaults to 0

    def test_ternary_collect(self, spark, garnet_df):
        p = plotting.TernaryPlot("Prp", "Alm", "Grs").add(garnet_df)
        (pdf, _label, _style), = p.collect()
        assert len(pdf) == 2
        assert (pdf["y"] <= 1.0).all()


class TestTernaryGeometry:
    def test_unclipped_triangle(self):
        verts = plotting.ternary_region()
        assert len(verts) == 3
        assert (100.0, 0.0, 0.0) in verts

    def test_single_axis_clip(self):
        # t <= 50 slices the top corner off -> quadrilateral
        verts = plotting.ternary_region(tlim=(0.0, 50.0))
        assert len(verts) == 4
        for t, l, r in verts:
            assert t <= 50.0 + 1e-9
            assert abs(t + l + r - 100.0) < 1e-9

    def test_three_axis_clip_hexagon(self):
        # [10,60] on all three axes of the sum-100 triangle: each max-limit
        # edge has two corners, e.g. (60,30,10)/(60,10,30) → hexagon
        verts = plotting.ternary_region(
            tlim=(10.0, 60.0), llim=(10.0, 60.0), rlim=(10.0, 60.0)
        )
        assert len({tuple(round(c, 6) for c in v) for v in verts}) == 6
        for v in verts:
            assert all(10.0 - 1e-9 <= c <= 60.0 + 1e-9 for c in v)

    def test_empty_region(self):
        assert plotting.ternary_region(tlim=(90.0, 100.0),
                                       llim=(90.0, 100.0)) == []


class TestSplitGap:
    def test_non_overlapping_compressed(self):
        out = plotting.split_gap_limits(
            lo_data=(0.0, 1.0), hi_data=(10.0, 12.0),
            lo_lim=(0.0, 1.0), hi_lim=(10.0, 12.0), gap_fraction=0.05,
        )
        assert out is not None
        (lo0, lo1), (hi0, hi1) = out
        # lo axis occupies the bottom band: its own span over a larger limit
        assert lo0 == 0.0 and lo1 > 1.0
        assert hi1 == 12.0 and hi0 < 10.0
        # band fractions sum to 1 - gap
        lo_frac = 1.0 / (lo1 - lo0)
        hi_frac = 2.0 / (hi1 - hi0)
        assert lo_frac + hi_frac == pytest.approx(0.95)

    def test_overlapping_left_alone(self):
        assert plotting.split_gap_limits(
            (0.0, 5.0), (4.0, 9.0), (0.0, 5.0), (4.0, 9.0)
        ) is None


class TestProfilePlot:
    def _df(self, spark):
        pdf = pd.DataFrame({
            "pos": range(10),
            "Alm": [70.0 + i for i in range(10)],
            "Prp": [12.0 + 0.1 * i for i in range(10)],
            "Sps": [8.0 - 0.2 * i for i in range(10)],
            "Grs": [3.0 + 0.05 * i for i in range(10)],
        })
        return spark.createDataFrame(pdf)

    def test_split_off_no_secondary(self, spark):
        p = plotting.ProfilePlot(index_col="pos")
        p.add(self._df(spark), label="grt")
        allowed, secondary = p.resolve_column_routing()
        assert allowed is None and secondary == set()

    def test_explicit_secondary_columns(self, spark):
        p = plotting.ProfilePlot(index_col="pos", columns=["Alm", "Prp"],
                                 secondary_columns="Sps")
        p.add(self._df(spark))
        allowed, secondary = p.resolve_column_routing()
        assert allowed == {"Alm", "Prp", "Sps"}
        assert secondary == {"Sps"}

    def test_auto_split_groups_similar_scales(self, spark):
        """Alm (~75) belongs alone opposite the small oxides — the
        variance-minimizing contiguous split; first-seen column stays
        primary (reference _auto_split semantics)."""
        p = plotting.ProfilePlot(index_col="pos", split="auto")
        p.add(self._df(spark))
        _allowed, secondary = p.resolve_column_routing()
        assert secondary == {"Prp", "Sps", "Grs"}  # Alm first-seen → primary

    def test_collect_respects_routing(self, spark):
        p = plotting.ProfilePlot(index_col="pos", columns=["Alm", "Sps"])
        p.add(self._df(spark), label="g")
        (pdf, label, _style, secondary), = p.collect()
        assert list(pdf.columns) == ["Alm", "Sps"]
        assert pdf.index.name == "pos" and len(pdf) == 10
        assert label == "g" and secondary == set()

    def test_bad_split_raises(self, spark):
        p = plotting.ProfilePlot(index_col="pos", split="bogus")
        p.add(self._df(spark))
        import pytest as _pytest

        with _pytest.raises(ValueError):
            p.resolve_column_routing()


class _FakeAx:
    def __init__(self):
        self.legend_calls = []

    def legend(self, *args, **kwargs):
        self.legend_calls.append((args, kwargs))


class TestRenderLifecycle:
    """Legend lifecycle parity (ref _plotting.py:16-19,131-208) — the
    pure-logic part, testable without matplotlib."""

    def test_legend_outside_default_and_kwargs_merge(self):
        from petropandas_spark.plotting import ScatterPlot

        p = ScatterPlot("SiO2", "MgO", legend_kwargs={"ncol": 2})
        p._groups = [(None, "grp", {})]
        ax = _FakeAx()
        p._finalize_legend(ax)
        (_, kwargs), = ax.legend_calls
        assert kwargs["loc"] == "center left"
        assert kwargs["bbox_to_anchor"] == (1.02, 0.5)
        assert kwargs["ncol"] == 2

    def test_legend_disabled(self):
        from petropandas_spark.plotting import ScatterPlot

        p = ScatterPlot("a", "b", legend=False)
        p._groups = [(None, "g", {})]
        ax = _FakeAx()
        p._finalize_legend(ax)
        assert not ax.legend_calls

    def test_no_labels_no_legend(self):
        from petropandas_spark.plotting import ScatterPlot

        p = ScatterPlot("a", "b")
        p._groups = [(None, None, {})]
        ax = _FakeAx()
        p._finalize_legend(ax)
        assert not ax.legend_calls


def test_profileplot_ignores_string_metadata_columns(spark):
    """A string metadata column must not reach SUM (ANSI cast error) or
    the plotted projection (code-review regression)."""
    import pandas as pd

    from petropandas_spark.plotting import ProfilePlot

    pdf = pd.DataFrame({
        "pos": [1, 2, 3, 4], "Sample": ["s1", "s1", "s2", "s2"],
        "MgO": [1.0, 2.0, 3.0, 4.0], "FeO": [30.0, 31.0, 29.0, 28.0],
    })
    p = ProfilePlot(index_col="pos", split="auto")
    p.add(spark.createDataFrame(pdf), label="traverse")
    _allowed, secondary = p.resolve_column_routing()
    assert secondary in ({"MgO"}, {"FeO"})
    frames = p.collect()
    assert "Sample" not in frames[0][0].columns


def test_render_style_not_mutated():
    from petropandas_spark.plotting import ProfilePlot

    p = ProfilePlot(index_col="pos")
    style = {"color": "red", "lw": 2}
    p.add(None, label="g", **style)
    # the stored dict must keep the caller's color (render filters a COPY)
    assert p._groups[0][2] == {"color": "red", "lw": 2}


class TestRenderSmoke:
    """Execute the REAL render()/figure()/savefig() paths against the
    recording fake matplotlib (tests/fake_mpl.py) — the render strings
    are driven end-to-end even though the container lacks matplotlib
    (mirrors the reference's Agg smoke style, tests/test_plotting.py)."""

    def test_scatter_render(self, spark, garnet_df, monkeypatch):
        import fake_mpl

        fake_mpl.install(monkeypatch)
        p = plotting.ScatterPlot("Prp", "Alm")
        p.add(garnet_df, label="g1")
        p.add(garnet_df, marker="x")
        ax = p.render(ax=fake_mpl.FakeAxes())
        assert len(ax.scatters) == 2
        assert ax.scatters[0][2] == "g1" and ax.scatters[1][2] is None
        assert ax.scatters[1][3] == {"marker": "x"}
        assert ax.xlabel == "Prp" and ax.ylabel == "Alm"
        (_, kwargs), = ax.legend_calls
        assert kwargs["loc"] == "center left"

    def test_scatter_figure_and_savefig(self, spark, garnet_df, monkeypatch):
        import fake_mpl

        plt = fake_mpl.install(monkeypatch)
        p = plotting.ScatterPlot("Prp", "Alm", figsize=(4, 3))
        p.add(garnet_df, label="g")
        fig, ax = p.figure()
        assert fig.kwargs == {"constrained_layout": True, "figsize": (4, 3)}
        assert len(ax.scatters) == 1
        p.savefig("out.png", dpi=150)
        saved_fig = plt._figures[-1][0]
        assert saved_fig.savefig_calls == [(("out.png",), {"dpi": 150})]
        p.show()  # render + plt.show() — must not raise

    def test_ternary_render(self, spark, garnet_df, monkeypatch):
        import fake_mpl

        fake_mpl.install(monkeypatch)
        p = plotting.TernaryPlot("Prp", "Alm", "Grs")
        p.add(garnet_df, label="grt")
        ax = p.render(ax=fake_mpl.FakeAxes())
        assert ax.aspect == "equal"
        xs, ys, label, _ = ax.scatters[0]
        assert label == "grt" and len(xs) == 2
        # x = (fr - fl)/sqrt(3) is signed; y = ft is a fraction
        assert all(abs(x) <= 1 / math.sqrt(3) for x in xs)
        assert all(0.0 <= y <= 1.0 for y in ys)

    def test_profile_render_dual_axis(self, spark, monkeypatch):
        import fake_mpl

        fake_mpl.install(monkeypatch)
        pdf = pd.DataFrame({
            "pos": range(10),
            "Alm": [70.0 + i for i in range(10)],
            "Prp": [12.0 + 0.1 * i for i in range(10)],
            "Sps": [8.0 - 0.2 * i for i in range(10)],
            "Grs": [3.0 + 0.05 * i for i in range(10)],
        })
        p = plotting.ProfilePlot(index_col="pos", split="auto")
        p.add(spark.createDataFrame(pdf), label="traverse")
        ax = p.render(ax=fake_mpl.FakeAxes())
        assert ax.twin is not None  # auto split engaged the twin axis
        assert len(ax.lines) == 1          # Alm on primary
        assert len(ax.twin.lines) == 3     # Prp/Sps/Grs on secondary
        # distinct colors from the rcParams cycle
        colors = [ln[3] for ln in ax.lines + ax.twin.lines]
        assert len(set(colors)) == 4
        # non-overlapping ranges -> gap compression set explicit limits
        assert ax._ylim is not None and ax.twin._ylim is not None
        # merged legend: one call on the primary with 4 handles
        (args, kwargs), = ax.legend_calls
        handles, labels = args
        assert len(handles) == 4
        assert kwargs["bbox_to_anchor"] == (1.08, 0.5)

    def test_profile_render_single_axis(self, spark, monkeypatch):
        import fake_mpl

        fake_mpl.install(monkeypatch)
        pdf = pd.DataFrame({
            "pos": [1, 2, 3], "MgO": [1.0, 2.0, 3.0], "FeO": [4.0, 5.0, 6.0],
        })
        p = plotting.ProfilePlot(index_col="pos", xlabel="dist",
                                 ylabel="wt%")
        p.add(spark.createDataFrame(pdf))
        ax = p.render(ax=fake_mpl.FakeAxes())
        assert ax.twin is None
        assert len(ax.lines) == 2
        assert ax.xlabel == "dist" and ax.ylabel == "wt%"
