"""Recording fake of the minimal matplotlib surface the render paths
touch (``subplots``, ``Axes.scatter/plot/twinx/legend``, ``rcParams``
color cycle, ``Figure.savefig``) — lets the REAL ``render()`` /
``figure()`` / ``savefig()`` code execute and be asserted on in a
container without matplotlib.  Install per-test with
:func:`install` (monkeypatch-scoped, so the refshim matplotlib used by
the parity suite is restored afterwards)."""

from __future__ import annotations

import sys
import types


class FakeHandle:
    def __init__(self, label):
        self._label = label

    def get_label(self):
        return self._label


class _DataLim:
    def __init__(self):
        self.intervaly = (0.0, 0.0)
        self._seen = False

    def update(self, ys):
        ys = [float(y) for y in ys if y == y]  # drop NaN
        if not ys:
            return
        lo, hi = min(ys), max(ys)
        if self._seen:
            lo = min(lo, self.intervaly[0])
            hi = max(hi, self.intervaly[1])
        self.intervaly = (lo, hi)
        self._seen = True


class FakeAxes:
    def __init__(self):
        self.scatters = []
        self.lines = []
        self.xlabel = None
        self.ylabel = None
        self.aspect = None
        self.legend_calls = []
        self._handles = []
        self._labels = []
        self._ylim = None
        self.dataLim = _DataLim()
        self.twin = None

    # -- artists --------------------------------------------------------
    def scatter(self, x, y, label=None, **style):
        self.scatters.append((list(x), list(y), label, style))
        if label:
            self._handles.append(FakeHandle(label))
            self._labels.append(label)
        self.dataLim.update(list(y))

    def plot(self, x, y, label=None, color=None, **style):
        self.lines.append((list(x), list(y), label, color, style))
        if label:
            self._handles.append(FakeHandle(label))
            self._labels.append(label)
        self.dataLim.update(list(y))

    # -- labels / aspect ------------------------------------------------
    def set_xlabel(self, s):
        self.xlabel = s

    def set_ylabel(self, s):
        self.ylabel = s

    def set_aspect(self, a):
        self.aspect = a

    # -- limits ----------------------------------------------------------
    def get_ylim(self):
        if self._ylim is not None:
            return self._ylim
        lo, hi = self.dataLim.intervaly
        pad = 0.05 * (hi - lo) or 0.05
        return (lo - pad, hi + pad)

    def set_ylim(self, lo, hi):
        self._ylim = (lo, hi)

    # -- legend ----------------------------------------------------------
    def legend(self, *args, **kwargs):
        self.legend_calls.append((args, kwargs))

    def get_legend_handles_labels(self):
        return list(self._handles), list(self._labels)

    def twinx(self):
        self.twin = FakeAxes()
        return self.twin


class FakeFigure:
    def __init__(self, kwargs):
        self.kwargs = kwargs
        self.savefig_calls = []

    def savefig(self, *args, **kwargs):
        self.savefig_calls.append((args, kwargs))


class _PropCycle:
    def by_key(self):
        return {"color": [f"C{i}" for i in range(10)]}


def install(monkeypatch):
    """Insert the fake ``matplotlib``/``matplotlib.pyplot`` into
    ``sys.modules`` for the duration of a test.  Returns the pyplot
    module; created figures accumulate on ``plt._figures``."""
    mpl = types.ModuleType("matplotlib")
    plt = types.ModuleType("matplotlib.pyplot")
    figures: list[tuple[FakeFigure, FakeAxes]] = []

    def subplots(**kwargs):
        pair = (FakeFigure(kwargs), FakeAxes())
        figures.append(pair)
        return pair

    plt.subplots = subplots
    plt.show = lambda: None
    plt.rcParams = {"axes.prop_cycle": _PropCycle()}
    plt._figures = figures
    mpl.pyplot = plt
    monkeypatch.setitem(sys.modules, "matplotlib", mpl)
    monkeypatch.setitem(sys.modules, "matplotlib.pyplot", plt)
    return plt
