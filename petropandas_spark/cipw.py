"""B6/B7: GCDkit-faithful CIPW norms as a *vectorized* Arrow-batched stage.

The reference executes the GCDkit CIPW cascade one row at a time through a
Python dict state machine (``/root/reference/src/petropandas/_calc.py:
1319-1473`` standard, ``1516-1720`` hornblende variant, runner
``1738-1767``).  Here the same published algorithm (GCDkit CIPW.r /
CIPWhb.r) is re-derived as whole-column NumPy arithmetic: every branch of
the allocation/deficiency cascade becomes a mask (``np.where``) or a
``take = minimum(deficit, budget)`` consumption, so one invocation
processes an entire Arrow batch.  Spark runs it via ``mapInPandas``
(SURVEY.md §2.12/§4.3) — the one pandas-UDF stage in the engine; ~10-100×
the reference's ``iterrows`` throughput and partition-parallel besides.

Semantic-fidelity notes (verified against the reference via the
tools/refshim oracle at 1e-9):
  * MnO merges into FeO before allocation;
  * rows whose Fe+Mg total is zero produce NaN (the reference's per-row
    exception isolation — ZeroDivisionError → NaN row);
  * the upstream GCDkit ``ab``-typo fix at ``_calc.py:1634-1635`` is
    reproduced (Ab, not a bare name, gates the edenite branch);
  * the hb variant's pre-An spinel step sees C=0 and is therefore inert,
    exactly like the reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from petropandas_spark import core

MW = core.MW

CIPW_INPUTS = [
    "SiO2", "TiO2", "Al2O3", "Fe2O3", "FeO", "MnO", "MgO", "CaO",
    "Na2O", "K2O", "H2O", "CO2", "P2O5", "F", "S",
]

CIPW_NAMES = [
    "Q", "C", "Or", "Ab", "An", "Lc", "Ne", "Kp", "Nc", "Ac", "Ns", "Ks",
    "Di", "MgDi", "FeDi", "Wo", "Hy", "En", "Fs", "Ol", "Fo", "Fa", "Dcs",
    "Mt", "Il", "Hm", "Tn", "Pf", "Ru", "Ap", "Fr", "Py", "Cc", "Sp",
    "MgSp", "FeSp", "Total",
]

CIPWHB_NAMES = CIPW_NAMES[:-1] + [
    "Bi", "MgBi", "FeBi", "Hbl", "Act", "MgAct", "FeAct",
    "Ed", "MgEd", "FeEd", "Ri", "Total",
]

# Normative molecular weights composed from oxide MWs (same construction
# as the reference so values agree bit-for-bit).
_W = {
    "Q": MW("SiO2"), "C": MW("Al2O3"),
    "Or": MW("K2O") + MW("Al2O3") + 6 * MW("SiO2"),
    "Ab": MW("Na2O") + MW("Al2O3") + 6 * MW("SiO2"),
    "An": MW("CaO") + MW("Al2O3") + 2 * MW("SiO2"),
    "Lc": MW("K2O") + MW("Al2O3") + 4 * MW("SiO2"),
    "Ne": MW("Na2O") + MW("Al2O3") + 4 * MW("SiO2"),
    "Kp": MW("K2O") + MW("Al2O3") + 2 * MW("SiO2"),
    "Nc": MW("Na2O") + MW("CO2"),
    "Ac": MW("Na2O") + MW("Fe2O3") + 4 * MW("SiO2"),
    "Ns": MW("Na2O") + MW("SiO2"), "Ks": MW("K2O") + MW("SiO2"),
    "Di": 1.0,
    "MgDi": MW("CaO") + MW("MgO") + 2 * MW("SiO2"),
    "FeDi": MW("CaO") + MW("FeO") + 2 * MW("SiO2"),
    "Wo": MW("CaO") + MW("SiO2"),
    "Hy": 1.0, "En": MW("MgO") + MW("SiO2"), "Fs": MW("FeO") + MW("SiO2"),
    "Ol": 1.0, "Fo": 2 * MW("MgO") + MW("SiO2"),
    "Fa": 2 * MW("FeO") + MW("SiO2"),
    "Dcs": MW("CaO") + 2 * MW("SiO2"),
    "Mt": MW("FeO") + MW("Fe2O3"), "Il": MW("FeO") + MW("TiO2"),
    "Hm": MW("Fe2O3"), "Tn": MW("CaO") + MW("TiO2") + MW("SiO2"),
    "Pf": MW("TiO2"), "Ru": MW("TiO2"),
    "Ap": 2.0 / 3.0 * MW("Ca5(PO4)3F"), "Fr": MW("CaF2"), "Py": MW("FeS2"),
    "Cc": MW("CaO") + MW("CO2"),
    "Sp": 1.0, "MgSp": MW("MgO") + MW("Al2O3"),
    "FeSp": MW("FeO") + MW("Al2O3"),
    "Bi": 1.0,
    "MgBi": MW("K2O") + 6 * MW("MgO") + MW("Al2O3") + 6 * MW("SiO2"),
    "FeBi": MW("K2O") + 6 * MW("FeO") + MW("Al2O3") + 6 * MW("SiO2"),
    "Hbl": 1.0, "Act": 1.0,
    "MgAct": 2 * MW("CaO") + 5 * MW("MgO") + 8 * MW("SiO2"),
    "FeAct": 2 * MW("CaO") + 5 * MW("FeO") + 8 * MW("SiO2"),
    "Ed": 1.0,
    "MgEd": 4 * MW("CaO") + 10 * MW("MgO") + MW("Na2O") + MW("Al2O3") + 14 * MW("SiO2"),
    "FeEd": 4 * MW("CaO") + 10 * MW("FeO") + MW("Na2O") + MW("Al2O3") + 14 * MW("SiO2"),
    "Ri": MW("Na2O") + MW("Fe2O3") + 3 * MW("FeO") + 8 * MW("SiO2"),
}


def _moles(pdf: pd.DataFrame) -> dict[str, np.ndarray]:
    n = len(pdf)
    out = {}
    for ox in CIPW_INPUTS:
        if ox in pdf.columns:
            out[ox] = pdf[ox].to_numpy(dtype=float) / MW(ox)
        else:
            out[ox] = np.zeros(n)
    return out


def _common_prefix(m: dict[str, np.ndarray], y: dict[str, np.ndarray],
                   cancrinite: bool):
    """Shared Ap→Fr→Py→(Nc)→Cc→Il→Or/Ks→Ab allocations; returns the
    remaining oxide-mole arrays the variants keep consuming."""
    si, ti, al = m["SiO2"].copy(), m["TiO2"].copy(), m["Al2O3"].copy()
    fe3 = m["Fe2O3"].copy()
    fe2 = m["FeO"] + m["MnO"]
    mg, ca = m["MgO"].copy(), m["CaO"].copy()
    na, k = m["Na2O"].copy(), m["K2O"].copy()
    co2, p = m["CO2"].copy(), m["P2O5"].copy()
    fl, s = m["F"].copy(), m["S"].copy()

    c_ap = ca >= 10.0 / 3.0 * p
    y["Ap"] = np.where(c_ap, p, 0.3 * ca)
    ca = np.where(c_ap, ca - y["Ap"] * 10.0 / 3.0, 0.0)

    fl = np.where((fl >= 2.0 / 3.0 * y["Ap"]) & ~np.isnan(fl),
                  fl - 2.0 / 3.0 * y["Ap"], 0.0)

    c_fr = ca >= 0.5 * fl
    y["Fr"] = np.where(c_fr, 0.5 * fl, ca)
    ca = np.where(c_fr, ca - y["Fr"], 0.0)

    ok_s = ~np.isnan(s)
    c_py = fe2 >= 0.5 * s
    y["Py"] = np.where(ok_s, np.where(c_py, 0.5 * s, fe2), 0.0)
    fe2 = np.where(ok_s, np.where(c_py, fe2 - 0.5 * s, 0.0), fe2)

    if cancrinite:
        y["Nc"] = co2.copy()
        na = na - y["Nc"]

    ok_c = ~np.isnan(co2)
    y["Cc"] = np.where(ok_c, np.minimum(ca, co2), 0.0)
    ca = np.where(ok_c, ca - y["Cc"], ca)

    y["Il"] = np.minimum(fe2, ti)
    fe2 = fe2 - y["Il"]
    ti = ti - y["Il"]

    y["Or"] = np.minimum(al, k)
    y["Ks"] = np.maximum(k - al, 0.0)
    al = al - y["Or"]
    si = si - 6.0 * y["Or"] - y["Ks"]

    y["Ab"] = np.minimum(al, na)
    al = al - y["Ab"]
    na = na - y["Ab"]
    si = si - 6.0 * y["Ab"]

    return si, ti, al, fe3, fe2, mg, ca, na


def _finish(y: dict[str, np.ndarray], names: list[str], normsum: bool,
            hb: bool) -> pd.DataFrame:
    y["En"] = y["mgr"] * y["Hy"]
    y["Fs"] = y["fer"] * y["Hy"]
    y["Fo"] = y["mgr"] * y["Ol"]
    y["Fa"] = y["fer"] * y["Ol"]
    y["MgDi"] = y["mgr"] * y["Di"]
    y["FeDi"] = y["fer"] * y["Di"]

    keys = names[:-1]
    w = {n: y[n] * _W[n] for n in keys}
    w["Di"] = w["MgDi"] + w["FeDi"]
    w["Hy"] = w["En"] + w["Fs"]
    w["Ol"] = w["Fo"] + w["Fa"]
    w["Sp"] = w["MgSp"] + w["FeSp"]
    if hb:
        w["Bi"] = w["MgBi"] + w["FeBi"]
        w["Act"] = w["MgAct"] + w["FeAct"]
        w["Ed"] = w["MgEd"] + w["FeEd"]
        w["Hbl"] = w["Act"] + w["Ed"] + w["Ri"]
        excluded = {"Di", "Hy", "Ol", "Sp", "Bi", "Hbl", "Act", "Ed"}
    else:
        excluded = {"MgDi", "FeDi", "En", "Fs", "Fo", "Fa", "MgSp", "FeSp"}

    total = sum(v for kk, v in w.items() if kk not in excluded)
    if normsum:
        w = {kk: v * 100.0 / total for kk, v in w.items()}
        total = sum(v for kk, v in w.items() if kk not in excluded)
    w["Total"] = total
    out = pd.DataFrame({n: w[n] for n in names})
    # Reference per-row exception isolation: fe2+mg == 0 raises
    # ZeroDivisionError there and the WHOLE row becomes NaN (runner
    # ``_calc.py:1752-1756``) — including the pre-mafic allocations.
    out.loc[np.asarray(y["__dead"]), :] = np.nan
    return out


def cipw_batch(pdf: pd.DataFrame, *, normsum: bool = False,
               cancrinite: bool = False, spinel: bool = False) -> pd.DataFrame:
    """Standard CIPW norm over a whole batch (wt% in → wt% out)."""
    m = _moles(pdf)
    n = len(pdf)
    y: dict[str, np.ndarray] = {k: np.zeros(n) for k in CIPW_NAMES[:-1]}
    si, ti, al, fe3, fe2, mg, ca, na = _common_prefix(m, y, cancrinite)

    # acmite / sodium metasilicate
    y["Ac"] = np.minimum(na, fe3)
    y["Ns"] = np.maximum(na - fe3, 0.0)
    fe3 = fe3 - y["Ac"]
    si = si - 4.0 * y["Ac"] - y["Ns"]

    # anorthite / corundum
    y["An"] = np.minimum(al, ca)
    y["C"] = np.maximum(al - ca, 0.0)
    ca = ca - y["An"]
    si = si - 2.0 * y["An"]

    # titanite / rutile
    y["Tn"] = np.minimum(ca, ti)
    y["Ru"] = np.maximum(ti - ca, 0.0)
    ca = ca - y["Tn"]
    si = si - y["Tn"]

    # magnetite / hematite
    y["Mt"] = np.minimum(fe2, fe3)
    y["Hm"] = np.maximum(fe3 - fe2, 0.0)
    fe2 = fe2 - y["Mt"]

    with np.errstate(divide="ignore", invalid="ignore"):
        femg = fe2 + mg
        y["fer"] = fe2 / femg
        y["mgr"] = mg / femg
    y["femg"] = femg.copy()
    y["__dead"] = femg == 0.0  # → NaN row in _finish

    if spinel:
        c_sp = (si < 45.0) & (y["femg"] <= y["C"])
        c1 = np.where(c_sp, y["C"] - y["femg"], y["C"])
        y["MgSp"] = np.where(c_sp, y["mgr"] * c1, 0.0)
        y["FeSp"] = np.where(c_sp, y["fer"] * c1, 0.0)
        y["femg"] = np.where(c_sp, y["femg"] - y["MgSp"] - y["FeSp"], y["femg"])
        y["C"] = np.where(c_sp, 0.0, y["C"])

    # diopside / wollastonite / hypersthene
    y["Di"] = np.minimum(ca, y["femg"])
    y["Wo"] = np.maximum(ca - y["femg"], 0.0)
    y["Hy"] = np.maximum(y["femg"] - ca, 0.0)
    si = si - 2.0 * y["Di"] - y["Wo"] - y["Hy"]

    # silica deficiency cascade
    y["Q"] = np.maximum(si, 0.0)
    d = np.maximum(-si, 0.0)

    t = np.minimum(d, y["Hy"] / 2.0)          # olivine from hypersthene
    y["Ol"] = t
    y["Hy"] = y["Hy"] - 2.0 * t
    d = d - t

    t = np.minimum(d, y["Tn"])                # perovskite from titanite
    y["Pf"] = t
    y["Tn"] = y["Tn"] - t
    d = d - t

    t = np.minimum(d, 4.0 * y["Ab"])          # nepheline from albite
    y["Ne"] = t / 4.0
    y["Ab"] = y["Ab"] - t / 4.0
    d = d - t

    t = np.minimum(d, 2.0 * y["Or"])          # leucite from orthoclase
    y["Lc"] = t / 2.0
    y["Or"] = y["Or"] - t / 2.0
    d = d - t

    t = np.minimum(d, y["Wo"] / 2.0)          # Ca-disilicate from wollastonite
    y["Dcs"] = t
    y["Wo"] = y["Wo"] - 2.0 * t
    d = d - t

    t = np.minimum(d, y["Di"])                # Dcs+Ol from diopside
    y["Dcs"] = y["Dcs"] + t / 2.0
    y["Ol"] = y["Ol"] + t / 2.0
    y["Di"] = y["Di"] - t
    d = d - t

    y["Kp"] = d / 2.0                         # kaliophilite from leucite
    y["Lc"] = y["Lc"] - d / 2.0

    return _finish(y, CIPW_NAMES, normsum, hb=False)


def cipwhb_batch(pdf: pd.DataFrame, *, normsum: bool = False,
                 cancrinite: bool = False, spinel: bool = False) -> pd.DataFrame:
    """CIPW norm with biotite/hornblende recasting over a whole batch."""
    m = _moles(pdf)
    n = len(pdf)
    y: dict[str, np.ndarray] = {k: np.zeros(n) for k in CIPWHB_NAMES[:-1]}
    si, ti, al, fe3, fe2, mg, ca, na = _common_prefix(m, y, cancrinite)

    # riebeckite: bound by na, fe3 and fe2/3 simultaneously
    y["Ri"] = np.minimum(na, np.minimum(fe3, fe2 / 3.0))
    na = na - y["Ri"]
    fe3 = fe3 - y["Ri"]
    fe2 = fe2 - 3.0 * y["Ri"]
    si = si - 8.0 * y["Ri"]

    y["Ns"] = na.copy()
    si = si - y["Ns"]

    y["Mt"] = np.minimum(fe2, fe3)
    y["Hm"] = np.maximum(fe3 - fe2, 0.0)
    fe2 = fe2 - y["Mt"]

    with np.errstate(divide="ignore", invalid="ignore"):
        femg = fe2 + mg
        y["fer"] = fe2 / femg
        y["mgr"] = mg / femg
    y["femg"] = femg.copy()
    y["__dead"] = femg == 0.0  # → NaN row in _finish

    # pre-An spinel step: C is still 0 here, so (femg <= C) only fires for
    # femg == 0 and every assignment is 0 — inert, as in the reference.

    y["An"] = np.minimum(al, ca)
    y["C"] = np.maximum(al - ca, 0.0)
    ca = ca - y["An"]
    si = si - 2.0 * y["An"]

    # biotite from orthoclase
    t = np.minimum(y["femg"] / 6.0, y["Or"])
    y["MgBi"] = y["mgr"] * t
    y["FeBi"] = y["fer"] * t
    y["Or"] = y["Or"] - t
    y["femg"] = y["femg"] - 6.0 * t

    # actinolite from Ca; remainder → En/Fs
    t = np.minimum(y["femg"] / 5.0, ca / 2.0)
    y["MgAct"] = y["mgr"] * t
    y["FeAct"] = y["fer"] * t
    ca = ca - 2.0 * t
    y["femg"] = y["femg"] - 5.0 * t
    y["Wo"] = ca.copy()
    y["En"] = y["mgr"] * y["femg"]
    y["Fs"] = y["fer"] * y["femg"]
    si = si - 8.0 * t - y["Wo"] - y["En"] - y["Fs"]

    y["Q"] = np.maximum(si, 0.0)
    d = np.maximum(-si, 0.0)

    # edenite from actinolite + albite (GCDkit branch structure, with the
    # upstream `ab` typo fixed: Ab gates the branch — ref _calc.py:1634-1635)
    actsum = y["MgAct"] + y["FeAct"]
    cA = actsum >= 2.0 * y["Ab"]
    ret = np.where(cA, y["Ab"] >= d / 8.0, actsum >= d / 4.0)
    ed = np.where(ret, d / 8.0, np.where(cA, y["Ab"], 0.5 * actsum))
    y["MgEd"] = y["mgr"] * ed
    y["FeEd"] = y["fer"] * ed
    y["MgAct"] = y["MgAct"] - 2.0 * y["MgEd"]
    y["FeAct"] = y["FeAct"] - 2.0 * y["FeEd"]
    y["Ab"] = y["Ab"] - ed
    d = np.where(ret, 0.0, d - 8.0 * ed)

    # olivine from En/Fs
    t = np.minimum(d, (y["En"] + y["Fs"]) / 2.0)
    y["Fo"] = y["mgr"] * t
    y["Fa"] = y["fer"] * t
    y["En"] = y["En"] - 2.0 * y["Fo"]
    y["Fs"] = y["Fs"] - 2.0 * y["Fa"]
    d = d - t

    # spinel from corundum + olivine (asymmetric GCDkit consumption rules)
    fofa = y["Fo"] + y["Fa"]
    c1 = fofa <= 0.5 * y["C"]
    inner = np.where(c1, fofa >= d, y["C"] >= 2.0 * d)
    sp_d = np.where(inner, d, np.where(c1, fofa, 0.0))  # the `2·mgr·d`-shaped takes
    mg_add = np.where(
        inner, 2.0 * y["mgr"] * d,
        np.where(c1, 2.0 * y["Fo"], 2.0 * y["mgr"] * y["C"]),
    )
    fe_add = np.where(
        inner, 2.0 * y["fer"] * d,
        np.where(c1, 2.0 * y["Fa"], 2.0 * y["fer"] * y["C"]),
    )
    c_new = np.where(
        inner, y["C"] - 2.0 * d,
        np.where(c1, y["C"] - 2.0 * fofa, 0.0),
    )
    fo_new = np.where(
        inner, y["Fo"] - y["mgr"] * d,
        np.where(c1, 0.0, y["Fo"] - 0.5 * y["mgr"] * y["C"]),
    )
    fa_new = np.where(
        inner, y["Fa"] - y["fer"] * d,
        np.where(c1, 0.0, y["Fa"] - 0.5 * y["fer"] * y["C"]),
    )
    d_new = np.where(inner, 0.0, np.where(c1, d - fofa, d - 0.5 * y["C"]))
    y["MgSp"] = y["MgSp"] + mg_add
    y["FeSp"] = y["FeSp"] + fe_add
    y["C"], y["Fo"], y["Fa"], d = c_new, fo_new, fa_new, d_new
    del sp_d

    # nepheline from albite
    t = np.minimum(d, 4.0 * y["Ab"])
    y["Ne"] = t / 4.0
    y["Ab"] = y["Ab"] - t / 4.0

    return _finish(y, CIPWHB_NAMES, normsum, hb=True)


# ---------------------------------------------------------------------------
# Spark wrapper
# ---------------------------------------------------------------------------


def cipw_norm_df(df, *, hb: bool = False, normsum: bool = False,
                 cancrinite: bool = False, spinel: bool = False,
                 id_cols: list[str] = ()):
    """Run the norm distributed: ``mapInPandas`` with a fixed full schema.

    ``id_cols`` are passed through; the data-dependent zero-column /
    NaN-row drops of the reference's runner are left to the caller
    (PetroFrame does them as a Spark agg + filter) so the batch function
    stays schema-stable and partition-independent.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    names = CIPWHB_NAMES if hb else CIPW_NAMES
    id_cols = list(id_cols)
    schema = StructType(
        [df.schema[c] for c in id_cols]
        + [StructField(n, DoubleType()) for n in names]
    )
    fn = cipwhb_batch if hb else cipw_batch

    def run(batches):
        for pdf in batches:
            out = fn(pdf, normsum=normsum, cancrinite=cancrinite, spinel=spinel)
            for c in reversed(id_cols):
                out.insert(0, c, pdf[c].to_numpy())
            yield out

    return df.mapInPandas(run, schema=schema)
