"""B8/B9: thermodynamic-software bulk preparation + formatted text sinks
(SURVEY.md §2.10 B8-B9, §2.1 S6).

The prep chain (V2 Fe₂O₃→FeO → B4 apatite correction → H₂O deficit →
system-column intersect → U1 to-moles → row rescale → O column → P8
reframe) is one lazy expression pipeline; the sinks collect the (tiny)
prepared table and format on the driver, like the reference
(``/root/reference/src/petropandas/_accessors.py:728-949``).

Config is read at **call time** from :mod:`petropandas_spark.config` — a
deliberate divergence from the reference, which binds ``ppconfig`` values
into signature defaults at import time (SURVEY.md §3.3/§7.4.7).
"""

from __future__ import annotations

from petropandas_spark import core
from petropandas_spark.functions.bulk import add_apatite_correction
from petropandas_spark.functions.conversions import add_fe2o3_to_feo
from petropandas_spark.minerals import Ctx
from petropandas_spark.sqlgen import Plan, add_chain, flit

# fmt: off
TC_SYSTEMS: dict[str, list[str]] = {
    "MnNCKFMASHTO": ["H2O", "SiO2", "Al2O3", "CaO", "MgO", "FeO", "K2O", "Na2O", "TiO2", "MnO", "O"],
    "NCKFMASHTO":   ["H2O", "SiO2", "Al2O3", "CaO", "MgO", "FeO", "K2O", "Na2O", "TiO2", "O"],
    "KFMASH":       ["H2O", "SiO2", "Al2O3", "MgO", "FeO", "K2O"],
    "NCKFMASHTOCr": ["H2O", "SiO2", "Al2O3", "MgO", "FeO", "K2O", "Na2O", "TiO2", "O", "Cr2O3"],
    "NCKFMASTOCr":  ["SiO2", "Al2O3", "CaO", "MgO", "FeO", "TiO2", "O", "Cr2O3"],
}

PERPLEX_SYSTEMS: dict[str, list[str]] = {
    k: [("O2" if c == "O" else c) for c in v] for k, v in TC_SYSTEMS.items()
}

MAGEMIN_SYSTEMS: dict[str, list[str]] = {
    "ig":  ["SiO2", "Al2O3", "CaO", "MgO", "FeO", "K2O", "Na2O", "TiO2", "O", "Cr2O3", "H2O"],
    "mp":  ["SiO2", "Al2O3", "CaO", "MgO", "FeO", "K2O", "Na2O", "TiO2", "O", "MnO", "H2O"],
    "mb":  ["SiO2", "Al2O3", "CaO", "MgO", "FeO", "K2O", "Na2O", "TiO2", "O", "H2O"],
    "um":  ["SiO2", "Al2O3", "MgO", "FeO", "O", "H2O", "S"],
    "ume": ["SiO2", "Al2O3", "MgO", "FeO", "O", "H2O", "S", "CaO", "Na2O"],
    "mpe": ["SiO2", "Al2O3", "CaO", "MgO", "FeO", "K2O", "Na2O", "TiO2", "O", "MnO", "H2O", "CO2", "S"],
    "mbe": ["SiO2", "Al2O3", "CaO", "MgO", "FeO", "K2O", "Na2O", "TiO2", "O", "H2O"],
    "mtl": ["SiO2", "Al2O3", "CaO", "MgO", "FeO", "Na2O"],
}
# fmt: on


def add_thermo_bulk_prep(
    plan: Plan,
    cols: list[str],
    system_cols: list[str],
    *,
    oxygen_key: str = "O",
    oxygen_mult: float = 1.0,
    use_molprop: bool = True,
    oxygen: float = 0.01,
    H2O: float = -1.0,
    carry: list[str] = (),
) -> list[str]:
    """B8 ``_thermo_bulk_prep`` as expression stages (ref
    ``_accessors.py:728-786``).  Returns the output columns in
    *system_cols* order (missing ones zero-filled)."""
    cols = add_fe2o3_to_feo(plan, cols, carry=carry)
    cols = add_apatite_correction(plan, cols, carry=carry)
    ctx = Ctx(plan, list(carry) + list(cols))

    # H2O deficit / target handling (only when absent from the input)
    if "H2O" in system_cols and "H2O" not in cols:
        ctx.let([("__t", lambda q, cs=tuple(cols): add_chain([q(c) for c in cs]))])
        if H2O == -1:
            ctx.let([("H2O", lambda q: f"GREATEST(100e0 - {q('__t')}, 0e0)")])
        else:
            h = flit(float(H2O))
            ctx.let([("H2O", lambda q: f"({h} * {q('__t')} / (100e0 - {h}))")])
        cols = cols + ["H2O"]

    use = [c for c in cols if c in set(system_cols)]
    target = flit(100.0 - oxygen * oxygen_mult)

    def mole(c):
        if use_molprop:
            return lambda q, c=c, mw=flit(core.MW(c)): f"({q(c)} / {mw})"
        return lambda q, c=c: q(c)

    ctx.let([(f"__m_{c}", mole(c)) for c in use])
    ctx.let([("__sum", lambda q: add_chain([q(f"__m_{c}") for c in use]))])
    st = plan.stage()
    st.passthrough(list(carry))
    out = []
    for c in system_cols:
        if c == oxygen_key:
            st.add(c, lambda q: flit(oxygen * oxygen_mult))
        elif c in use:
            st.add(c, lambda q, c=c: f"({q(f'__m_{c}')} / {q('__sum')} * {target})")
        else:
            st.add(c, lambda q: "0e0")
        out.append(c)
    return out


def _prep_frame(pf, system_cols, **kw):
    plan = Plan()
    add_thermo_bulk_prep(
        plan, core.formula_cols(pf.df.columns), system_cols,
        carry=pf.meta_cols, **kw
    )
    return plan.apply(pf.df), pf.meta_cols


def tc_bulk(pf, *, system: str | None = None, oxygen: float | None = None,
            H2O: float | None = None, dataframe: bool = False):
    """B9 THERMOCALC bulk script (ref ``_accessors.py:790-836``)."""
    from petropandas_spark import config as ppconfig

    system = system if system is not None else ppconfig.get("default_system")
    oxygen = oxygen if oxygen is not None else ppconfig.get("default_oxygen")
    H2O = H2O if H2O is not None else ppconfig.get("default_H2O")
    if system not in TC_SYSTEMS:
        raise ValueError(f"Invalid system: {system!r}")
    cols = TC_SYSTEMS[system]
    df, meta = _prep_frame(pf, cols, oxygen_key="O", oxygen_mult=1,
                           use_molprop=True, oxygen=oxygen, H2O=H2O)
    if dataframe:
        return df
    rows = df.collect()
    lines = ["bulk" + "".join(f"{lbl:>7}" for lbl in cols)]
    for i, r in enumerate(rows):
        label = r[meta[0]] if meta else i
        lines.append(
            "bulk" + "".join(f" {r[c]:6.3f}" for c in cols) + f"  % {label}"
        )
    return "\n".join(lines)


def perplex_bulk(pf, *, system: str | None = None, oxygen: float | None = None,
                 H2O: float | None = None, dataframe: bool = False):
    """B9 PerpleX component list (ref ``_accessors.py:844-886``)."""
    from petropandas_spark import config as ppconfig

    system = system if system is not None else ppconfig.get("default_system")
    oxygen = oxygen if oxygen is not None else ppconfig.get("default_oxygen")
    H2O = H2O if H2O is not None else ppconfig.get("default_H2O")
    if system not in PERPLEX_SYSTEMS:
        raise ValueError(f"Invalid system: {system!r}")
    cols = PERPLEX_SYSTEMS[system]
    df, _meta = _prep_frame(pf, cols, oxygen_key="O2", oxygen_mult=2,
                            use_molprop=True, oxygen=oxygen, H2O=H2O)
    if dataframe:
        return df
    r = df.collect()[0]
    lines = ["begin thermodynamic component list"]
    for c in cols:
        lines.append(
            f"{c:6s}1 {r[c]:8.5f}      0.00000      0.00000     molar amount"
        )
    lines.append("end thermodynamic component list")
    return "\n".join(lines)


def magemin_bulk(pf, *, db: str | None = None, sys_in: str | None = None,
                 oxygen: float | None = None, H2O: float | None = None,
                 title: str | None = None, comment: str = "petropandas_spark",
                 dataframe: bool = False):
    """B9 MAGEMin input file (ref ``_accessors.py:894-949``)."""
    from petropandas_spark import config as ppconfig

    db = db if db is not None else ppconfig.get("default_db")
    sys_in = sys_in if sys_in is not None else ppconfig.get("default_sys_in")
    oxygen = oxygen if oxygen is not None else ppconfig.get("default_oxygen")
    H2O = H2O if H2O is not None else ppconfig.get("default_H2O")
    if db not in MAGEMIN_SYSTEMS:
        raise ValueError(f"Invalid database: {db!r}")
    cols = MAGEMIN_SYSTEMS[db]
    df, meta = _prep_frame(pf, cols, oxygen_key="O", oxygen_mult=1,
                           use_molprop=(sys_in == "mol"), oxygen=oxygen,
                           H2O=H2O)
    if dataframe:
        return df
    lines = [
        "# HEADER",
        "title; comments; db; sysUnit; oxide; frac; frac2",
        "# BULK-ROCK COMPOSITION",
    ]
    for i, r in enumerate(df.collect()):
        label = title if title is not None else (r[meta[0]] if meta else i)
        oxides = ", ".join(cols)
        values = ", ".join(f"{r[c]:.4f}" for c in cols)
        lines.append(f"{label};{comment};{db};{sys_in};[{oxides}];[{values}];")
    return "\n".join(lines)
