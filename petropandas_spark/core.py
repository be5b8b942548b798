"""Driver-side chemistry: formula parsing, molecular weights, ion notation.

Re-expresses the column-name type system of the reference
(``/root/reference/src/petropandas/_core.py:15-276``) without the
``periodictable`` dependency: a small tokenizer over standard IUPAC
atomic weights.  Everything here runs on the driver against
``df.columns`` only — per-row data never sees a formula parse; all
chemistry constants are folded into Catalyst literals at plan build
time (SURVEY.md §1.2 "column-name-as-schema").
"""

from __future__ import annotations

import re
from functools import lru_cache

# ---------------------------------------------------------------------------
# IUPAC conventional atomic weights (g/mol) for EMPA-relevant elements.
# Same vintage of values as the reference's periodictable dependency.
# ---------------------------------------------------------------------------

ATOMIC_WEIGHTS: dict[str, float] = {
    "H": 1.00794, "Li": 6.941, "Be": 9.012182, "B": 10.811, "C": 12.0107,
    "N": 14.0067, "O": 15.9994, "F": 18.9984032, "Na": 22.98976928,
    "Mg": 24.305, "Al": 26.9815386, "Si": 28.0855, "P": 30.973762,
    "S": 32.065, "Cl": 35.453, "K": 39.0983, "Ca": 40.078, "Sc": 44.955912,
    "Ti": 47.867, "V": 50.9415, "Cr": 51.9961, "Mn": 54.938045,
    "Fe": 55.845, "Co": 58.933195, "Ni": 58.6934, "Cu": 63.546,
    "Zn": 65.38, "Ga": 69.723, "Ge": 72.64, "As": 74.9216, "Se": 78.96,
    "Rb": 85.4678, "Sr": 87.62, "Y": 88.90585, "Zr": 91.224,
    "Nb": 92.90638, "Mo": 95.96, "Sn": 118.71, "Sb": 121.76,
    "Cs": 132.9054519, "Ba": 137.327, "La": 138.90547, "Ce": 140.116,
    "Pr": 140.90765, "Nd": 144.242, "Sm": 150.36, "Eu": 151.964,
    "Gd": 157.25, "Tb": 158.92535, "Dy": 162.5, "Ho": 164.93032,
    "Er": 167.259, "Tm": 168.93421, "Yb": 173.054, "Lu": 174.9668,
    "Hf": 178.49, "Ta": 180.94788, "W": 183.84, "Pb": 207.2,
    "Th": 232.03806, "U": 238.02891,
}

# EMPA column aliases -> standard oxide formula
# (parity with reference ``_core.py:15-32``).
ALIASES: dict[str, str] = {
    "FeO*": "FeO",
    "FeOT": "FeO",
    "FeO tot": "FeO",
    "FeOt": "FeO",
    "FeO Total": "FeO",
    "FeO(T)": "FeO",
    "Fe2O3*": "Fe2O3",
    "Fe2O3T": "Fe2O3",
    "Fe2O3 tot": "Fe2O3",
    "Fe2O3t": "Fe2O3",
    "Fe2O3 Total": "Fe2O3",
    "Fe2O3(T)": "Fe2O3",
    "H2O_PLUS": "H2O",
    "H2O+": "H2O",
    "H2OPLUS": "H2O",
    "H2OP": "H2O",
}

# ---------------------------------------------------------------------------
# Formula parsing
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"([A-Z][a-z]?)(\d*)")
_CHARGE_RE = re.compile(r"\{(\d*)([+-])\}$")


@lru_cache(maxsize=None)
def parse_formula(col: str) -> tuple[tuple[tuple[str, int], ...], int] | None:
    """Parse a column name as a chemical formula.

    Returns ``((element, count), ...), charge`` or ``None`` when the name
    is not a formula (metadata columns like ``Sample`` stay ``None``).
    Supports oxide notation (``Fe2O3``), bare elements (``F``, ``Cl``)
    and ion notation with charge (``Fe{2+}``, ``Na{+}``, ``Cl{-}``).
    """
    if not col or not isinstance(col, str):
        return None
    s = col.strip()
    charge = 0
    m = _CHARGE_RE.search(s)
    if m:
        digits, sign = m.groups()
        charge = int(digits) if digits else 1
        if sign == "-":
            charge = -charge
        s = s[: m.start()]
    if not s:
        return None
    atoms = _parse_atoms(s)
    if not atoms:
        return None
    return tuple(atoms), charge


def _parse_atoms(s: str) -> list[tuple[str, int]] | None:
    """Tokenize a formula body, supporting parenthesized groups like
    ``Ca5(PO4)3F`` (needed for normative-mineral MWs)."""
    pos = 0
    atoms: list[tuple[str, int]] = []
    while pos < len(s):
        if s[pos] == "(":
            depth, j = 1, pos + 1
            while j < len(s) and depth:
                depth += {"(": 1, ")": -1}.get(s[j], 0)
                j += 1
            if depth:
                return None
            inner = _parse_atoms(s[pos + 1 : j - 1])
            if not inner:
                return None
            m = re.match(r"\d*", s[j:])
            mult = int(m.group(0)) if m.group(0) else 1
            atoms.extend((el, n * mult) for el, n in inner)
            pos = j + m.end()
            continue
        m = _TOKEN_RE.match(s, pos)
        if not m or not m.group(1) or m.group(1) not in ATOMIC_WEIGHTS:
            return None
        count = int(m.group(2)) if m.group(2) else 1
        atoms.append((m.group(1), count))
        pos = m.end()
    return atoms


@lru_cache(maxsize=None)
def is_formula(col: str) -> bool:
    """True if *col* parses as any valid chemical formula."""
    return parse_formula(col) is not None


@lru_cache(maxsize=None)
def is_oxide(col: str) -> bool:
    """True if *col* parses as a neutral formula containing oxygen."""
    parsed = parse_formula(col)
    if parsed is None:
        return False
    atoms, charge = parsed
    return charge == 0 and any(el == "O" for el, _ in atoms)


def oxide_cols(cols) -> list[str]:
    """Columns parseable as oxides, preserving order (ref ``_core.py:56-58``)."""
    return [c for c in cols if is_oxide(c)]


def formula_cols(cols) -> list[str]:
    """Columns parseable as chemical formulas (ref ``_core.py:67-69``)."""
    return [c for c in cols if is_formula(c)]


@lru_cache(maxsize=None)
def MW(formula: str) -> float:
    """Molecular weight in g/mol (ref ``_core.py:116-126``)."""
    parsed = parse_formula(formula)
    if parsed is None:
        raise ValueError(f"not a chemical formula: {formula!r}")
    atoms, _charge = parsed
    return sum(ATOMIC_WEIGHTS[el] * n for el, n in atoms)


@lru_cache(maxsize=None)
def element_of(oxide: str) -> str:
    """Cation element symbol of an oxide (ref ``_core.py:72-86``)."""
    parsed = parse_formula(oxide)
    if parsed is None:
        raise ValueError(f"not a chemical formula: {oxide!r}")
    for el, _n in parsed[0]:
        if el != "O":
            return el
    return ""


@lru_cache(maxsize=None)
def cations_per(oxide: str) -> int:
    """Number of cation atoms per formula unit (ref ``_core.py:89-100``)."""
    parsed = parse_formula(oxide)
    if parsed is None:
        raise ValueError(f"not a chemical formula: {oxide!r}")
    return sum(n for el, n in parsed[0] if el != "O")


@lru_cache(maxsize=None)
def oxygens_per(oxide: str) -> int:
    """Number of oxygen atoms per formula unit (ref ``_core.py:103-113``)."""
    parsed = parse_formula(oxide)
    if parsed is None:
        raise ValueError(f"not a chemical formula: {oxide!r}")
    return sum(n for el, n in parsed[0] if el == "O")


# ---------------------------------------------------------------------------
# Ion helpers
# ---------------------------------------------------------------------------


def ion_name(element_symbol: str, charge: int) -> str:
    """Format an ion column name, ``Fe, 2 -> "Fe{2+}"`` (ref ``_core.py:134-148``)."""
    sign = "+" if charge > 0 else "-"
    if abs(charge) == 1:
        return f"{element_symbol}{{{sign}}}"
    return f"{element_symbol}{{{abs(charge)}{sign}}}"


@lru_cache(maxsize=None)
def parse_ion(col: str) -> tuple[str, int] | None:
    """Parse ``"Fe{2+}"`` to ``("Fe", 2)`` or None (ref ``_core.py:151-166``)."""
    parsed = parse_formula(col)
    if parsed is None:
        return None
    atoms, charge = parsed
    if charge == 0:
        return None
    if len(atoms) == 1 and atoms[0][1] == 1:
        return atoms[0][0], charge
    return None


def ion_to_oxide(element_symbol: str, charge: int) -> str:
    """Standard EMPA oxide for an element+charge (ref ``_core.py:169-183``)."""
    if charge % 2 == 0:
        n_o = charge // 2
        return f"{element_symbol}O{n_o}" if n_o > 1 else f"{element_symbol}O"
    n_o = charge
    return f"{element_symbol}2O" if n_o == 1 else f"{element_symbol}2O{n_o}"


def oxide_to_ion_col(oxide: str) -> str:
    """Oxide column name -> ion notation (ref ``_calc.py:234-249``)."""
    el = element_of(oxide)
    if not el:
        return oxide
    n_c = cations_per(oxide)
    n_o = oxygens_per(oxide)
    charge = 2 * n_o // n_c
    return ion_name(el, int(charge))


def element_symbol_from_ion(col: str) -> str | None:
    """Element symbol from an ion or oxide column name (ref ``_core.py:186-201``)."""
    result = parse_ion(col)
    if result is not None:
        return result[0]
    try:
        return element_of(col)
    except ValueError:
        return None


# Common EMPA oxidation states (ref ``_core.py:204-236``).
_ELEMENT_CHARGE: dict[str, int] = {
    "Si": 4, "Ti": 4, "Al": 3, "Cr": 3, "Fe": 2, "Mn": 2, "Mg": 2,
    "Ca": 2, "Na": 1, "K": 1, "Ba": 2, "Sr": 2, "Zn": 2, "P": 5, "V": 3,
}


def element_charge(element_symbol: str) -> int:
    """Default EMPA oxidation state; unlisted elements default to 2+."""
    return _ELEMENT_CHARGE.get(element_symbol, 2)


def detect_cols(cols, element: str) -> list[str]:
    """All column names containing *element* (ref ``_core.py:239-256``)."""
    result = []
    for col in cols:
        parsed = parse_formula(col)
        if parsed is not None and any(el == element for el, _n in parsed[0]):
            result.append(col)
    return result


def detect_col(cols, element: str) -> str:
    """First column containing *element*; KeyError if none (ref ``_core.py:259-275``)."""
    matches = detect_cols(cols, element)
    if not matches:
        raise KeyError(f"No column found for element {element!r}")
    return matches[0]


# Canonical petrological column order (ref ``_accessors.py:22-40,76-88``).
MAJOR_OXIDES = [
    "SiO2", "TiO2", "Al2O3", "Cr2O3", "Fe2O3", "FeO", "MnO", "MgO",
    "CaO", "Na2O", "K2O", "P2O5",
]
VOLATILE_COLS = ["H2O", "CO2", "F", "Cl", "S", "SO3", "LOI"]


def petro_sorted(cols) -> list[str]:
    """Sort columns petrologically: majors (fixed order), other oxides
    (alphabetical), volatiles, then everything else in original order."""
    cols = list(cols)
    majors = [c for c in MAJOR_OXIDES if c in cols]
    volatiles = [c for c in VOLATILE_COLS if c in cols]
    other_ox = sorted(
        c for c in cols
        if is_oxide(c) and c not in majors and c not in volatiles
    )
    rest = [c for c in cols if c not in majors and c not in other_ox and c not in volatiles]
    return majors + other_ox + volatiles + rest
