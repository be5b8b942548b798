"""Minimal periodictable shim so the REFERENCE package can be imported
locally as a parity oracle (the container lacks the real dependency).

Implements only what ``/root/reference/src/petropandas/_core.py`` touches:
``formula(s).atoms / .mass / .charge``, the ``O`` element singleton, element
``.symbol``, and ion atoms carrying ``.charge``.  Masses come from
:mod:`petropandas_spark.core` (same IUPAC values periodictable ships).

Used by tests/tools only — never imported by the engine.
"""

from __future__ import annotations

import re
from functools import lru_cache

from petropandas_spark.core import ATOMIC_WEIGHTS


class Element:
    def __init__(self, symbol: str, mass: float, charge: int = 0):
        self.symbol = symbol
        self.mass = mass
        if charge:
            self.charge = charge

    def __repr__(self):
        return self.symbol

    def __hash__(self):
        return hash((self.symbol, getattr(self, "charge", 0)))

    def __eq__(self, other):
        return (
            isinstance(other, Element)
            and self.symbol == other.symbol
            and getattr(self, "charge", 0) == getattr(other, "charge", 0)
        )


_ELEMENTS = {s: Element(s, m) for s, m in ATOMIC_WEIGHTS.items()}
O = _ELEMENTS["O"]

_TOKEN_RE = re.compile(r"([A-Z][a-z]?)(\d*)")
_CHARGE_RE = re.compile(r"\{(\d*)([+-])\}$")


class Formula:
    def __init__(self, atoms: dict, charge: int):
        self.atoms = atoms
        self.charge = charge
        self.mass = sum(el.mass * n for el, n in atoms.items())


@lru_cache(maxsize=None)
def formula(s: str):
    if not s or not isinstance(s, str):
        raise ValueError(f"invalid formula: {s!r}")
    s = s.strip()
    charge = 0
    m = _CHARGE_RE.search(s)
    if m:
        digits, sign = m.groups()
        charge = int(digits) if digits else 1
        if sign == "-":
            charge = -charge
        s = s[: m.start()]
    if not s:
        raise ValueError("empty formula")
    atoms = _parse_group(s, s)
    if charge and len(atoms) == 1:
        (el, n), = atoms.items()
        if n == 1:
            # single-atom ion: attach the charge to the atom (periodictable
            # ion semantics used by _parse_ion)
            atoms = {Element(el.symbol, el.mass, charge): 1}
    return Formula(atoms, charge)


def _parse_group(s: str, whole: str) -> dict:
    pos, atoms = 0, {}
    while pos < len(s):
        if s[pos] == "(":
            depth, j = 1, pos + 1
            while j < len(s) and depth:
                depth += {"(": 1, ")": -1}.get(s[j], 0)
                j += 1
            if depth:
                raise ValueError(f"invalid formula: {whole!r}")
            inner = _parse_group(s[pos + 1 : j - 1], whole)
            mt = re.match(r"\d*", s[j:])
            mult = int(mt.group(0)) if mt.group(0) else 1
            for el, n in inner.items():
                atoms[el] = atoms.get(el, 0) + n * mult
            pos = j + mt.end()
            continue
        mt = _TOKEN_RE.match(s, pos)
        if not mt or not mt.group(1) or mt.group(1) not in _ELEMENTS:
            raise ValueError(f"invalid formula: {whole!r}")
        el = _ELEMENTS[mt.group(1)]
        n = int(mt.group(2)) if mt.group(2) else 1
        atoms[el] = atoms.get(el, 0) + n
        pos = mt.end()
    return atoms
