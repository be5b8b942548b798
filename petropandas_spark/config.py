"""Engine configuration (parity with the reference's ``ppconfig`` singleton,
``/root/reference/src/petropandas/_config.py:6-32``).

Deliberate divergence: the reference binds config values into function
signature defaults at import time, so later mutations don't take effect
(SURVEY.md §3.3).  Here consumers read at call time via :func:`get`, so
``set("default_db", "ig")`` affects subsequent calls — the documented
intent of a mutable config.
"""

from __future__ import annotations

_DEFAULTS = {
    "default_system": "MnNCKFMASHTO",
    "default_oxygen": 0.01,
    "default_H2O": -1.0,
    "default_db": "mp",
    "default_sys_in": "mol",
}

_state = dict(_DEFAULTS)


def get(key: str):
    return _state[key]


def set(key: str, value) -> None:  # noqa: A001 - mirrors config APIs
    if key not in _DEFAULTS:
        raise KeyError(f"unknown config key: {key!r}")
    _state[key] = value


def reset() -> None:
    """Back to defaults (ref ``PPConfig.reset``)."""
    _state.clear()
    _state.update(_DEFAULTS)
