"""Unit conversion subsystem.

Parity with reference ``pdtable/units/__init__.py`` (default-converter
registry) and ``pdtable/units/pint.py`` (courtesy pint adapter), plus the
converter *protocol* of ``proxy.py:352-369``:

    converter(value, from_unit, to_unit=<base>) -> (new_value, new_unit_str)

Scale design (SURVEY §7 watch-list "pint in cluster"): converters run **only
on the driver**.  :func:`resolve_affine` probes a converter at two points to
recover the affine transform ``y = value*factor + offset``; executors then
evaluate a plain column expression — no Python, no pint, in the hot path.
This covers every linear/affine conversion (all of pint's multiplicative
units plus offset units like °C→K); genuinely non-affine conversions (log
scales) are rejected loudly rather than silently mis-converted.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

#: Unit indicators that are not physical units (proxy.py:14; skipped by bulk
#: conversion dispatchers, error if explicitly requested).
INCONVERTIBLE_UNIT_INDICATORS = ("text", "onoff", "datetime")

_BASE_SENTINEL = "__base__"

#: Module-level default converter (reference pdtable/units/__init__.py:3).
default_converter: Optional[Callable] = None


def set_converter(converter: Optional[Callable]) -> None:
    global default_converter
    default_converter = converter


def get_converter() -> Optional[Callable]:
    return default_converter


def resolve_affine(
    converter: Callable, from_unit: str, target: Optional[str]
) -> Tuple[float, float, str]:
    """Probe ``converter`` at 0, 1 and 2 to recover ``(factor, offset,
    new_unit)`` such that ``converted = value*factor + offset``.

    ``target`` of 'base'/'__base__'/None converts to the unit's base unit
    (converter called with two args, per the protocol).  Raises ``ValueError``
    if the conversion is not affine (probe at 2 disagrees).
    """

    def probe(x: float):
        if target is None or target in ("base", _BASE_SENTINEL):
            return converter(x, from_unit)
        return converter(x, from_unit, target)

    y0, new_unit = probe(0.0)
    y1, _ = probe(1.0)
    y2, _ = probe(2.0)
    offset = float(y0)
    factor = float(y1) - offset
    if abs((2.0 * factor + offset) - float(y2)) > 1e-9 * max(1.0, abs(float(y2))):
        raise ValueError(
            f"Conversion '{from_unit}' -> '{new_unit}' is not affine; "
            "cannot be compiled to a column expression"
        )
    return factor, offset, new_unit


# ---------------------------------------------------------------------------
# Built-in converters
# ---------------------------------------------------------------------------

#: unit -> (base_unit, factor, offset): value_in_base = value*factor + offset.
#: A small engineering set so the engine works out of the box without pint.
_UNIT_TABLE = {
    # length (base m)
    "mm": ("m", 1e-3, 0.0),
    "cm": ("m", 1e-2, 0.0),
    "m": ("m", 1.0, 0.0),
    "km": ("m", 1e3, 0.0),
    # mass (base kg)
    "g": ("kg", 1e-3, 0.0),
    "kg": ("kg", 1.0, 0.0),
    "t": ("kg", 1e3, 0.0),
    # temperature (base K)
    "C": ("K", 1.0, 273.15),
    "K": ("K", 1.0, 0.0),
    # time (base s)
    "s": ("s", 1.0, 0.0),
    "min": ("s", 60.0, 0.0),
    "h": ("s", 3600.0, 0.0),
    # angle (base rad)
    "deg": ("rad", 0.017453292519943295, 0.0),
    "rad": ("rad", 1.0, 0.0),
}


def simple_converter(value, from_unit: str, to_unit: Optional[str] = None):
    """Self-contained affine converter over a small engineering unit set.

    Same protocol as the reference demo converter
    (demo/unit_converter.py:7-64) but driven by a declarative unit table.
    """
    if from_unit not in _UNIT_TABLE:
        raise KeyError(f"Unknown unit: '{from_unit}'")
    base, f_from, o_from = _UNIT_TABLE[from_unit]
    if to_unit is None or to_unit in ("base", _BASE_SENTINEL):
        to_unit = base
    if to_unit == from_unit:
        return value, from_unit
    if to_unit not in _UNIT_TABLE or _UNIT_TABLE[to_unit][0] != base:
        raise KeyError(f"Cannot convert '{from_unit}' to '{to_unit}'")
    _, f_to, o_to = _UNIT_TABLE[to_unit]
    return ((value * f_from + o_from) - o_to) / f_to, to_unit


# Canonical pint adapter lives in units/pint.py (reference-parity layout);
# re-exported here so both import paths share ONE converter and ONE lazy
# UnitRegistry (pint quantities from different registries don't mix).
from pdtable_spark.units.pint import PintUnitConverter, pint_converter  # noqa: E402,F401
