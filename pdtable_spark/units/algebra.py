"""Unit algebra for derived columns — beyond reference parity.

The reference does NOT propagate units through arithmetic (``add_column``
just infers from dtype, frame.py:302-307); SURVEY §4 lists unit-aware
arithmetic as optional polish.  This implements the minimal useful algebra
over unit *strings*:

- multiply: ``km * kg → "km*kg"``; ``x * "-" → x``
- divide:   ``km / h → "km/h"``; ``x / x → "-"``; ``"-" / x → "1/x"``
- add/sub:  units must match exactly, else :class:`UnitMismatchError`
- special indicators (text/onoff/datetime) reject arithmetic entirely

Units stay symbolic (no dimensional analysis — ``m*km`` does not simplify);
pair with a converter (``Table.convert_units``) to normalize first when
real dimensional reasoning is needed.
"""

from __future__ import annotations

from pdtable_spark.units import INCONVERTIBLE_UNIT_INDICATORS

NO_UNIT = "-"


class UnitMismatchError(ValueError):
    """Additive arithmetic between different units."""


def _check_arith(unit: str) -> None:
    if unit in INCONVERTIBLE_UNIT_INDICATORS:
        raise UnitMismatchError(f"arithmetic not defined for '{unit}' columns")


def _wrap(u: str) -> str:
    """Parenthesize compound units when composing."""
    return f"({u})" if ("/" in u or "*" in u) else u


def mul_units(a: str, b: str) -> str:
    _check_arith(a), _check_arith(b)
    if a == NO_UNIT:
        return b
    if b == NO_UNIT:
        return a
    return f"{_wrap(a)}*{_wrap(b)}"


def div_units(a: str, b: str) -> str:
    _check_arith(a), _check_arith(b)
    if b == NO_UNIT:
        return a
    if a == b:
        return NO_UNIT
    if a == NO_UNIT:
        return f"1/{_wrap(b)}"
    return f"{_wrap(a)}/{_wrap(b)}"


def addsub_units(a: str, b: str) -> str:
    _check_arith(a), _check_arith(b)
    if a != b:
        raise UnitMismatchError(f"cannot add/subtract '{a}' and '{b}'")
    return a
