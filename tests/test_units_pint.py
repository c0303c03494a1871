"""Pint adapter tests (reference parity: pdtable/units/pint.py).

pint is not installed in this container, so the converter protocol is
driven against a minimal in-process stub registry; the ImportError path is
tested for real.
"""

import sys
import types

import pytest

from pdtable_spark.units import resolve_affine, set_converter
from pdtable_spark.units.pint import PintUnitConverter, pint_converter


def test_import_error_without_pint():
    assert "pint" not in sys.modules or not hasattr(sys.modules.get("pint"), "__file__")
    with pytest.raises(ImportError, match="pint"):
        PintUnitConverter()(1.0, "cm")


class _Q:
    """Stub pint Quantity: cm/m/degC/K only, affine conversions."""

    _TO_BASE = {"cm": ("meter", 0.01, 0.0), "m": ("meter", 1.0, 0.0),
                "degC": ("kelvin", 1.0, 273.15), "K": ("kelvin", 1.0, 0.0),
                "meter": ("meter", 1.0, 0.0), "kelvin": ("kelvin", 1.0, 0.0)}

    def __init__(self, magnitude, units):
        self.magnitude, self.units = magnitude, units

    def to_base_units(self):
        base, f, o = self._TO_BASE[self.units]
        return _Q(self.magnitude * f + o, base)

    def to(self, unit):
        b = self.to_base_units()
        base, f, o = self._TO_BASE[unit]
        if base != b.units:
            raise ValueError(f"cannot convert {self.units} to {unit}")
        return _Q((b.magnitude - o) / f, unit)


class _StubRegistry:
    Quantity = _Q


@pytest.fixture
def stub_pint(monkeypatch):
    mod = types.SimpleNamespace(UnitRegistry=_StubRegistry)
    monkeypatch.setitem(sys.modules, "pint", mod)
    conv = PintUnitConverter()
    yield conv
    set_converter(None)


def test_protocol_base_and_target(stub_pint):
    assert stub_pint(2.0, "cm") == (0.02, "meter")
    assert stub_pint(25.0, "degC") == (298.15, "kelvin")
    assert stub_pint(0.5, "m", "cm") == (50.0, "cm")
    assert stub_pint(3.0, "cm", "cm") == (3.0, "cm")


def test_registry_created_once(stub_pint):
    stub_pint(1.0, "m")
    first = stub_pint.ureg
    stub_pint(2.0, "m")
    assert stub_pint.ureg is first


def test_resolve_affine_over_pint(stub_pint):
    """The pint adapter composes with the engine's affine compiler — the
    piece that keeps pint OFF the executors (driver-side probe → column
    expression)."""
    factor, offset, new_unit = resolve_affine(stub_pint, "degC", None)
    assert (factor, offset, new_unit) == (1.0, 273.15, "kelvin")
    factor, offset, new_unit = resolve_affine(stub_pint, "cm", "m")
    assert (factor, offset, new_unit) == (0.01, 0.0, "m")


def test_singleton_exists():
    assert isinstance(pint_converter, PintUnitConverter)
