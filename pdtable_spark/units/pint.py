"""Courtesy pint-based unit converter (parity: reference
``pdtable/units/pint.py:11-74``).

A callable-class wrapper around pint implementing this package's converter
protocol (``units/__init__`` / reference ``proxy.py:352-369``)::

    converter(value, from_unit, to_unit=<base>) -> (new_value, new_unit_str)

pint is an optional dependency: importing THIS MODULE is safe without it;
the import is deferred to the first call and raises a clear ImportError.

Scale note: like every converter here, pint runs on the DRIVER only —
``resolve_affine`` probes it to recover the affine transform, and executors
evaluate a plain column expression.  All of pint's multiplicative units and
its offset units (degC → K) are affine, so the full pint registry is usable
for distributed conversion; genuinely non-affine pint conversions (log
scales, via ``Quantity.to``'s special contexts) fail the affine probe
loudly instead of mis-converting.
"""

from __future__ import annotations

from typing import Optional, Tuple

_BASE_SENTINEL = "__base__"


class PintUnitConverter:
    """Thin callable wrapper around a lazily-created pint ``UnitRegistry``.

    Instantiate once and reuse (module singleton :data:`pint_converter`
    below): pint quantities from different registry instances don't mix, so
    a process should hold exactly one registry.  Subclass and override
    :meth:`make_registry` to customize (e.g. load extra unit definitions).
    """

    def __init__(self):
        self.ureg = None  # created on first call

    def make_registry(self):
        import pint

        return pint.UnitRegistry()

    def __call__(
        self,
        value: float,
        from_unit: str,
        to_unit: Optional[str] = None,
    ) -> Tuple[float, str]:
        """Convert ``value`` from ``from_unit`` to ``to_unit`` (default: the
        unit's pint base unit, e.g. 2 'cm' → 0.02 'meter').

        Returns ``(magnitude, unit_string)`` where the unit string is
        pint's canonical spelling of the target unit.
        """
        try:
            import pint  # noqa: F401  (probe only; registry built below)
        except ImportError as err:
            raise ImportError(
                "Unable to import 'pint'. Install 'pint' to use the "
                "pint-based unit converter, or use units.simple_converter."
            ) from err

        if self.ureg is None:
            self.ureg = self.make_registry()

        q = self.ureg.Quantity(value, from_unit)
        if to_unit is None or str(to_unit) in ("base", _BASE_SENTINEL):
            out = q.to_base_units()
        elif str(to_unit) == str(from_unit):
            out = q
        else:
            out = q.to(to_unit)
        return float(out.magnitude), str(out.units)


#: Singleton for convenient use: ``from pdtable_spark.units.pint import
#: pint_converter; set_converter(pint_converter)``.
pint_converter = PintUnitConverter()
