"""Table- and column-level metadata for StarTable tables on Spark.

Parity with reference ``pdtable/table_metadata.py``:
- ``TableMetadata``        (table_metadata.py:17-48)
- ``ColumnFormat``         (table_metadata.py:51-69)
- ``ColumnMetadata``       (table_metadata.py:96-140)
- unit-indicator → dtype rules (io/parsers/columns.py:1-15)

The Spark twist: per-column metadata is serialized into
``StructField.metadata["pdtable"]`` so that it survives raw DataFrame
projections (``select``/``withColumn``) with no wrapper involved.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterable, Optional, Set, Union

from pyspark.sql import types as T

# Metadata key under which column info is stored in StructField.metadata.
FIELD_METADATA_KEY = "pdtable"

#: Unit indicators with fixed (non-numeric) storage type.
#: Everything else (``-``, ``kg``, ``km/h`` ...) is numeric → DoubleType.
#: Reference: io/parsers/columns.py:167-194.
_SPECIAL_UNIT_TYPES = {
    "text": T.StringType(),
    "onoff": T.BooleanType(),
    "datetime": T.TimestampType(),
}

#: Spark types considered "numeric" for unit purposes ("a number is just a
#: number" — equality ignores the int/float distinction, proxy.py:299-316).
_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


class ColumnUnitException(Exception):
    """Unit indicator is incompatible with the column's storage type.

    Reference: table_metadata.py:106-121.
    """


def spark_type_for_unit(unit: str) -> T.DataType:
    """StarTable unit indicator → Spark storage type (§1.2 of SURVEY)."""
    return _SPECIAL_UNIT_TYPES.get(unit, T.DoubleType())


def default_unit_for_spark_type(dtype: T.DataType) -> str:
    """Infer a unit indicator from a Spark type.

    Mirrors ``ColumnMetadata.from_dtype`` inference from numpy kind
    (table_metadata.py:72-93,123-128): bool → onoff, datetime → datetime,
    string → text, numeric → '-'.
    """
    if isinstance(dtype, T.BooleanType):
        return "onoff"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "datetime"
    if isinstance(dtype, T.StringType):
        return "text"
    return "-"


def is_unit_compatible(unit: str, dtype: T.DataType) -> bool:
    """strict_types check: special units must match storage type and vice
    versa (table_metadata.py:176-188).  Numeric units accept any numeric
    Spark type ("a number is just a number")."""
    if unit in _SPECIAL_UNIT_TYPES:
        expected = _SPECIAL_UNIT_TYPES[unit]
        if unit == "datetime":
            return isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType))
        return dtype == expected
    # numeric unit: any numeric type is fine; also tolerate nulls-only columns
    return isinstance(dtype, _NUMERIC_TYPES) or isinstance(dtype, T.NullType)


@dataclass
class ColumnFormat:
    """Display-format specifier (table_metadata.py:51-69).

    ``ColumnFormat(2)`` → fixed 2 decimals; ``ColumnFormat("14.2e")`` →
    arbitrary format-mini-language spec.
    """

    specifier: str

    def __init__(self, specifier: Union[int, str]):
        if isinstance(specifier, int):
            specifier = f".{specifier}f"
        self.specifier = specifier

    def format(self, value) -> str:
        return format(value, self.specifier)

    def __str__(self) -> str:
        return self.specifier

    def __eq__(self, other) -> bool:
        return isinstance(other, ColumnFormat) and self.specifier == other.specifier


@dataclass
class ColumnMetadata:
    """Per-column metadata: unit + display hints (table_metadata.py:96-140)."""

    unit: str = "-"
    display_unit: Optional[str] = None
    display_format: Optional[ColumnFormat] = None

    @classmethod
    def from_dtype(cls, dtype: T.DataType, **kwargs) -> "ColumnMetadata":
        return cls(unit=default_unit_for_spark_type(dtype), **kwargs)

    def check_dtype(self, dtype: T.DataType, col_name: str = "?") -> None:
        """Raise ColumnUnitException if unit and storage type disagree.

        Empty (NullType) columns are not checked (table_metadata.py:182-188).
        """
        if isinstance(dtype, T.NullType):
            return
        if not is_unit_compatible(self.unit, dtype):
            raise ColumnUnitException(
                f"Column '{col_name}': unit '{self.unit}' incompatible with "
                f"storage type {dtype.simpleString()}"
            )

    def update_from(self, other: "ColumnMetadata") -> None:
        """Merge display info from another instance (table_metadata.py:130-137)."""
        if other.display_unit is not None:
            self.display_unit = other.display_unit
        if other.display_format is not None:
            self.display_format = other.display_format

    def copy(self) -> "ColumnMetadata":
        return ColumnMetadata(self.unit, self.display_unit, self.display_format)

    # -- StructField.metadata round-trip ------------------------------------

    def to_field_metadata(self) -> dict:
        m: dict = {"unit": self.unit}
        if self.display_unit is not None:
            m["display_unit"] = self.display_unit
        if self.display_format is not None:
            m["display_format"] = str(self.display_format)
        return {FIELD_METADATA_KEY: m}

    @classmethod
    def from_field_metadata(cls, metadata: Optional[dict]) -> Optional["ColumnMetadata"]:
        if not metadata or FIELD_METADATA_KEY not in metadata:
            return None
        m = metadata[FIELD_METADATA_KEY]
        fmt = m.get("display_format")
        return cls(
            unit=m.get("unit", "-"),
            display_unit=m.get("display_unit"),
            display_format=ColumnFormat(fmt) if fmt is not None else None,
        )


def _parse_destinations(destinations: Union[str, Set[str], Iterable[str], None]) -> Set[str]:
    """Space-split string destinations (table_metadata.py:40-44)."""
    if destinations is None:
        return {"all"}
    if isinstance(destinations, str):
        return set(destinations.split())
    return set(destinations)


@dataclass
class TableMetadata:
    """Table-level metadata (table_metadata.py:17-48).

    Held driver-side by the ``Table`` wrapper — never shipped to executors.
    """

    name: str
    destinations: Set[str] = field(default_factory=lambda: {"all"})
    origin: Optional["TableOrigin"] = None  # noqa: F821 (model.origin)
    transposed: bool = False
    strict_types: bool = True

    def __post_init__(self):
        self.destinations = _parse_destinations(self.destinations)
        if self.origin is None:
            from pdtable_spark.model.origin import TableOrigin

            self.origin = TableOrigin()

    def copy(self) -> "TableMetadata":
        return TableMetadata(
            name=self.name,
            destinations=set(self.destinations),
            origin=self.origin,
            transposed=self.transposed,
            strict_types=self.strict_types,
        )

    def __str__(self) -> str:
        return (
            f"Table '{self.name}' for {sorted(self.destinations)}, "
            f"origin: {self.origin}"
        )
