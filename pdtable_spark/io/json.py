"""Table ↔ JsonData conversion.

Parity with reference ``pdtable/io/json.py:6-40`` and ``io/_json.py:36-75``:
- ``json_data_to_table`` re-serializes the dict to a cell grid and reuses the
  table factory, preserving ParseFixer semantics (io/json.py:6-23).
- ``table_to_json_data`` emits ``{name, destinations, columns:{name:{unit,
  values}}}`` (io/json.py:26-40) — inherently driver-sized (collects).
- ``to_json_serializable`` maps NaN→null, datetime→str (io/_json.py:36-75).
"""

from __future__ import annotations

import datetime as _dt
from typing import Dict, List, Union

JsonData = Union[Dict[str, "JsonData"], List["JsonData"], str, float, int, bool, None]


def to_json_serializable(obj) -> JsonData:
    """Convert to nested dict/list/JSON-native values; NaN→None,
    datetime→ISO-ish str (io/_json.py:36-75)."""
    if obj is None or isinstance(obj, (str, int)) and not isinstance(obj, bool):
        return obj
    if isinstance(obj, bool):
        return obj
    if isinstance(obj, float):
        return obj if obj == obj else None
    if isinstance(obj, dict):
        return {k: to_json_serializable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [to_json_serializable(v) for v in obj]
    if isinstance(obj, _dt.datetime):
        return str(obj)
    if isinstance(obj, _dt.date):
        return str(obj)
    try:  # numpy scalars / arrays without importing numpy eagerly
        import numpy as np

        if isinstance(obj, np.ndarray):
            return [to_json_serializable(v) for v in obj.tolist()]
        if isinstance(obj, np.generic):
            return to_json_serializable(obj.item())
    except ImportError:  # pragma: no cover
        pass
    raise NotImplementedError(f"Not JSON-encodable: {type(obj)}")


def json_data_to_table(table_json_data: dict, spark=None, **kwargs):
    """JsonData dict → Spark-backed Table via the cell-grid factory
    (io/json.py:6-23) — the round-trip through the parser keeps fixer
    semantics available (pass ``fixer=``)."""
    from pdtable_spark.parsers.blocks import make_table

    grid = [
        [f"**{table_json_data['name']}"],
        [" ".join(table_json_data["destinations"])],
        list(table_json_data["columns"].keys()),
        [col["unit"] for col in table_json_data["columns"].values()],
    ]
    columns = [col["values"] for col in table_json_data["columns"].values()]
    grid.extend(list(map(list, zip(*columns))))
    return make_table(grid, spark=spark, **kwargs)


def table_to_json_data(table) -> JsonData:
    """Table → JsonData (io/json.py:26-40).  Driver-sized: collects the
    DataFrame; intended for bundle-scale tables."""
    rows = table.df.collect()
    names = table.column_names
    units = table.units
    return to_json_serializable(
        {
            "name": table.name,
            "destinations": {d: None for d in sorted(table.destinations)},
            "columns": {
                name: {"unit": unit, "values": [r[i] for r in rows]}
                for i, (name, unit) in enumerate(zip(names, units))
            },
        }
    )
