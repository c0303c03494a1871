"""ORC I/O for Tables — the second columnar lake format (warehouses that
standardized on Hive/ORC read these files without conversion).

Same surface as :mod:`pdtable_spark.io.parquet` (beyond the reference —
its formats are CSV/Excel/JSON, ``pdtable/io``): Spark's native ORC
writer/reader (vectorized, predicate-pushdown-capable, hive-partitionable)
plus the ``_pdtable_meta.json`` sidecar.  Unlike parquet, ORC does not
round-trip Spark's ``StructField.metadata``, so units travel ONLY in the
sidecar — both readers restore them from there via ``attach_units``.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import List, Optional

from pyspark.sql import SparkSession

from pdtable_spark.io.parquet import _META_FILE


def write_orc(
    table,
    path: str,
    mode: str = "error",
    partition_by: Optional[List[str]] = None,
) -> None:
    """Write a Table to an ORC directory, preserving all metadata in the
    sidecar.  ``partition_by`` columns become hive-style directories that
    Spark's reader prunes on."""
    writer = table.df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
    meta = {
        "name": table.name,
        "destinations": sorted(table.destinations),
        "transposed": table.metadata.transposed,
        "origin": str(table.origin) if table.origin is not None else None,
        "units": {c: table.column_metadata[c].unit for c in table.column_names},
    }
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f, indent=1)


def read_orc(spark: SparkSession, path: str):
    """Read a Table back from an ORC directory written by :func:`write_orc`
    (or any ORC — metadata degrades gracefully to dtype-inferred units and
    the directory stem as name)."""
    from pdtable_spark.frame import attach_units
    from pdtable_spark.model.metadata import TableMetadata
    from pdtable_spark.table import Table

    df = spark.read.orc(path)
    meta_path = os.path.join(path, _META_FILE)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            m = json.load(f)
        df = attach_units(
            df, unit_map={k: v for k, v in m["units"].items() if k in df.columns}
        )
        return Table(
            df,
            metadata=TableMetadata(
                name=m["name"],
                destinations=set(m["destinations"]),
                transposed=m.get("transposed", False),
            ),
        )
    return Table(df, name=Path(path).stem)
