"""Parquet I/O for Tables — the scale-native format of this engine.

Column-level unit metadata rides in ``StructField.metadata``, which Spark
persists in its parquet schema property and restores on read — no sidecar
needed for units.  Table-level metadata (name, destinations, transposed,
origin description) goes to a ``_pdtable_meta.json`` sidecar inside the
output directory (same pattern as Spark's own ``_SUCCESS`` marker files;
readable without Spark).

Beyond the reference surface (its formats are CSV/Excel/JSON —
``pdtable/io``); this is SURVEY §7.11's "partition-aware writes" piece:
``partition_by`` produces hive-style directory partitioning that Spark's
reader prunes on, and ``bucket_by`` co-locates join keys via a managed
table.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import List, Optional

from pyspark.sql import SparkSession

_META_FILE = "_pdtable_meta.json"


def read_nanos_parquet(spark: SparkSession, path: str, ts_col: str = "ts"):
    """Read parquet whose ``ts_col`` is TIMESTAMP(NANOS) — which Spark's
    vectorized reader rejects — as microsecond timestamps.

    Reader-scoped concern (kept out of query code): flips the session's
    ``nanosAsLong`` reader conf, reads the ns epoch as long, and truncates
    to µs with integer ``div`` (the ns epoch exceeds double's exact-int
    range, so no float path).  ``get_session`` also sets the conf by
    default; this helper makes the read correct under any caller-built
    session (driver harness, notebooks)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get(ts_col) == "bigint":
        df = df.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    return df


def write_parquet(
    table,
    path: str,
    mode: str = "error",
    partition_by: Optional[List[str]] = None,
) -> None:
    """Write a Table to a parquet directory, preserving all metadata.

    ``partition_by`` columns become hive-style directories — at 100 TB the
    difference between scanning everything and partition pruning.
    """
    writer = table.df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)

    meta = {
        "name": table.name,
        "destinations": sorted(table.destinations),
        "transposed": table.metadata.transposed,
        "origin": str(table.origin) if table.origin is not None else None,
        "units": {c: table.column_metadata[c].unit for c in table.column_names},
    }
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f, indent=1)


def read_parquet(spark: SparkSession, path: str):
    """Read a Table back from a parquet directory written by
    :func:`write_parquet` (or any parquet — metadata degrades gracefully to
    dtype-inferred units and the directory stem as name)."""
    from pdtable_spark.frame import attach_units
    from pdtable_spark.model.metadata import TableMetadata
    from pdtable_spark.table import Table

    df = spark.read.parquet(path)
    meta_path = os.path.join(path, _META_FILE)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            m = json.load(f)
        # partition columns lose field metadata on write; units sidecar
        # restores them (and anything else parquet dropped)
        df = attach_units(df, unit_map={k: v for k, v in m["units"].items() if k in df.columns})
        return Table(
            df,
            metadata=TableMetadata(
                name=m["name"],
                destinations=set(m["destinations"]),
                transposed=m.get("transposed", False),
            ),
        )
    return Table(df, name=Path(path).stem)
