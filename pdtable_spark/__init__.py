"""pdtable_spark — a PySpark-native analytics engine with the capabilities of
startable/pdtable (the StarTable data format), rebuilt Spark-first.

The reference (pdtable v1.0.1) is a pandas-based table model + multi-format I/O
stack.  This package re-expresses that surface over ``pyspark.sql.DataFrame``:

- ``Table`` wraps an immutable Spark DataFrame plus StarTable metadata
  (name, destinations, per-column units, origin lineage).  Column units live in
  ``StructField.metadata`` so they survive raw DataFrame projections.
- Parsing (the StarTable block format) is pure Python and runs either on the
  driver (small inputs) or inside executors via ``flatMap`` (many files).
- Relational operations are thin, metadata-preserving wrappers over native
  Spark ops — Catalyst does the optimizing; we do the unit bookkeeping.

Reference citations in docstrings are ``path:line`` into /root/reference.
"""

from pdtable_spark.model.metadata import (
    ColumnFormat,
    ColumnMetadata,
    ColumnUnitException,
    TableMetadata,
)
from pdtable_spark.model.origin import (
    InputError,
    InputIssue,
    InputIssueTracker,
    NullInputIssueTracker,
    TableOrigin,
)
from pdtable_spark.parsers.blocks import BlockType, make_table
from pdtable_spark.parsers.fixer import ParseFixer
from pdtable_spark.store import Bundle, TableBundle, TableNameNotUniqueInBundleError
from pdtable_spark.table import Column, Table
from pdtable_spark.io.csv import read_csv, scan_csv, write_csv, write_csv_distributed
from pdtable_spark.io.excel import read_excel, write_excel
from pdtable_spark.io.json import json_data_to_table, table_to_json_data
from pdtable_spark.io.load import load_files, make_location_trees
from pdtable_spark.io.parquet import read_parquet, write_parquet
from pdtable_spark.session import get_session
from pdtable_spark.utils import read_bundle_from_csv

__version__ = "0.1.0"

__all__ = [
    "BlockType",
    "Bundle",
    "Column",
    "ColumnFormat",
    "ColumnMetadata",
    "ColumnUnitException",
    "InputError",
    "InputIssue",
    "InputIssueTracker",
    "NullInputIssueTracker",
    "ParseFixer",
    "Table",
    "TableBundle",
    "TableMetadata",
    "TableNameNotUniqueInBundleError",
    "TableOrigin",
    "get_session",
    "json_data_to_table",
    "load_files",
    "make_location_trees",
    "make_table",
    "read_bundle_from_csv",
    "read_csv",
    "read_excel",
    "read_parquet",
    "scan_csv",
    "table_to_json_data",
    "write_csv_distributed",
    "write_excel",
    "write_parquet",
    "write_csv",
]
