"""Convenience helpers: bulk unit normalization at read time.

Parity with reference ``pdtable/utils.py:14-62`` (R22 in SURVEY §2.4):
``normalized_table_generator`` adapts a block stream so every TABLE block is
unit-converted per a table-name dispatcher; ``read_bundle_from_csv`` wires it
into a one-call CSV→Bundle read.

The conversion itself compiles to column expressions (see
``Table.convert_units`` / ``units.resolve_affine``), so normalization adds
zero Python to the executor path.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Iterable, Optional, TextIO, Tuple, Union

from pdtable_spark.parsers.blocks import BlockType
from pdtable_spark.store import TableBundle

#: table name -> per-column unit spec (dict/list/'base'), or None to skip
TableUnitDispatcher = Union[Dict[str, Any], Callable[[str], Any]]


def normalized_table_generator(
    block_gen: Iterable[Tuple[BlockType, Optional[Any]]],
    convert_units_to: Optional[TableUnitDispatcher] = None,
    unit_converter: Optional[Callable] = None,
):
    """Yield the block stream with every TABLE block unit-normalized.

    ``convert_units_to`` maps table name → the ``to`` argument of
    ``Table.convert_units`` (dict / list / 'base'); a ``None`` lookup leaves
    that table untouched.
    """
    for block_type, block in block_gen:
        if block is not None and block_type == BlockType.TABLE:
            table = block
            if isinstance(convert_units_to, dict):
                to_units = convert_units_to.get(table.name)
            elif callable(convert_units_to):
                to_units = convert_units_to(table.name)
            else:
                raise TypeError(
                    "Table unit dispatcher of unexpected type.",
                    type(convert_units_to),
                )
            if to_units is not None:
                table = table.convert_units(to=to_units, converter=unit_converter)
            yield block_type, table
        else:
            yield block_type, block


def read_bundle_from_csv(
    input_path: Union[str, os.PathLike, TextIO],
    sep: Optional[str] = ";",
    convert_units_to: Optional[TableUnitDispatcher] = None,
    unit_converter: Optional[Callable] = None,
) -> TableBundle:
    """Read a single CSV into a TableBundle, optionally bulk-normalizing
    units at read time (reference ``utils.py:42-62``)."""
    from pdtable_spark.io.csv import read_csv

    if convert_units_to and not unit_converter:
        from pdtable_spark.units import get_converter

        unit_converter = get_converter()
        if unit_converter is None:
            raise ValueError("No unit converter supplied.")

    inputs = read_csv(input_path, sep)
    if convert_units_to is not None:
        inputs = normalized_table_generator(inputs, convert_units_to, unit_converter)
    return TableBundle(inputs)


def plan_summary(df, executed: bool = False) -> dict:
    """Physical-plan health check for a DataFrame: shuffle-exchange count,
    broadcast/sort-merge join counts, pushed filters, and scan column widths
    — the numbers to eyeball before a 100 TB run (is the filter pushed? did
    the dimension broadcast? how many shuffles am I paying?).

    ``executed=True`` runs the frame first and reports the FINAL adaptive
    plan (AQE conversions applied); otherwise the static plan, where
    unhinted joins may still show as sort-merge.
    """
    import re

    qe = df._jdf.queryExecution()
    spark = df.sparkSession
    formatted = qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    if executed:
        df.collect()
    plan = qe.executedPlan().toString().split("== Initial Plan ==")[0]
    pushed = [p.strip() for p in re.findall(r"PushedFilters: \[([^\]]*)\]", formatted)]
    return {
        "shuffles": len(re.findall(r"Exchange hashpartitioning", plan)),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "scans_with_pushdown": sum(1 for p in pushed if p),
        "pushed_filters": [p for p in pushed if p],
        "scan_column_counts": [
            len(s.split(",")) for s in re.findall(r"ReadSchema: struct<([^>]*)>", formatted)
        ],
        "final_adaptive": executed,
    }
