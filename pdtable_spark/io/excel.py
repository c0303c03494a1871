"""Excel workbook I/O for StarTable data (import-gated on openpyxl).

Parity with reference ``pdtable/io/excel.py``:
- ``read_excel``  (excel.py:28-108) — stream blocks from all sheets of an
  xlsx workbook via openpyxl ``read_only=True`` streaming; optional
  ``sheet_name_pattern`` pre-filter skips whole sheets before parsing
  (excel.py:91-99).
- ``write_excel`` (excel.py:116-212) — Table(s) or dict-of-sheets → xlsx,
  with the StarTable block layout (``**name`` / destinations / names /
  units / values), ``na_rep='-'``, transposed layout, optional styling spec
  (fonts / fills / alignment per table part).

Excel is inherently driver-sized: the writer streams rows from
``toLocalIterator`` (constant driver memory) but the workbook itself lives
on one machine.  Parallelism across *many* workbooks belongs in the load
orchestrator (one load item per file).  Without openpyxl installed, both
entry points raise an informative ImportError (reference
``test/test_optional_dependencies.py`` semantics).
"""

from __future__ import annotations

import os
import re
import warnings
from pathlib import Path
from typing import Callable, Dict, Iterable, Optional, Union

from pdtable_spark.io._represent import represent_col_elements, represent_row_elements
from pdtable_spark.model.origin import (
    FilesystemLocationFile,
    InputIssueTracker,
    LocationFile,
    NullLocationFile,
)
from pdtable_spark.parsers.blocks import BlockIterator, BlockType, parse_blocks
from pdtable_spark.parsers.fixer import ParseFixer

#: Default styling applied when ``styles=True`` (reference
#: ``io/_excel_write_helper.py:6-15`` — neutral greys + dark blue).
DEFAULT_STYLE_SPEC = {
    "table_name": {
        "font": {"color": "1F4E78", "bold": True},
        "fill": {"color": "D9D9D9"},
    },
    "destinations": {
        "font": {"color": "808080", "italic": True},
        "fill": {"color": "D9D9D9"},
    },
    "column_names": {"fill": {"color": "F2F2F2"}, "font": {"bold": True}},
    "units": {"fill": {"color": "F2F2F2"}},
}


def _openpyxl_or_none():
    try:
        import openpyxl

        return openpyxl
    except ImportError:
        return None


def read_excel(
    source: Union[str, os.PathLike, Path],
    *,
    origin: Optional[str] = None,
    location_file: Optional[LocationFile] = None,
    sheet_name_pattern: Optional[re.Pattern] = None,
    fixer: Optional[ParseFixer] = None,
    to: str = "pdtable",
    filter: Optional[Callable[[BlockType, str], bool]] = None,
    issue_tracker: Optional[InputIssueTracker] = None,
) -> BlockIterator:
    """Stream StarTable blocks from every (matching) sheet of a workbook.

    ``sheet_name_pattern`` is matched with ``.match`` (anchored at start);
    non-matching sheets are skipped before any parsing (excel.py:91-99).

    Engine: openpyxl when installed (streaming ``read_only`` mode); else the
    built-in stdlib engine (``_excel_stdlib``) — Excel I/O has no hard
    dependency.
    """
    source_is_stream = hasattr(source, "read")
    if not source_is_stream:
        source = Path(source)
    if location_file is None:
        location_file = (
            FilesystemLocationFile(local_path=source)
            if not source_is_stream
            else NullLocationFile(str(origin) if origin else "<stream>")
        )
    elif origin is not None:
        warnings.warn(f"Input 'origin': {origin} is shadowed by 'location_file'.")

    openpyxl = _openpyxl_or_none()
    if openpyxl is not None:
        wb = openpyxl.load_workbook(source, read_only=True, data_only=True, keep_links=False)
        try:
            sheet_iter = ((ws.title, ws.iter_rows(values_only=True)) for ws in wb.worksheets)
            yield from _parse_sheets(
                sheet_iter, sheet_name_pattern, location_file, fixer, to, filter, issue_tracker
            )
        finally:
            wb.close()
    else:
        from pdtable_spark.io._excel_stdlib import read_sheets

        yield from _parse_sheets(
            read_sheets(source), sheet_name_pattern, location_file, fixer, to, filter,
            issue_tracker,
        )


def _parse_sheets(
    sheet_iter, sheet_name_pattern, location_file, fixer, to, filter, issue_tracker
) -> BlockIterator:
    for title, row_iter in sheet_iter:
        if sheet_name_pattern is not None and sheet_name_pattern.match(title) is None:
            continue
        yield from parse_blocks(
            row_iter,
            location_sheet=location_file.make_location_sheet(title),
            fixer=fixer,
            to=to,
            filter=filter,
            issue_tracker=issue_tracker,
        )


def write_excel(
    tables,
    to: Union[str, os.PathLike, Path],
    na_rep: str = "-",
    sep_lines: int = 1,
    styles: Union[bool, Dict] = False,
    backend: str = "openpyxl",
) -> None:
    """Write Table(s) to an xlsx workbook (excel.py:116-212).

    ``tables`` may be a single Table, an iterable of Tables (one default
    sheet), or a ``{sheet_name: Table | Iterable[Table]}`` dict.

    ``backend`` selects the write engine (reference parity: the reference
    ships openpyxl and xlsxwriter backends, ``pdtable/io/excel.py:111-116``):

    - ``"openpyxl"`` (default): openpyxl when installed, else the stdlib
      engine (values only — a non-empty ``styles`` spec warns and is
      ignored without openpyxl);
    - ``"xlsxwriter"``: streaming writer, constant memory, styles as
      per-part workbook formats (requires xlsxwriter);
    - ``"stdlib"``: force the dependency-free engine.

    All backends share one layout source (``_table_part_rows``), so they
    are cell-value-identical and differ only in style fidelity.
    """
    from pdtable_spark.table import Table

    if isinstance(tables, Table):
        sheets: Dict[Optional[str], list] = {None: [tables]}
    elif isinstance(tables, dict):
        sheets = {
            name: [ts] if isinstance(ts, Table) else list(ts) for name, ts in tables.items()
        }
    else:
        sheets = {None: list(tables)}

    style_spec = DEFAULT_STYLE_SPEC if styles is True else (styles or None)

    if backend == "xlsxwriter":
        from pdtable_spark.io._excel_xlsxwriter import write_tables

        write_tables(sheets, str(to), na_rep, sep_lines, style_spec)
        return
    if backend not in ("openpyxl", "stdlib"):
        raise ValueError(
            f"unknown Excel write backend {backend!r}; "
            "expected 'openpyxl', 'xlsxwriter' or 'stdlib'"
        )
    openpyxl = _openpyxl_or_none() if backend == "openpyxl" else None

    if openpyxl is None:
        if style_spec:
            warnings.warn("styles require openpyxl; writing values only")
        from pdtable_spark.io._excel_stdlib import write_workbook

        out_sheets = []
        for i, (sheet_name, sheet_tables) in enumerate(sheets.items()):
            rows: list = []
            for t in sheet_tables:
                rows.extend(_table_rows(t, na_rep))
                rows.extend([[]] * sep_lines)
            out_sheets.append((sheet_name or f"Sheet{i + 1}", rows))
        write_workbook(out_sheets, str(to))
        return

    wb = openpyxl.Workbook()
    default_ws = wb.active
    first = True
    for sheet_name, sheet_tables in sheets.items():
        if first and sheet_name is None:
            ws = default_ws
        elif first:
            ws = default_ws
            ws.title = sheet_name
        else:
            ws = wb.create_sheet(title=sheet_name)
        first = False
        for t in sheet_tables:
            _append_table(ws, t, na_rep, style_spec)
            for _ in range(sep_lines):
                ws.append([])
    wb.save(str(to))


def _table_part_rows(table, na_rep: str):
    """Yield ``(part_name, cell_row)`` pairs in StarTable block layout —
    the single layout source shared by all three write engines (openpyxl,
    xlsxwriter, stdlib), so backends differ only in style fidelity."""
    cm = table.column_metadata
    names = table.column_names
    units = table.units
    fmts = [cm[c].display_format for c in names]

    def fmt(value, f):
        if isinstance(value, str) or value is None:
            return value
        if f is not None and isinstance(value, (int, float)) and not isinstance(value, bool):
            return f.format(value)
        return value

    if table.metadata.transposed:
        yield "table_name", [f"**{table.name}*"]
        yield "destinations", [" ".join(str(d) for d in sorted(table.destinations))]
        data = [tuple(r) for r in table.df.toLocalIterator()]
        for i, (name, unit, f) in enumerate(zip(names, units, fmts)):
            vals = represent_col_elements((r[i] for r in data), unit, na_rep)
            yield "values", [name, unit] + [fmt(v, f) for v in vals]
    else:
        yield "table_name", [f"**{table.name}"]
        yield "destinations", [" ".join(str(d) for d in sorted(table.destinations))]
        yield "column_names", list(names)
        yield "units", list(units)
        for row in table.df.toLocalIterator():
            vals = represent_row_elements(tuple(row), units, na_rep)
            yield "values", [fmt(v, f) for v, f in zip(vals, fmts)]


def _table_rows(table, na_rep: str) -> list:
    """StarTable block layout of one table as a list of cell rows."""
    return [row for _, row in _table_part_rows(table, na_rep)]


def _append_table(ws, table, na_rep: str, style_spec: Optional[Dict]) -> None:
    part_rows = []  # (part_name, worksheet row index 1-based)
    for part, row in _table_part_rows(table, na_rep):
        ws.append(row)
        part_rows.append((part, ws.max_row))
    if style_spec:
        _apply_styles(ws, part_rows, len(table.column_names), style_spec)


def _apply_styles(ws, part_rows, n_cols: int, style_spec: Dict) -> None:
    from openpyxl.styles import Alignment, Font, PatternFill

    for part, row_idx in part_rows:
        spec = style_spec.get(part)
        if not spec:
            continue
        for col in range(1, n_cols + 1):
            cell = ws.cell(row=row_idx, column=col)
            if "font" in spec:
                f = dict(spec["font"])
                if "color" in f:
                    f["color"] = f["color"][-6:]
                cell.font = Font(**f)
            if "fill" in spec:
                color = spec["fill"]["color"][-6:]
                cell.fill = PatternFill(start_color=color, end_color=color, fill_type="solid")
            if "alignment" in spec:
                cell.alignment = Alignment(**spec["alignment"])
