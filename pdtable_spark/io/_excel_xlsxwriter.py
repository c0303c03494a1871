"""xlsxwriter write backend for :func:`pdtable_spark.io.excel.write_excel`
(backend parity: the reference ships openpyxl + xlsxwriter engines,
``pdtable/io/excel.py:116`` / ``_excel_xlsxwriter.py``).

xlsxwriter is an optional dependency — this module imports lazily and
raises a clear ImportError from :func:`write_tables` when it is absent.
xlsxwriter is write-only and streams rows out in order (constant memory),
which is exactly the access pattern of the StarTable block layout; styles
map onto per-part ``Format`` objects (xlsxwriter formats are immutable and
registered per workbook, unlike openpyxl's per-cell mutation).
"""

from __future__ import annotations

from typing import Dict, Optional


def _formats(wb, style_spec: Optional[Dict]) -> Dict[str, object]:
    """One xlsxwriter Format per styled part (formats are workbook-scoped)."""
    out: Dict[str, object] = {}
    for part, spec in (style_spec or {}).items():
        props: Dict[str, object] = {}
        font = spec.get("font", {})
        if font.get("bold"):
            props["bold"] = True
        if font.get("italic"):
            props["italic"] = True
        if "color" in font:
            props["font_color"] = "#" + font["color"][-6:]
        if "fill" in spec:
            props["bg_color"] = "#" + spec["fill"]["color"][-6:]
        align = spec.get("alignment", {})
        if "horizontal" in align:
            props["align"] = align["horizontal"]
        if props:
            out[part] = wb.add_format(props)
    return out


def write_tables(sheets, path: str, na_rep: str, sep_lines: int, style_spec) -> None:
    """Write ``{sheet_name: [Table, ...]}`` to ``path`` via xlsxwriter.

    Same block layout as the openpyxl/stdlib engines (shared
    ``_table_rows``), so the three backends are byte-equivalent at the
    cell-value level and differ only in style fidelity.
    """
    try:
        import xlsxwriter
    except ImportError as err:
        raise ImportError(
            "Unable to import 'xlsxwriter'. Install it to use "
            "write_excel(backend='xlsxwriter'), or use the default backend."
        ) from err

    from pdtable_spark.io.excel import _table_part_rows

    wb = xlsxwriter.Workbook(path)
    try:
        fmts = _formats(wb, style_spec)
        for i, (sheet_name, sheet_tables) in enumerate(sheets.items()):
            ws = wb.add_worksheet(sheet_name or f"Sheet{i + 1}")
            r = 0
            for t in sheet_tables:
                for part, row in _table_part_rows(t, na_rep):
                    fmt = fmts.get(part)
                    for c, v in enumerate(row):
                        ws.write(r, c, v, fmt)
                    r += 1
                r += sep_lines
    finally:
        wb.close()
