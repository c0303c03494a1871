"""Minimal xlsx engine on the standard library (zipfile + ElementTree).

xlsx is a zip of XML parts; for StarTable purposes only cell values matter
(no formatting/formula evaluation), so a compact stdlib engine covers the
read/write surface when openpyxl is absent — the reference treats openpyxl
as an optional dependency (``test_optional_dependencies.py``), we go one
step further and keep Excel I/O working without it.

Supported on read: shared strings, inline strings, numbers, booleans,
ISO-ish dates stored as serial numbers are left numeric (StarTable datetime
columns are parsed from their *string* form by the column parsers, which is
how the reference's openpyxl path behaves for text-typed sheets).
Supported on write: strings (inline), numbers, booleans, None (empty).
"""

from __future__ import annotations

import datetime as _dt
import re
import zipfile
from typing import Any, Iterable, List, Optional, Sequence, Tuple
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_COL_RE = re.compile(r"([A-Z]+)([0-9]+)")

#: Excel serial-date epoch (1900 system, with the leap-year bug offset).
_EPOCH_1900 = _dt.datetime(1899, 12, 30)


def _col_index(ref: str) -> int:
    """'A'→0, 'B'→1, ... 'AA'→26."""
    m = _COL_RE.match(ref)
    idx = 0
    for ch in (m.group(1) if m else "A"):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _col_name(idx: int) -> str:
    name = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        name = chr(ord("A") + rem) + name
    return name


# ---------------------------------------------------------------------------
# Read
# ---------------------------------------------------------------------------


def read_sheets(path) -> Iterable[Tuple[str, Iterable[Sequence[Any]]]]:
    """Yield (sheet_name, row iterator) for every worksheet, in workbook
    order — same contract as the reference's openpyxl ``read_sheets``
    (``_excel_openpyxl.py:31-36``)."""
    with zipfile.ZipFile(path) as z:
        shared = _read_shared_strings(z)
        date_styles = _read_date_styles(z)
        for name, part in _sheet_parts(z):
            with z.open(part) as f:
                rows = _parse_sheet(f.read(), shared, date_styles)
            yield name, iter(rows)


def _read_shared_strings(z: zipfile.ZipFile) -> List[str]:
    try:
        data = z.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).iter(f"{_NS}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _read_date_styles(z: zipfile.ZipFile) -> set:
    """Style indexes whose number format is date/time-like."""
    try:
        data = z.read("xl/styles.xml")
    except KeyError:
        return set()
    root = ET.fromstring(data)
    date_fmts = {14, 15, 16, 17, 18, 19, 20, 21, 22, 45, 46, 47}
    for nf in root.iter(f"{_NS}numFmt"):
        code = (nf.get("formatCode") or "").lower()
        if any(t in code for t in ("yy", "dd", "hh", "mm:ss")):
            date_fmts.add(int(nf.get("numFmtId")))
    styles = set()
    xfs = root.find(f"{_NS}cellXfs")
    if xfs is not None:
        for i, xf in enumerate(xfs.findall(f"{_NS}xf")):
            if int(xf.get("numFmtId", "0")) in date_fmts:
                styles.add(i)
    return styles


def _sheet_parts(z: zipfile.ZipFile) -> List[Tuple[str, str]]:
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = {}
    for rel in ET.fromstring(z.read("xl/_rels/workbook.xml.rels")).iter(
        f"{_PKG_REL_NS}Relationship"
    ):
        rels[rel.get("Id")] = rel.get("Target")
    parts = []
    for sheet in wb.iter(f"{_NS}sheet"):
        target = rels.get(sheet.get(f"{_REL_NS}id"), "")
        if target.startswith("/"):
            target = target[1:]
        elif not target.startswith("xl/"):
            target = "xl/" + target
        parts.append((sheet.get("name"), target))
    return parts


def _parse_sheet(data: bytes, shared: List[str], date_styles: set) -> List[List[Any]]:
    rows: List[List[Any]] = []
    for row_el in ET.fromstring(data).iter(f"{_NS}row"):
        # honor the row's r attribute: Excel omits cell-less rows from the
        # sheet XML, but a blank row TERMINATES a StarTable block — emit the
        # gap rows (as openpyxl does) or content after a blank line would be
        # absorbed into the preceding block
        r_attr = row_el.get("r")
        if r_attr is not None:
            target = int(r_attr) - 1  # 1-based row index
            while len(rows) < target:
                rows.append([])
        row: List[Any] = []
        for c in row_el.iter(f"{_NS}c"):
            ref = c.get("r") or ""
            idx = _col_index(ref) if ref else len(row)
            while len(row) < idx:
                row.append(None)
            row.append(_cell_value(c, shared, date_styles))
        rows.append(row)
    return rows


def _cell_value(c, shared: List[str], date_styles: set):
    t = c.get("t", "n")
    v = c.find(f"{_NS}v")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return "".join(x.text or "" for x in is_el.iter(f"{_NS}t")) if is_el is not None else None
    if v is None or v.text is None:
        return None
    text = v.text
    if t == "s":
        return shared[int(text)]
    if t == "b":
        return text == "1"
    if t == "str":
        return text
    if t == "e":
        # error cells (#DIV/0!, #N/A, …): surface the error literal instead
        # of crashing in float()
        return text
    num = float(text)
    if int(c.get("s", "0") or 0) in date_styles:
        return _EPOCH_1900 + _dt.timedelta(days=num)
    return int(num) if num == int(num) else num


# ---------------------------------------------------------------------------
# Write
# ---------------------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
{sheet_overrides}
</Types>"""

#: style index 1 = built-in datetime number format (numFmtId 22)
_STYLES_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    '<fonts count="1"><font/></fonts><fills count="1"><fill><patternFill/></fill></fills>'
    '<borders count="1"><border/></borders>'
    '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
    '<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="22" applyNumberFormat="1"/></cellXfs>'
    "</styleSheet>"
)

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def write_workbook(sheets: List[Tuple[str, List[Sequence[Any]]]], path) -> None:
    """Write a workbook: sheets = [(name, rows)], cell values
    str/int/float/bool/datetime/None."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        overrides = "\n".join(
            f'<Override PartName="/xl/worksheets/sheet{i+1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(len(sheets))
        )
        z.writestr("[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides=overrides))
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/styles.xml", _STYLES_XML)

        sheet_tags = "".join(
            f'<sheet name="{escape(name)}" sheetId="{i+1}" r:id="rId{i+1}"/>'
            for i, (name, _) in enumerate(sheets)
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        rels = "".join(
            f'<Relationship Id="rId{i+1}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i+1}.xml"/>'
            for i in range(len(sheets))
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f"{rels}</Relationships>",
        )
        for i, (_, rows) in enumerate(sheets):
            z.writestr(f"xl/worksheets/sheet{i+1}.xml", _sheet_xml(rows))


def _sheet_xml(rows: List[Sequence[Any]]) -> str:
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">',
        "<sheetData>",
    ]
    for r, row in enumerate(rows, start=1):
        parts.append(f'<row r="{r}">')
        for ci, v in enumerate(row):
            if v is None:
                continue
            ref = f"{_col_name(ci)}{r}"
            if isinstance(v, bool):
                parts.append(f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>')
            elif isinstance(v, (int, float)):
                parts.append(f'<c r="{ref}"><v>{v!r}</v></c>')
            elif isinstance(v, (_dt.datetime, _dt.date)):
                dt = v if isinstance(v, _dt.datetime) else _dt.datetime(v.year, v.month, v.day)
                serial = (dt - _EPOCH_1900).total_seconds() / 86400.0
                parts.append(f'<c r="{ref}" s="1"><v>{serial!r}</v></c>')
            else:
                parts.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{escape(str(v))}</t></is></c>"
                )
        parts.append("</row>")
    parts.append("</sheetData></worksheet>")
    return "".join(parts)
