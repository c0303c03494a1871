"""Excel I/O tests (stdlib engine; openpyxl used instead when installed).

Models reference ``pdtable/test/io/test_excel.py``: round trips, multi-sheet
workbooks, transposed tables, sheet-name filtering, value types.
"""

import datetime as dt
import io
import re

import pytest

from pdtable_spark.io.csv import read_csv
from pdtable_spark.io.excel import read_excel, write_excel
from pdtable_spark.io._excel_stdlib import read_sheets, write_workbook
from pdtable_spark.parsers.blocks import BlockType
from pdtable_spark.store import TableBundle

CSV = """**places;
all
place;distance;is_hot;since
text;km;onoff;datetime
home;0.0;1;2020-01-01 00:00:00
work;14.5;0;2021-06-15 12:30:00
mars;-;0;-

"""


@pytest.fixture
def places(spark):
    return TableBundle(read_csv(io.StringIO(CSV)))["places"]


def test_stdlib_workbook_round_trip(tmp_path):
    rows = [
        ["text", 1.5, True, None, -3],
        [],
        ["<&escaped>", False, 2.0],
    ]
    write_workbook([("S1", rows), ("S2", [["x"]])], tmp_path / "wb.xlsx")
    sheets = {name: list(rit) for name, rit in read_sheets(tmp_path / "wb.xlsx")}
    assert list(sheets) == ["S1", "S2"]
    assert sheets["S1"][0] == ["text", 1.5, True, None, -3]
    assert sheets["S1"][1] == []
    assert sheets["S1"][2] == ["<&escaped>", False, 2.0]
    assert sheets["S2"] == [["x"]]


def test_styled_write_matches_reference_spec(spark, places, tmp_path):
    """Styled write parity vs the reference's documented style structure
    (reference io/excel.py:152-191): per-part font/fill/alignment land on
    the right worksheet rows.  Requires openpyxl (skipped otherwise — the
    stdlib engine is values-only and warns on a styles request)."""
    openpyxl = pytest.importorskip("openpyxl")
    from pdtable_spark.io.excel import DEFAULT_STYLE_SPEC, write_excel

    spec = dict(DEFAULT_STYLE_SPEC)
    spec["values"] = {"alignment": {"horizontal": "center"}}
    p = tmp_path / "styled.xlsx"
    write_excel(places, p, styles=spec)

    ws = openpyxl.load_workbook(p).active
    # row 1 = **name, row 2 = destinations, 3 = column names, 4 = units, 5+ = values
    name_cell = ws.cell(row=1, column=1)
    assert name_cell.font.bold and name_cell.font.color.rgb[-6:] == "1F4E78"
    assert name_cell.fill.start_color.rgb[-6:] == "D9D9D9"
    dest_cell = ws.cell(row=2, column=1)
    assert dest_cell.font.italic and dest_cell.font.color.rgb[-6:] == "808080"
    col_cell = ws.cell(row=3, column=1)
    assert col_cell.font.bold and col_cell.fill.start_color.rgb[-6:] == "F2F2F2"
    unit_cell = ws.cell(row=4, column=1)
    assert unit_cell.fill.start_color.rgb[-6:] == "F2F2F2"
    val_cell = ws.cell(row=5, column=1)
    assert val_cell.alignment.horizontal == "center"


def test_styles_warn_without_openpyxl(spark, places, tmp_path):
    """Without openpyxl the stdlib engine writes values and warns that the
    styles request is ignored."""
    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl installed; stdlib fallback not in play")
    except ImportError:
        pass
    from pdtable_spark.io.excel import read_excel, write_excel

    p = tmp_path / "plain.xlsx"
    with pytest.warns(UserWarning, match="styles require openpyxl"):
        write_excel(places, p, styles=True)
    got = TableBundle(read_excel(p))["places"]
    assert got.equals(places)


def test_stdlib_omitted_rows_and_error_cells(tmp_path):
    """Excel omits cell-less rows from sheet XML entirely; the row ``r``
    attribute must resurface them (blank rows are StarTable block
    terminators).  Error cells (t="e") surface their literal, not a crash."""
    import zipfile

    # hand-build a minimal xlsx: rows 1 and 4 present, 2-3 omitted; one error cell
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row r="1"><c r="A1" t="str"><v>top</v></c></row>'
        '<row r="4"><c r="A4" t="str"><v>after_gap</v></c>'
        '<c r="B4" t="e"><v>#DIV/0!</v></c></row>'
        "</sheetData></worksheet>"
    )
    p = tmp_path / "gap.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            "</Types>",
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            '<sheets><sheet name="S1" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
            "</Relationships>",
        )
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    sheets = {name: list(rit) for name, rit in read_sheets(p)}
    assert sheets["S1"][0] == ["top"]
    assert sheets["S1"][1] == [] and sheets["S1"][2] == []  # the omitted gap
    assert sheets["S1"][3] == ["after_gap", "#DIV/0!"]


def test_excel_table_round_trip(spark, places, tmp_path):
    write_excel(places, tmp_path / "t.xlsx")
    back = TableBundle(read_excel(tmp_path / "t.xlsx"))["places"]
    assert back.units == places.units
    assert places.equals(back)


def test_excel_transposed_round_trip(spark, tmp_path):
    csv_t = "**flipped*;\nall\na;-;1;2;3\nb;text;x;y;z\n\n"
    t = TableBundle(read_csv(io.StringIO(csv_t)))["flipped"]
    assert t.metadata.transposed
    write_excel(t, tmp_path / "t.xlsx")
    back = TableBundle(read_excel(tmp_path / "t.xlsx"))["flipped"]
    assert back.metadata.transposed
    assert t.equals(back)


def test_excel_multi_sheet_and_pattern(spark, places, tmp_path):
    write_excel({"input_a": places, "other": places}, tmp_path / "m.xlsx")
    all_blocks = [b for bt, b in read_excel(tmp_path / "m.xlsx") if bt == BlockType.TABLE]
    assert len(all_blocks) == 2
    filtered = [
        b
        for bt, b in read_excel(tmp_path / "m.xlsx", sheet_name_pattern=re.compile(r"^input_"))
        if bt == BlockType.TABLE
    ]
    assert len(filtered) == 1


def test_excel_datetime_cells(spark, places, tmp_path):
    write_excel(places, tmp_path / "d.xlsx")
    back = TableBundle(read_excel(tmp_path / "d.xlsx"))["places"]
    since = sorted(v for v in back["since"].values if v is not None)
    assert since[0] == dt.datetime(2020, 1, 1)
    assert since[1] == dt.datetime(2021, 6, 15, 12, 30)


def test_write_excel_backend_dispatch(spark, places, tmp_path):
    """Backend parity surface: 'stdlib' forces the dependency-free engine
    (cell-value-identical to openpyxl — shared layout source); 'xlsxwriter'
    raises a clear ImportError when the lib is absent; unknown backends
    raise ValueError."""
    import pytest

    write_excel(places, tmp_path / "s.xlsx", backend="stdlib")
    back = TableBundle(read_excel(tmp_path / "s.xlsx"))["places"]
    assert back.column_names == places.column_names

    try:
        import xlsxwriter  # noqa: F401

        has_xlsxwriter = True
    except ImportError:
        has_xlsxwriter = False
    if has_xlsxwriter:
        write_excel(places, tmp_path / "x.xlsx", backend="xlsxwriter")
        bx = TableBundle(read_excel(tmp_path / "x.xlsx"))["places"]
        assert bx.column_names == places.column_names
    else:
        with pytest.raises(ImportError, match="xlsxwriter"):
            write_excel(places, tmp_path / "x.xlsx", backend="xlsxwriter")

    with pytest.raises(ValueError, match="backend"):
        write_excel(places, tmp_path / "b.xlsx", backend="bogus")


def test_xlsxwriter_layout_via_stub(spark, places, tmp_path, monkeypatch):
    """Drive the xlsxwriter engine against a minimal in-process stub of the
    xlsxwriter API, so the layout/format plumbing is exercised even though
    the real lib is not installed here."""
    import sys
    import types

    written = {}

    class _WS:
        def __init__(self, name):
            self.name = name
            self.cells = {}

        def write(self, r, c, v, fmt=None):
            self.cells[(r, c)] = (v, fmt)

    class _WB:
        def __init__(self, path):
            self.path = path
            self.sheets = []
            written["wb"] = self

        def add_format(self, props):
            return tuple(sorted(props.items()))

        def add_worksheet(self, name):
            ws = _WS(name)
            self.sheets.append(ws)
            return ws

        def close(self):
            written["closed"] = True

    monkeypatch.setitem(
        sys.modules, "xlsxwriter", types.SimpleNamespace(Workbook=_WB)
    )
    write_excel(places, tmp_path / "stub.xlsx", backend="xlsxwriter", styles=True)
    assert written["closed"]
    ws = written["wb"].sheets[0]
    assert ws.cells[(0, 0)][0] == "**places"
    # table_name row carries a format (styles=True); values rows do not
    assert ws.cells[(0, 0)][1] is not None
    col_names = [ws.cells[(2, c)][0] for c in range(len(places.column_names))]
    assert col_names == list(places.column_names)
