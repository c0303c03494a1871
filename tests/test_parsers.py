"""Pure-Python parser tests — no SparkSession needed.

Mirrors the reference test pyramid (SURVEY §5): block tokenizer segmentation,
column parsers incl. missing markers, fixer behavior.
"""

import datetime as dt

import pytest

from pdtable_spark.auxiliary import Directive, MetadataBlock
from pdtable_spark.model.origin import InputError
from pdtable_spark.parsers.blocks import (
    BlockType,
    make_parsed_table,
    parse_blocks,
)
from pdtable_spark.parsers.columns import parse_column
from pdtable_spark.parsers.fixer import ParseFixer


def rows(text, sep=";"):
    return [line.split(sep) for line in text.strip("\n").split("\n")]


CSV = """
author:;ACME
purpose:;testing

***include;
other.csv

**places;
all
place;distance;is_hot;when
text;km;onoff;datetime
home;0.0;1;2020-08-11 00:00:00
work;14.5;0;2020-08-12 00:00:00
mars;-;0;-

**empty_like;
all

:template;row;here
"""


def test_block_segmentation():
    blocks = list(parse_blocks(rows(CSV), to="parsed"))
    kinds = [bt for bt, _ in blocks]
    assert kinds.count(BlockType.METADATA) == 1
    assert kinds.count(BlockType.DIRECTIVE) == 1
    assert kinds.count(BlockType.TABLE) == 2


def test_metadata_block():
    (mb,) = [b for bt, b in parse_blocks(rows(CSV), to="parsed") if bt == BlockType.METADATA]
    assert isinstance(mb, MetadataBlock)
    assert mb["author"] == "ACME"
    assert mb["purpose"] == "testing"


def test_directive():
    (d,) = [b for bt, b in parse_blocks(rows(CSV), to="parsed") if bt == BlockType.DIRECTIVE]
    assert isinstance(d, Directive)
    assert d.name == "include"
    assert d.lines == ["other.csv"]


def test_table_parse():
    tables = [b for bt, b in parse_blocks(rows(CSV), to="parsed") if bt == BlockType.TABLE]
    t = tables[0]
    assert t.name == "places"
    assert t.column_names == ["place", "distance", "is_hot", "when"]
    assert t.units == ["text", "km", "onoff", "datetime"]
    assert t.columns["place"] == ["home", "work", "mars"]
    assert t.columns["distance"] == [0.0, 14.5, None]
    assert t.columns["is_hot"] == [True, False, False]
    assert t.columns["when"][0] == dt.datetime(2020, 8, 11)
    assert t.columns["when"][2] is None
    assert t.destinations == ["all"]


def test_text_dash_stays_literal():
    assert parse_column("text", ["-", "x"]) == ["-", "x"]


def test_numeric_missing_markers():
    assert parse_column("kg", ["1", "-", "nan", "NaN", " - "]) == [1.0, None, None, None, None]


def test_onoff_variants():
    assert parse_column("onoff", ["0", "1", "true", "FALSE"]) == [
        False,
        True,
        True,
        False,
    ]


def test_onoff_rejects_missing_markers():
    # reference parity (test_column_parsers.py:55-60): '-' in onoff is
    # ILLEGAL, not missing; the permissive fixer defaults it to False
    import pytest as _pytest

    from pdtable_spark.model.origin import InputError

    with _pytest.raises((ValueError, InputError)):
        parse_column("onoff", ["-"])
    fixer = ParseFixer()
    fixer.stop_on_errors = False
    assert parse_column("onoff", ["-", "nan"], fixer) == [False, False]
    assert fixer.fixes == 2


def test_early_filter_skips_parsing():
    blocks = list(
        parse_blocks(
            rows(CSV),
            to="parsed",
            filter=lambda bt, name: bt == BlockType.TABLE and name == "places",
        )
    )
    assert len(blocks) == 1
    assert blocks[0][1].name == "places"


def test_transposed_table():
    grid = rows(
        """
**flipped*;
all
numbers;-;1;2;3
texts;text;a;b;c
"""
    )
    t = make_parsed_table(grid)
    assert t.transposed
    assert t.column_names == ["numbers", "texts"]
    assert t.columns["numbers"] == [1.0, 2.0, 3.0]
    assert t.columns["texts"] == ["a", "b", "c"]


def test_fixer_duplicate_columns():
    grid = rows(
        """
**dups;
all
a;a;b
-;-;-
1;2;3
"""
    )
    fixer = ParseFixer()
    fixer.stop_on_errors = False
    t = make_parsed_table(grid, fixer=fixer)
    assert t.column_names == ["a", "a_fixed_000", "b"]
    assert fixer.fixes == 1


def test_fixer_short_row_padding():
    grid = rows(
        """
**short;
all
a;b
-;-
1;2
3
"""
    )
    fixer = ParseFixer()
    fixer.stop_on_errors = False
    t = make_parsed_table(grid, fixer=fixer)
    assert t.columns["b"] == [2.0, None]


def test_fixer_illegal_value_default():
    fixer = ParseFixer()
    fixer.stop_on_errors = False
    assert parse_column("-", ["1", "bogus"], fixer) == [1.0, None]
    assert parse_column("onoff", ["bogus"], fixer) == [False]
    assert fixer.fixes == 2


def test_fixer_stops_on_errors_by_default():
    grid = rows(
        """
**bad;
all
a
-
bogus
"""
    )
    with pytest.raises(InputError):
        make_parsed_table(grid, fixer=ParseFixer())


def test_fixer_error_routes_to_issue_tracker():
    """A fixer-reported error under strict parsing must be COLLECTED by a
    CollectingInputIssueTracker (InputError is a ValueError subclass routed
    by the block emitter) — one bad table must not abort the block stream."""
    from pdtable_spark.model.origin import CollectingInputIssueTracker

    grid = rows(
        """
**bad;
all
a
-
bogus

**good;
all
x
-
1
"""
    )
    tracker = CollectingInputIssueTracker()
    blocks = list(parse_blocks(grid, issue_tracker=tracker, to="parsed"))
    names = [b.name for bt, b in blocks if bt == BlockType.TABLE]
    assert names == ["good"]  # stream survived the bad table
    assert any("Illegal" in str(i.issue) for i in tracker.issues)


def test_fixer_pads_with_nan_literal():
    """Reference parity: short rows pad with 'NaN' — missing in float
    columns, the literal string 'NaN' in text columns."""
    grid = rows(
        """
**short;
all
name;b
text;-
x;2
y
"""
    )
    fixer = ParseFixer()
    fixer.stop_on_errors = False
    t = make_parsed_table(grid, fixer=fixer)
    assert t.columns["b"] == [2.0, None]
    assert t.columns["name"] == ["x", "y"]
    # direct hook check: the pad cell is the reference's 'NaN'
    f2 = ParseFixer()
    assert f2.fix_missing_rows_in_column_data(0, ["a"], 3) == ["a", "NaN", "NaN"]


def test_datetime_none_cell_is_illegal():
    """A None datetime cell (empty Excel cell) routes through
    fix_illegal_cell_value — counted, and fatal under strict parsing."""
    fixer = ParseFixer()
    fixer.stop_on_errors = False
    out = parse_column("datetime", ["2020-01-02", None, "-"], fixer)
    assert out[0] == dt.datetime(2020, 1, 2)
    assert out[1] is None and out[2] is None
    assert fixer.fixes == 1  # only the None counted; '-' is a legal marker
    with pytest.raises(InputError):
        strict = ParseFixer()
        parse_column("datetime", [None], strict)
        strict.report()


def test_comment_columns_after_blank_header_cell():
    grid = rows(
        """
**commented;
all
a;b;;this is a comment
-;-
1;2
"""
    )
    t = make_parsed_table(grid)
    assert t.column_names == ["a", "b"]


def test_no_units_row_raises():
    grid = rows(
        """
**nounits;
all
a;b
"""
    )
    with pytest.raises(ValueError):
        make_parsed_table(grid)
