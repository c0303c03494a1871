"""StarTable block tokenizer + block factories.

Parity with reference ``pdtable/io/parsers/blocks.py``:
- ``BlockType``                (store.py:41-45)
- ``parse_blocks_stable``      (blocks.py:402-517) — the row state machine
- ``parse_blocks``             (blocks.py:315-383) — façade with to=/filter
- ``make_table_json_precursor``(blocks.py:116-221)
- block factories for metadata/directive/table (blocks.py:54-67,224-266)
- early block filter           (blocks.py:303-312) — only blocks whose
  ``(BlockType, name)`` pass the filter are fully parsed; others cost one
  top-left-cell peek.  This is the source-level "pushdown" of the format.

Everything here is pure Python so it can run inside Spark executors
(``mapPartitions``/``flatMap`` over files) as well as on the driver.
The table factory therefore emits a ``ParsedTable`` (plain data); turning
that into a Spark-backed ``Table`` happens in :mod:`pdtable_spark.frame`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum, auto
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

from pdtable_spark.auxiliary import Directive, MetadataBlock
from pdtable_spark.model.origin import (
    InputIssueTracker,
    LocationSheet,
    NullInputIssueTracker,
    NullLocationFile,
    TableOrigin,
)
from pdtable_spark.parsers.columns import parse_column
from pdtable_spark.parsers.fixer import ParseFixer

CellGrid = Sequence[Sequence]


class BlockType(Enum):
    """Token types emitted by readers (reference store.py:41-45)."""

    DIRECTIVE = auto()
    TABLE = auto()
    TEMPLATE_ROW = auto()
    METADATA = auto()
    BLANK = auto()


BlockIterator = Iterable[Tuple[BlockType, Any]]


# ---------------------------------------------------------------------------
# Parsed table (pure-Python precursor of a Spark-backed Table)
# ---------------------------------------------------------------------------


@dataclass
class ParsedTable:
    """Fully parsed table block, not yet materialized into Spark.

    Columns hold Python lists with ``None`` for missing values; dtype follows
    the unit indicator (§1.2).  ``frame.table_from_parsed`` turns this into a
    ``Table`` over a Spark DataFrame.
    """

    name: str
    destinations: List[str]
    column_names: List[str]
    units: List[str]
    columns: Dict[str, list]
    origin: Optional[TableOrigin] = None
    transposed: bool = False
    strict_types: bool = True

    @property
    def num_rows(self) -> int:
        return len(next(iter(self.columns.values()))) if self.columns else 0


# ---------------------------------------------------------------------------
# Cell helpers
# ---------------------------------------------------------------------------


def _cell_is_blank(cell) -> bool:
    if cell is None:
        return True
    if isinstance(cell, str):
        return cell.strip() == ""
    if isinstance(cell, float):
        return cell != cell  # NaN
    return False


def parse_column_names(raw: Sequence) -> List[str]:
    """Column names up to the first blank cell — everything after may be
    comments (blocks.py:86-94)."""
    names: List[str] = []
    for c in raw:
        if _cell_is_blank(c):
            break
        names.append(str(c).strip())
    return names


def _dedupe_column_names(names: List[str], fixer: ParseFixer) -> List[str]:
    """Route duplicate header names through the fixer (blocks.py:520-535)."""
    out: List[str] = []
    for name in names:
        if name in out:
            name = fixer.fix_duplicate_column_name(name, out)
        out.append(name)
    return out


def _coerce_destinations_cell(cell) -> str:
    """Destinations cell coerced to a stripped string (blocks.py:97-113)."""
    if not isinstance(cell, str):
        cell = str(cell).replace(" ", "_") if hasattr(cell, "isoformat") else str(cell)
    return cell.strip()


# ---------------------------------------------------------------------------
# Block factories
# ---------------------------------------------------------------------------


def make_metadata_block(cells: CellGrid, origin=None, **_) -> MetadataBlock:
    """Rows of ``key:;value`` → MetadataBlock (blocks.py:54-61)."""
    mb = MetadataBlock(str(origin) if origin is not None else None)
    for row in cells:
        if len(row) > 1 and row[0] is not None:
            key = str(row[0]).strip()
            if key.endswith(":") and len(key) > 1:
                mb[key[:-1]] = str(row[1]).strip()
    return mb


def make_directive(cells: CellGrid, origin=None, **_) -> Directive:
    """``***name`` + following first-cells → Directive (blocks.py:64-67)."""
    name = str(cells[0][0])[3:]
    lines = [row[0] for row in cells[1:]]
    return Directive(name, lines, str(origin) if origin is not None else None)


def make_raw_cells(cells: CellGrid, origin=None, **_) -> CellGrid:
    return cells


def make_fixer(origin=None, fixer=None) -> ParseFixer:
    """Instantiate fixer classes; default ParseFixer (blocks.py:70-83)."""
    if fixer is None:
        fixer = ParseFixer()
    elif isinstance(fixer, type):
        fixer = fixer()
    fixer.origin = str(origin) if origin is not None else None
    return fixer


def make_table_json_precursor(
    cells: CellGrid, origin=None, fixer: Optional[ParseFixer] = None
) -> Tuple[dict, bool]:
    """Cell grid → {name, destinations, columns, units, origin} + transposed.

    Reference: blocks.py:116-221.  Handles:
    - ``**name*`` transpose decorator (one file row per column)
    - comment rejection after first blank header cell
    - transposed row/column collation with padding/trimming of ragged lines
    - short-row fixing via the fixer
    - per-column parse dispatch on the unit indicator
    """
    if fixer is None:
        fixer = make_fixer(origin)

    name = str(cells[0][0])[2:]
    transposed = name.endswith("*")
    if transposed:
        name = name[:-1]
    fixer.table_name = name

    dest_cell = cells[1][0] if len(cells) > 1 and len(cells[1]) > 0 else "all"
    destinations = list(
        dict.fromkeys(_coerce_destinations_cell(dest_cell).split(" "))
    )

    is_empty = len(cells) < 3
    if is_empty:
        column_names: List[str] = []
    elif transposed:
        column_names = parse_column_names([line[0] for line in cells[2:]])
    elif len(cells) == 3:
        raise ValueError(f"Invalid table {name}: no unit specification found")
    else:
        column_names = parse_column_names(cells[2])
    column_names = _dedupe_column_names(column_names, fixer)
    n_col = len(column_names)

    if is_empty:
        units: List[str] = []
    elif transposed:
        units = [str(line[1]).strip() for line in cells[2 : 2 + n_col]]
    else:
        units = [str(u).strip() for u in cells[3][:n_col]]

    if transposed and not is_empty:
        data_lines = [list(line[2:]) for line in cells[2 : 2 + n_col]]
        longest = max((len(line) for line in data_lines), default=0)
        # last row index (exclusive) that still has any non-blank cell
        n_row = 0
        for i in range(longest):
            if any(len(line) > i and not _cell_is_blank(line[i]) for line in data_lines):
                n_row = i + 1
            else:
                break
        data_rows = [
            list(row)
            for row in zip(
                *(
                    line[:n_row] if len(line) >= n_row else line + [None] * (n_row - len(line))
                    for line in data_lines
                )
            )
        ]
    else:
        data_rows = [list(line[:n_col]) for line in cells[4:]]

    for i, row in enumerate(data_rows):
        if len(row) < n_col:
            data_rows[i] = fixer.fix_missing_rows_in_column_data(
                row=i, row_data=row, num_columns=n_col
            )

    columns: Dict[str, list] = {c: [] for c in column_names}
    col_values = list(zip(*data_rows)) if data_rows else [[] for _ in column_names]
    for cname, unit, values in zip(column_names, units, col_values):
        fixer.column_name = cname
        try:
            columns[cname] = parse_column(unit, values, fixer)
        except ValueError as e:
            raise ValueError(
                f"Unable to parse value in column '{cname}' of table '{name}' as '{unit}'"
            ) from e

    fixer.report()

    precursor = {
        "name": name,
        "destinations": destinations,
        "columns": columns,
        "units": units,
        "origin": origin,
    }
    return precursor, transposed


def make_parsed_table(cells: CellGrid, origin=None, fixer=None) -> ParsedTable:
    """Cell grid → ParsedTable (the Spark-free analog of blocks.py:224-241)."""
    precursor, transposed = make_table_json_precursor(cells, origin=origin, fixer=fixer)
    return ParsedTable(
        name=precursor["name"],
        destinations=precursor["destinations"],
        column_names=list(precursor["columns"].keys()),
        units=precursor["units"],
        columns=precursor["columns"],
        origin=origin if isinstance(origin, TableOrigin) else None,
        transposed=transposed,
        strict_types=getattr(fixer, "strict_types", True) if fixer else True,
    )


def make_table(cells: CellGrid, origin: Optional[TableOrigin] = None, fixer=None, spark=None):
    """Cell grid → Spark-backed ``Table`` (blocks.py:244-252)."""
    from pdtable_spark.frame import table_from_parsed

    fixer = make_fixer(origin=origin, fixer=fixer)
    if origin is None:
        origin = TableOrigin()
    parsed = make_parsed_table(cells, origin=origin, fixer=fixer)
    return table_from_parsed(parsed, spark=spark)


def make_table_json_data(cells: CellGrid, origin=None, fixer=None) -> dict:
    """Cell grid → pure JsonData: unit attached per column, origin dropped
    (blocks.py:255-266)."""
    from pdtable_spark.io.json import to_json_serializable

    precursor, _transposed = make_table_json_precursor(cells, origin=origin, fixer=fixer)
    columns = {
        cname: {"unit": unit, "values": values}
        for (cname, values), unit in zip(precursor["columns"].items(), precursor["units"])
    }
    return to_json_serializable(
        {
            "name": precursor["name"],
            "destinations": {d: None for d in precursor["destinations"]},
            "columns": columns,
        }
    )


# ---------------------------------------------------------------------------
# Tokenizer state machine
# ---------------------------------------------------------------------------

#: Block start markers, matched against the first cell of a row
#: (blocks.py:288-296): ``**table`` / ``***directive`` (but not ``****``),
#: ``:``/``::``/``:::`` template rows, and trailing-colon metadata keys.
_re_block_marker = re.compile(
    r"^("
    r"(?<!\*)(\*\*\*?)(?!\*)"
    r"|"
    r"((?<!:):{1,3}(?!:))[^:]*\s*$"
    r"|"
    r"([^:]+:)\s*$"
    r")"
)


def _default_table_factory(to: str) -> Callable:
    factories = {
        "pdtable": make_table,
        "parsed": make_parsed_table,
        "jsondata": make_table_json_data,
        "cellgrid": make_raw_cells,
    }
    if to not in factories:
        raise ValueError(f"Unknown parsing output type {to!r}")
    return factories[to]


def default_handlers(to: str = "pdtable") -> Dict[BlockType, Callable]:
    return {
        BlockType.METADATA: make_metadata_block,
        BlockType.DIRECTIVE: make_directive,
        BlockType.TABLE: _default_table_factory(to),
    }


def _wrap_with_filter(
    handlers: Dict[BlockType, Callable],
    filter: Callable[[BlockType, str], bool],
) -> Dict[BlockType, Callable]:
    """Early filter: non-matching blocks cost one top-left-cell peek only
    (blocks.py:303-312)."""

    def wrap(block_type: BlockType, handler: Callable) -> Callable:
        if block_type == BlockType.TABLE:
            return lambda cells, **kw: (
                handler(cells, **kw) if filter(block_type, str(cells[0][0])[2:]) else None
            )
        return lambda cells, **kw: (handler(cells, **kw) if filter(block_type, "") else None)

    return {bt: wrap(bt, h) for bt, h in handlers.items()}


def parse_blocks_stable(
    cell_rows: Iterable[Sequence],
    issue_tracker: Optional[InputIssueTracker] = None,
    block_handlers: Optional[Dict[BlockType, Callable]] = None,
    location_sheet: Optional[LocationSheet] = None,
    fixer=None,
) -> Iterator[Tuple[BlockType, Any]]:
    """Tokenize a stream of cell rows into typed blocks.

    State machine over rows (blocks.py:402-517):
    - file starts in METADATA state;
    - ``**name`` starts a TABLE block, ``***name`` a DIRECTIVE;
    - ``:``-prefixed first cells are TEMPLATE_ROWs;
    - ``key:`` rows extend METADATA at file start, else act as comments;
    - a blank first cell ends the current block (BLANK state); non-empty
      comment rows accumulate into BLANK blocks;
    - handler ``ValueError``s are routed into the issue tracker rather than
      aborting the stream.

    Lazily yields ``(BlockType, block)`` — constant memory over many tables,
    early abort for free.
    """
    if location_sheet is None:
        location_sheet = NullLocationFile().make_location_sheet()
    if issue_tracker is None:
        issue_tracker = NullInputIssueTracker()
    if block_handlers is None:
        block_handlers = default_handlers("parsed")
    if fixer is None:
        fixer = make_fixer(origin=location_sheet.file.load_identifier)

    def emit(state: BlockType, grid: List[Sequence], first_row: int):
        if not grid:
            return
        handler = block_handlers.get(state)
        if handler is None:
            return
        from pdtable_spark.model.origin import LocationBlock

        origin = TableOrigin(
            input_location=LocationBlock(sheet=location_sheet, row=first_row)
        )
        fixer.reset_fixes()
        try:
            block = handler(grid, origin=origin, fixer=fixer)
        except ValueError as e:
            issue_tracker.add_error(str(e), origin=str(origin.input_location))
            return
        if block is not None:
            yield state, block

    grid: List[Sequence] = []
    state = BlockType.METADATA
    block_first_row = 0

    for row_number, row in enumerate(cell_rows):
        next_state: Optional[BlockType] = None
        if row is None or len(row) == 0 or _cell_is_blank(row[0]):
            if state == BlockType.BLANK:
                continue
            next_state = BlockType.BLANK
        elif isinstance(row[0], str):
            m = _re_block_marker.match(row[0])
            if m is None:
                grid.append(row)
                continue
            marker = m.group(2)
            if marker == "**":
                next_state = BlockType.TABLE
            elif marker == "***":
                next_state = BlockType.DIRECTIVE
            elif m.group(4) is not None:  # 'key:' metadata marker
                if state == BlockType.METADATA:
                    grid.append(row)
                    continue
                next_state = BlockType.BLANK
            else:  # ':'-prefixed template row
                next_state = BlockType.TEMPLATE_ROW
        else:
            # non-string first cell (Excel numerics etc.) — plain data row
            grid.append(row)
            continue

        # current block ended: emit it, start the next
        yield from emit(state, grid, block_first_row)
        grid = []
        state = next_state
        block_first_row = row_number
        if state != BlockType.BLANK:
            grid.append(row)
        elif len(row) > 0 and not (len(row) == 1 and _cell_is_blank(row[0])):
            grid.append(row)  # comments ride along in BLANK blocks

    yield from emit(state, grid, block_first_row)


def parse_blocks(
    cell_rows: Iterable[Sequence],
    location_sheet: Optional[LocationSheet] = None,
    to: str = "pdtable",
    filter: Optional[Callable[[BlockType, str], bool]] = None,
    fixer=None,
    issue_tracker: Optional[InputIssueTracker] = None,
) -> Iterator[Tuple[BlockType, Any]]:
    """Façade over ``parse_blocks_stable``: output-type selection (`to` ∈
    {pdtable, parsed, jsondata, cellgrid}) + early filter wiring
    (blocks.py:315-383)."""
    handlers = default_handlers(to)
    if filter is not None:
        handlers = _wrap_with_filter(handlers, filter)
    if location_sheet is None:
        location_sheet = NullLocationFile().make_location_sheet()
    fixer = make_fixer(origin=location_sheet.file.load_identifier, fixer=fixer)
    yield from parse_blocks_stable(
        cell_rows,
        issue_tracker=issue_tracker,
        block_handlers=handlers,
        location_sheet=location_sheet,
        fixer=fixer,
    )
