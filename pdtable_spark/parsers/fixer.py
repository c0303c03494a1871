"""ParseFixer — pluggable error-recovery hooks for lenient parsing.

Parity with reference ``pdtable/io/parsers/fixer.py:8-149``:
- ``fix_duplicate_column_name``       (fixer.py:70-88)   → ``{name}_fixed_00N``
- ``fix_missing_rows_in_column_data`` (fixer.py:90-104)  → pad with missing
- ``fix_illegal_cell_value``          (fixer.py:106-125) → type default
- ``stop_on_errors``                  (fixer.py:127-134) → raise after report
- fix counting / reporting            (fixer.py:23-69)

Subclass and override hooks to customize (test/io/test_read_csv_fixer.py:70-101).
When parsing runs inside executors, each task gets its own fixer instance;
counts are merged driver-side from per-table parse reports (the Spark analog
of accumulator-based accounting).
"""

from __future__ import annotations

from typing import List, Optional


class ParseFixer:
    """Collect and optionally fix parse errors; counts fixes."""

    def __init__(self):
        self._dup_column_count = 0
        self._missing_rows_count = 0
        self._illegal_cell_count = 0
        self._errors: List[str] = []
        self._warnings: List[str] = []
        # context set by the parser before invoking hooks
        self.origin: Optional[str] = None
        self.table_name: Optional[str] = None
        self.column_name: Optional[str] = None
        self.table_row: Optional[int] = None
        # behavior knobs
        self.stop_on_errors: bool = True
        self._called_from_test: bool = False
        self._dbg: bool = False

    # -- reporting -----------------------------------------------------------

    @property
    def fixes(self) -> int:
        return self._dup_column_count + self._missing_rows_count + self._illegal_cell_count

    @property
    def messages(self) -> List[str]:
        return list(self._warnings) + list(self._errors)

    def reset_fixes(self) -> None:
        self._dup_column_count = 0
        self._missing_rows_count = 0
        self._illegal_cell_count = 0
        self._errors = []
        self._warnings = []

    def _add_error(self, msg: str) -> None:
        where = f" in table '{self.table_name}'" if self.table_name else ""
        self._errors.append(msg + where)

    def _add_warning(self, msg: str) -> None:
        self._warnings.append(msg)

    # -- fix hooks (override in subclasses) -----------------------------------

    def fix_duplicate_column_name(self, column_name: str, input_columns: List[str]) -> str:
        """Rename a duplicate column to ``{name}_fixed_00N``, N starting at
        000 (fixer.py:70-88 — numbering pinned by the reference corpus)."""
        self._dup_column_count += 1
        for i in range(0, 1000):
            candidate = f"{column_name}_fixed_{i:03d}"
            if candidate not in input_columns:
                self._add_error(
                    f"Duplicate column '{column_name}' renamed to '{candidate}'"
                )
                return candidate
        raise ValueError(f"Cannot fix duplicate column name {column_name!r}")

    def fix_missing_rows_in_column_data(
        self, row: int, row_data: List, num_columns: int
    ) -> List:
        """Pad a short row with 'NaN' cells — the reference's pad value
        (fixer.py:90-104): missing for float/datetime columns, the literal
        string 'NaN' in text columns."""
        self._missing_rows_count += 1
        self._add_error(f"Missing data in row {row} padded to {num_columns} columns")
        return list(row_data) + ["NaN"] * (num_columns - len(row_data))

    def fix_illegal_cell_value(self, dtype: str, value):
        """Replace an unparseable cell with the type default (fixer.py:106-125)."""
        defaults = {"onoff": False, "datetime": None, "float": None, "-": None}
        self._illegal_cell_count += 1
        self._add_error(
            f"Illegal {dtype} value {value!r} in column '{self.column_name}' "
            f"row {self.table_row} replaced with default"
        )
        return defaults.get(dtype)

    # -- error escalation ------------------------------------------------------

    def report(self) -> None:
        """Raise if errors occurred and stop_on_errors is set (fixer.py:127-134)."""
        if self.stop_on_errors and self._errors:
            from pdtable_spark.model.origin import InputError

            raise InputError("; ".join(self._errors))
