"""Origin lineage + load locations + input-issue tracking.

Parity with reference ``pdtable/table_origin.py``:
- ``LoadItem`` / ``LoadLocation`` / ``LocationFile`` (table_origin.py:78-294)
- ``FilesystemLocationFile`` with mtime-stamped ``load_identifier``
  (table_origin.py:261-266) — doubles as include-loop-detection + cache key.
- ``LocationSheet`` / ``LocationBlock`` (table_origin.py:296-347)
- ``TableOrigin`` lineage tree (table_origin.py:350-405) — leaf = loaded
  input, branch = operation + parents.
- ``InputIssue`` / ``InputIssueTracker`` / ``NullInputIssueTracker``
  (table_origin.py:447-557).

All driver-side; executor-side parse errors are surfaced by re-raising into
the tracker after collection.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional, Sequence, Union


# ---------------------------------------------------------------------------
# Load locations
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LoadItem:
    """A load specification: what to load, and from where it was requested.

    Reference: table_origin.py:78-117.
    """

    specification: str
    source: Optional["LoadLocation"] = None

    @property
    def source_identifier(self) -> str:
        return self.source.load_identifier if self.source is not None else "<root>"

    def load_history(self) -> List["LoadItem"]:
        items: List[LoadItem] = [self]
        src = self.source
        while src is not None:
            if src.load_specification is None:
                break
            items.append(src.load_specification)
            src = src.load_specification.source
        return items

    def __str__(self) -> str:
        return f"included as '{self.specification}' from {self.source_identifier}"


class LoadLocation:
    """Common protocol for a resolved load location (table_origin.py:120-152)."""

    @property
    def load_specification(self) -> Optional[LoadItem]:
        raise NotImplementedError

    @property
    def load_identifier(self) -> str:
        raise NotImplementedError

    @property
    def interactive_identifier(self) -> str:
        raise NotImplementedError

    def interactive_open(self, read_only: bool = True):  # pragma: no cover
        raise NotImplementedError


class LocationFolder(LoadLocation):
    """A folder (for FolderReader scans). Reference: table_origin.py:155-190."""

    def __init__(
        self,
        local_folder_path: Path,
        load_specification: Optional[LoadItem] = None,
        root_folder: Optional[Path] = None,
    ):
        self.local_folder_path = Path(local_folder_path)
        self._load_specification = load_specification
        self.root_folder = root_folder

    @property
    def load_specification(self) -> Optional[LoadItem]:
        return self._load_specification

    @property
    def load_identifier(self) -> str:
        return str(self.local_folder_path)

    @property
    def interactive_identifier(self) -> str:
        if self.root_folder is None:
            return self.load_identifier
        try:
            rel = self.local_folder_path.relative_to(self.root_folder)
            return str(rel) if str(rel) != "." else "<root_folder>"
        except ValueError:
            return self.load_identifier

    def __str__(self) -> str:
        return f"Folder '{self.interactive_identifier}'"


class LocationFile(LoadLocation):
    """Common protocol for a loaded file (table_origin.py:193-258)."""

    @property
    def file_name(self) -> Optional[str]:
        raise NotImplementedError

    @property
    def local_path(self) -> Optional[Path]:
        return None

    def make_location_sheet(self, sheet_name: Optional[str] = None) -> "LocationSheet":
        return LocationSheet(file=self, sheet_name=sheet_name)

    def __str__(self) -> str:
        return f"File '{self.interactive_identifier}'"


class NullLocationFile(LocationFile):
    """Placeholder origin for in-memory tables (table_origin.py:193-221)."""

    def __init__(self, description: str = "<na>"):
        self._description = description

    @property
    def load_specification(self) -> Optional[LoadItem]:
        return None

    @property
    def load_identifier(self) -> str:
        return self._description

    @property
    def interactive_identifier(self) -> str:
        return self._description

    @property
    def file_name(self) -> Optional[str]:
        return None


class FilesystemLocationFile(LocationFile):
    """A file on a (possibly remote) filesystem.

    ``load_identifier`` = ``<abspath>@<mtime>`` (table_origin.py:261-266) so
    that include-loop detection and caching key on the exact file version.
    For non-local URIs (s3://, dbfs:/ ...) mtime stamping degrades to the
    bare URI.
    """

    def __init__(
        self,
        local_path: Union[Path, str],
        load_specification: Optional[LoadItem] = None,
        root_folder: Optional[Path] = None,
        stamp_mtime: bool = True,
    ):
        self._path = local_path
        self._load_specification = load_specification
        self.root_folder = root_folder
        self._stamp_mtime = stamp_mtime
        self._cached_identifier: Optional[str] = None

    @property
    def local_path(self) -> Optional[Path]:
        p = str(self._path)
        if "://" in p:
            return None
        return Path(p)

    @property
    def load_specification(self) -> Optional[LoadItem]:
        return self._load_specification

    def get_mtime_stamp(self) -> str:
        lp = self.local_path
        if lp is None or not self._stamp_mtime:
            return ""
        try:
            mtime = datetime.datetime.fromtimestamp(lp.stat().st_mtime)
            return "@" + mtime.isoformat(timespec="seconds")
        except OSError:
            return ""

    @property
    def load_identifier(self) -> str:
        if self._cached_identifier is None:
            lp = self.local_path
            base = str(lp.resolve()) if lp is not None else str(self._path)
            self._cached_identifier = base + self.get_mtime_stamp()
        return self._cached_identifier

    @property
    def interactive_identifier(self) -> str:
        lp = self.local_path
        if lp is None or self.root_folder is None:
            return str(self._path)
        try:
            return str(lp.relative_to(self.root_folder))
        except ValueError:
            return str(self._path)

    @property
    def file_name(self) -> Optional[str]:
        lp = self.local_path
        return lp.name if lp is not None else str(self._path).rsplit("/", 1)[-1]


@dataclass(frozen=True)
class LocationSheet:
    """A sheet in a loaded file (CSV = single anonymous sheet).

    Reference: table_origin.py:296-316.
    """

    file: LocationFile
    sheet_name: Optional[str] = None

    @property
    def local_identifier(self) -> str:
        return f"Sheet '{self.sheet_name}'" if self.sheet_name else "<sheet>"


@dataclass(frozen=True)
class LocationBlock:
    """A block (table) inside a sheet: sheet + 0-based start row.

    Reference: table_origin.py:319-347.
    """

    sheet: LocationSheet
    row: int = 0

    @property
    def file(self) -> LocationFile:
        return self.sheet.file

    @property
    def local_identifier(self) -> str:
        sheet_part = f"Sheet '{self.sheet.sheet_name}', " if self.sheet.sheet_name else ""
        return f"{sheet_part}Row {self.row}"

    @property
    def interactive_identifier(self) -> str:
        return f"{self.local_identifier} of '{self.file.interactive_identifier}'"

    def __str__(self) -> str:
        return self.interactive_identifier


# ---------------------------------------------------------------------------
# Origin lineage tree
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TableOrigin:
    """Lineage node: either a loaded input (leaf) or an operation over
    parent tables (branch).  Reference: table_origin.py:350-405.
    """

    input_location: Optional[LocationBlock] = None
    operation: Optional[str] = None
    parents: Sequence["TableOrigin"] = ()

    def __post_init__(self):
        if self.operation is not None and self.input_location is not None:
            raise ValueError(
                "TableOrigin is either a loaded input or an operation, not both"
            )
        if self.operation is None and self.parents:
            raise ValueError("Parents require an operation")

    @property
    def is_leaf(self) -> bool:
        return self.operation is None

    def get_input_ancestors(self) -> List[LocationBlock]:
        """All leaf input locations in this lineage tree."""
        if self.is_leaf:
            return [self.input_location] if self.input_location is not None else []
        out: List[LocationBlock] = []
        for p in self.parents:
            out.extend(p.get_input_ancestors())
        return out

    def __str__(self) -> str:
        if self.is_leaf:
            return str(self.input_location) if self.input_location else "<unknown>"
        inner = "; ".join(str(p) for p in self.parents)
        return f"Created as '{self.operation}' of {{{inner}}}"

    def _repr_html_(self) -> str:  # rendered tree (table_origin.py:408-444)
        if self.is_leaf:
            return f"<li>{self}</li>"
        parents = "".join(p._repr_html_() for p in self.parents)
        return f"<li>Operation '{self.operation}'<ul>{parents}</ul></li>"


# ---------------------------------------------------------------------------
# Input issues
# ---------------------------------------------------------------------------


class InputError(ValueError):
    """Raised by NullInputIssueTracker on ERROR severity (table_origin.py:538-549).

    A ``ValueError`` subclass so fixer-reported errors raised inside block
    handlers route into the issue tracker in ``parse_blocks`` (the reference
    raises plain ValueError there — blocks.py:402's ``except ValueError``
    must see these; otherwise one fixable table aborts a whole
    ``load_files`` run instead of being recorded as an issue)."""


@dataclass
class InputIssue:
    """A single parse/load issue (table_origin.py:447-490)."""

    issue: Union[str, Exception]
    severity: int = 40  # logging.ERROR
    load_item: Optional[LoadItem] = None
    location_file: Optional[LocationFile] = None
    origin: Optional[str] = None

    def __str__(self) -> str:
        where = self.origin or (
            self.location_file.interactive_identifier if self.location_file else None
        )
        prefix = f"{where}: " if where else ""
        return f"{prefix}{self.issue}"


class InputIssueTracker:
    """Protocol for collecting issues during load (table_origin.py:493-535)."""

    def add_issue(self, issue: InputIssue) -> None:
        raise NotImplementedError

    def add_error(self, issue, **kwargs) -> None:
        self.add_issue(InputIssue(issue=issue, severity=40, **kwargs))

    def add_warning(self, issue, **kwargs) -> None:
        self.add_issue(InputIssue(issue=issue, severity=30, **kwargs))

    @property
    def is_ok(self) -> bool:
        raise NotImplementedError


class NullInputIssueTracker(InputIssueTracker):
    """Raises immediately on error severity (table_origin.py:538-549)."""

    def add_issue(self, issue: InputIssue) -> None:
        if issue.severity >= 40:
            raise InputError(str(issue))

    @property
    def is_ok(self) -> bool:
        return True


class CollectingInputIssueTracker(InputIssueTracker):
    """Collects all issues; inspect ``issues`` / ``is_ok`` after load."""

    def __init__(self):
        self.issues: List[InputIssue] = []

    def add_issue(self, issue: InputIssue) -> None:
        self.issues.append(issue)

    @property
    def is_ok(self) -> bool:
        return not any(i.severity >= 40 for i in self.issues)


NullLocationFile_DEFAULT = NullLocationFile()
