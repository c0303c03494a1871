"""Load orchestration: worklist BFS with include-loop detection.

Parity with reference ``pdtable/io/load/_orchestrators.py:19-112``.  The
reference notes its loader is single-threaded; here each resolved file is
still read sequentially on the driver (StarTable bundles are driver-sized),
but parquet LoadItems become lazy Spark scans — the heavy lifting is
distributed by Spark itself, so a multi-threaded worklist buys nothing.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Union

from pdtable_spark.model.origin import (
    InputIssueTracker,
    LoadItem,
    NullInputIssueTracker,
)
from pdtable_spark.parsers.blocks import BlockIterator

from ._loaders import FileReader, make_loader
from ._protocol import Loader


def queued_load(
    roots: List[LoadItem],
    loader: Loader,
    issue_tracker: Optional[InputIssueTracker] = None,
) -> BlockIterator:
    """Load the root items plus anything the loader enqueues (includes,
    folder scans).  A ``load_identifier`` seen twice (= same file version,
    since the identifier is mtime-stamped) is reported as an include loop
    and skipped (``_orchestrators.py:41-52``).
    """

    class Orchestrator:
        def __init__(self, load_items, tracker):
            self.load_items = load_items
            self.issue_tracker = tracker

        def add_load_item(self, item: LoadItem) -> None:
            self.load_items.append(item)

    orch = Orchestrator(
        list(roots), issue_tracker if issue_tracker is not None else NullInputIssueTracker()
    )
    visited = set()
    while orch.load_items:
        load_proxy = loader.resolve(orch.load_items.pop(), orch)
        load_identifier = load_proxy.load_location.load_identifier
        if load_identifier in visited:
            orch.issue_tracker.add_error(
                "Load location included multiple times (this may be due to an include loop)",
                location_file=load_proxy.load_location,
            )
            continue
        visited.add(load_identifier)
        yield from load_proxy.read(orch)


def load_files(
    roots: Optional[Iterable[Union[str, Path]]] = None,
    *,
    issue_tracker: Optional[InputIssueTracker] = None,
    csv_sep: Optional[str] = None,
    sheet_name_pattern: Optional[re.Pattern] = None,
    file_reader: Optional[FileReader] = None,
    root_folder: Optional[Union[str, Path]] = None,
    file_name_pattern: Optional[re.Pattern] = None,
    file_name_start_pattern: Optional[str] = None,
    additional_protocol_loaders: Optional[Dict[str, Loader]] = None,
    allow_include: bool = True,
    spark=None,
    to: str = "pdtable",
) -> BlockIterator:
    """Load a complete StarTable input set (``_orchestrators.py:55-112``).

    With ``root_folder`` set, ``roots`` defaults to ``["/"]`` (scan the root
    folder); without it, file roots must be absolute paths.  Pass ``spark``
    to enable parquet members in the input set.
    """
    loader = make_loader(
        csv_sep=csv_sep,
        sheet_name_pattern=sheet_name_pattern,
        file_reader=file_reader,
        root_folder=root_folder,
        file_name_pattern=file_name_pattern,
        file_name_start_pattern=file_name_start_pattern,
        additional_protocol_loaders=additional_protocol_loaders,
        allow_include=allow_include,
        spark=spark,
        to=to,
    )
    if roots is None and root_folder is not None:
        roots = ["/"]
    yield from queued_load(
        roots=[LoadItem(str(f), source=None) for f in roots],
        loader=loader,
        issue_tracker=issue_tracker,
    )
