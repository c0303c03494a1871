"""Loader/Reader protocols for the input-set load system.

Parity with reference ``pdtable/io/load/_protocol.py:19-104``: a ``Loader``
resolves a :class:`LoadItem` into a ``LoadProxy`` (resolved location +
compatible ``Reader``); the ``LoadOrchestrator`` carries per-load state
(worklist + issue tracker).  Loaders/readers are reusable across loads; an
orchestrator is single-use.
"""

from __future__ import annotations

import typing

from pdtable_spark.model.origin import InputIssueTracker, LoadItem, LoadLocation
from pdtable_spark.parsers.blocks import BlockIterator


class LoadError(Exception):
    """Unrecoverable load-resolution failure (bad path, escape from root)."""


class LoadOrchestrator:
    """State during one load: worklist + issue tracker (``_protocol.py:23-37``)."""

    def add_load_item(self, item: LoadItem) -> None:
        raise NotImplementedError

    @property
    def issue_tracker(self) -> InputIssueTracker:
        raise NotImplementedError


class Reader:
    """Turns a resolved location into a block stream (``_protocol.py:40-43``)."""

    def read(
        self, load_location: LoadLocation, orchestrator: LoadOrchestrator
    ) -> BlockIterator:
        raise NotImplementedError


class CallableReader(typing.NamedTuple):
    """Adapter wrapping a plain callable as a ``Reader`` (``_protocol.py:53-60``)."""

    read: typing.Callable[[LoadLocation, LoadOrchestrator], BlockIterator]


class LoadProxy(typing.NamedTuple):
    """A resolved (location, reader) pair ready to stream blocks."""

    load_location: LoadLocation
    reader: Reader

    def read(self, orchestrator: LoadOrchestrator) -> BlockIterator:
        yield from self.reader.read(self.load_location, orchestrator)


class Loader:
    """Resolves load specifications (``_protocol.py:91-104``)."""

    def resolve(self, load_item: LoadItem, orchestrator: LoadOrchestrator) -> LoadProxy:
        raise NotImplementedError

    def load(self, load_item: LoadItem, orchestrator: LoadOrchestrator) -> BlockIterator:
        yield from self.resolve(load_item, orchestrator).read(orchestrator)
