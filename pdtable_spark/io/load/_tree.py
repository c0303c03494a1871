"""Lineage-tree rendering of a load: which file included which.

Parity with reference ``pdtable/io/load/_tree.py:17-116``: builds a forest
of :class:`LocationTreeNode` from the ``TableOrigin`` leaves of loaded
tables, keyed on ``load_identifier`` uniqueness.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Iterable, Iterator, List, Optional, TypeVar

from pdtable_spark.model.origin import LoadLocation

T = TypeVar("T")


@dataclass
class LocationTreeNode:
    """Tree node over a LoadLocation; leaves carry their Table."""

    location: Optional[LoadLocation]
    table: object = None
    parent: Optional["LocationTreeNode"] = None
    children: List["LocationTreeNode"] = field(default_factory=list)

    def add_child(self, child: "LocationTreeNode") -> None:
        self.children.append(child)
        child.parent = self

    def visit_all(
        self, visitor: Callable[[int, "LocationTreeNode"], T], level: int = 0
    ) -> Iterator[T]:
        yield visitor(level, self)
        for child in self.children:
            yield from child.visit_all(visitor=visitor, level=level + 1)

    def __str__(self) -> str:
        def str_visitor(level, node):
            if node.table is not None:
                return f"{'  ' * level}**{node.table.name}"
            return (
                f"{'  ' * level}"
                f"{node.location.interactive_identifier if node.location else ''}"
            )

        return "\n".join(self.visit_all(visitor=str_visitor))


def make_location_trees(tables: Iterable) -> List[LocationTreeNode]:
    """Forest of load origins for the given tables (``_tree.py:58-116``).

    Relies on ``load_identifier`` being unique per loaded file version.
    """
    buf: Dict[str, LocationTreeNode] = {}

    def register_node(location, child: LocationTreeNode) -> None:
        if location.load_identifier in buf:
            buf[location.load_identifier].add_child(child)
            return
        new_node = LocationTreeNode(location=location)
        new_node.add_child(child)
        buf[location.load_identifier] = new_node
        spec = location.load_specification
        if spec is not None and spec.source is not None:
            register_node(spec.source, child=new_node)

    for t in tables:
        origin = t.metadata.origin
        if origin is None:
            raise ValueError("Table object without origin not supported", t)
        location = origin.input_location
        if location is None:
            if origin.parents:
                raise NotImplementedError("Non-loaded (derived) tables not supported")
            raise ValueError("Missing input_location for table", t)
        leaf = LocationTreeNode(location=location, table=t)
        register_node(location.file, child=leaf)

    return [v for v in buf.values() if v.parent is None]
