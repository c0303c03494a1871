"""Table bundle: ordered multi-map of tables parsed from a block stream.

Parity with reference ``pdtable/store.py:53-148`` (``TableBundle``):
- build from a block iterator, keeping only TABLE blocks (store.py:64-102)
- access by attribute (store.py:104), by name or positional index
  (store.py:110-120)
- ``unique()`` raising ``TableNameNotUniqueInBundleError`` (store.py:133-143)
- ``all(name)`` (store.py:145-148), ``__contains__``/``__iter__``/``__len__``
  (store.py:122-131)

Spark extension: ``register_views`` publishes every table as a temp view so
the whole bundle is queryable via ``spark.sql`` — the bundle becomes a
catalog, which is the idiomatic Spark spelling of "a file with many tables".
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Dict, Iterable, Iterator, List, Tuple, Union


class TableNameNotUniqueInBundleError(LookupError):
    """unique() found multiple tables with the same name (store.py:133-143)."""


class TableBundle:
    """Ordered collection of tables; names need not be unique."""

    def __init__(self, block_stream: Iterable[Tuple[Any, Any]]):
        from pdtable_spark.parsers.blocks import BlockType

        self._tables: List[Any] = []
        self._index: Dict[str, List[int]] = defaultdict(list)
        for block_type, block in block_stream:
            if block_type == BlockType.TABLE and block is not None:
                name = getattr(block, "name", None)
                self._index[name].append(len(self._tables))
                self._tables.append(block)

    # -- access ---------------------------------------------------------------

    def __getattr__(self, name: str):
        # attribute access (store.py:104); raises AttributeError for pythonic
        # hasattr() behavior
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            return self.unique(name)
        except LookupError as e:
            raise AttributeError(name) from e

    def __getitem__(self, key: Union[str, int]):
        if isinstance(key, int):
            return self._tables[key]
        return self.unique(key)

    def unique(self, name: str):
        """The table of this name, raising if absent or ambiguous
        (store.py:133-143)."""
        hits = self._index.get(name, [])
        if not hits:
            raise LookupError(f"No table named '{name}' in bundle")
        if len(hits) > 1:
            raise TableNameNotUniqueInBundleError(
                f"{len(hits)} tables named '{name}' in bundle"
            )
        return self._tables[hits[0]]

    def all(self, name: str) -> List[Any]:
        """Every table of this name, in stream order (store.py:145-148)."""
        return [self._tables[i] for i in self._index.get(name, [])]

    def __contains__(self, name: str) -> bool:
        return name in self._index

    def __iter__(self) -> Iterator[Any]:
        """Iterates over the tables in stream order (reference parity,
        store.py:125-127)."""
        return iter(self._tables)

    def keys(self) -> Iterator[str]:
        """Iterates over table names (insertion order, unique)."""
        return iter(self._index)

    def __len__(self) -> int:
        return len(self._tables)

    # -- Spark catalog integration ---------------------------------------------

    def register_views(self, prefix: str = "") -> List[str]:
        """Register each uniquely-named table as a Spark temp view
        ``{prefix}{name}`` so the bundle is queryable via ``spark.sql``.

        Returns the view names registered.  Non-unique names are skipped
        (ambiguous — use ``all(name)`` and register manually).
        """
        registered: List[str] = []
        for name, hits in self._index.items():
            if name is None or len(hits) != 1:
                continue
            table = self._tables[hits[0]]
            view = f"{prefix}{name}"
            table.df.createOrReplaceTempView(view)
            registered.append(view)
        return registered


#: Modern alias (the reference keeps ``TableBundle`` for history).
Bundle = TableBundle
