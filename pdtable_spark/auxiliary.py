"""Ancillary block types: file-level metadata and directives.

Parity with reference ``pdtable/auxiliary.py:7-25``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

CSV_SEP = ";"  # StarTable default field separator (reference __init__.py:5)


class MetadataBlock(dict):
    """File-level ``key: value`` metadata (author:, purpose:, ...)."""

    def __init__(self, origin: Optional[str] = None):
        super().__init__()
        self.origin = origin

    def __repr__(self):
        return "\n".join(f"{k}:{CSV_SEP}{self[k]}{CSV_SEP}" for k in self)


@dataclass
class Directive:
    """A ``***name`` directive block; interpreted by client code (e.g. include)."""

    name: str
    lines: List[str] = field(default_factory=list)
    origin: Optional[str] = None

    def __repr__(self):
        return f"***{self.name}{CSV_SEP}\n" + "\n".join(self.lines)
