"""Worked directive-handler examples.

Directives (``***name`` blocks) are *interpreted by client code*: the parser
yields them as :class:`~pdtable_spark.auxiliary.Directive` blocks and a
handler is simply a generator transform over the block stream — consume the
directives you understand, pass everything else through.

Two worked examples (parity surface:
``/root/reference/pdtable/demo/directive_handlers.py:9-53``):

- :func:`handle_includes` — the classic ``***include`` directive as a plain
  stream transform over ``read_csv`` output.  Unlike the production loader
  machinery (``io/load``: root confinement, mtime-stamped loop detection,
  issue tracking), this demo form does NO loop checking — mutual includes
  recurse forever, exactly as the reference documents for its demo.
- :func:`handle_context` — a custom directive showing the general shape:
  ``***context`` lines are collected and attached to subsequent table
  metadata, demonstrating that handlers can carry state across blocks.

For production include handling use :func:`pdtable_spark.io.load.load_files`,
which routes the same directives through confined loaders with loop
detection; for custom *protocols* (e.g. ``http:`` sources) pass
``additional_protocol_loaders`` there instead.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Union

from pdtable_spark.auxiliary import Directive
from pdtable_spark.parsers.blocks import BlockIterator, BlockType


def handle_includes(
    bg: BlockIterator, input_dir: Union[str, Path], recursive: bool = False
) -> BlockIterator:
    """Expand ``***include`` directives inline: each directive line names a
    CSV file in ``input_dir`` whose blocks replace the directive in the
    stream.  ``recursive=True`` also expands includes found in included
    files (no circular-reference check — demo semantics)."""
    from pdtable_spark.io.csv import read_csv

    expand = (
        functools.partial(handle_includes, input_dir=input_dir, recursive=recursive)
        if recursive
        else (lambda stream: stream)
    )
    for block_type, block in bg:
        if block_type == BlockType.DIRECTIVE and block.name == "include":
            for filename in block.lines:
                yield from expand(read_csv(Path(input_dir) / filename))
        else:
            yield block_type, block


def handle_context(bg: BlockIterator) -> BlockIterator:
    """Attach ``***context`` directive lines to every subsequent table's
    metadata (``table.metadata.origin`` stays untouched; the lines land in a
    ``context`` attribute) — the minimal template for stateful custom
    directives."""
    context: list = []
    for block_type, block in bg:
        if block_type == BlockType.DIRECTIVE and block.name == "context":
            context = list(block.lines)
            continue
        if block_type == BlockType.TABLE and context:
            try:
                block.metadata.context = list(context)
            except AttributeError:
                pass
        yield block_type, block
