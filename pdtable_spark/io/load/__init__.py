"""Input-set loading: ``***include`` directives, directory scans, origin
tracking, multi-extension (csv / xlsx / parquet) and multi-protocol support.

Parity with reference ``pdtable/io/load/__init__.py``; composable so
project-specific storage (records systems, object stores) can plug in as
additional protocol loaders.

Example::

    blocks = load_files(["/"], root_folder=folder, csv_sep=";", spark=spark)
    bundle = TableBundle(blocks)
    print("\\n".join(str(n) for n in make_location_trees(iter(bundle))))
"""

from ._protocol import CallableReader, LoadError, LoadOrchestrator, LoadProxy, Loader, Reader
from ._loaders import (
    FileReader,
    FileSystemLoader,
    FolderReader,
    IncludeLoader,
    IncludeReader,
    ProtocolLoader,
    make_loader,
)
from ._orchestrators import load_files, queued_load
from ._tree import LocationTreeNode, make_location_trees

__all__ = [
    "CallableReader",
    "FileReader",
    "FileSystemLoader",
    "FolderReader",
    "IncludeLoader",
    "IncludeReader",
    "LoadError",
    "LoadOrchestrator",
    "LoadProxy",
    "Loader",
    "LocationTreeNode",
    "ProtocolLoader",
    "Reader",
    "load_files",
    "make_loader",
    "make_location_trees",
    "queued_load",
]
