"""Worked examples of client-side StarTable extension points."""

from pdtable_spark.demo.curation_pipeline import curate
from pdtable_spark.demo.directive_handlers import handle_includes

__all__ = ["curate", "handle_includes"]
