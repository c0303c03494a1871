"""Worked examples of client-side StarTable extension points."""

from pdtable_spark.demo.directive_handlers import handle_includes

__all__ = ["handle_includes"]
