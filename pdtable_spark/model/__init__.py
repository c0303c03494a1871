"""Core data model: table/column metadata, units, origin lineage, issues."""
