"""Beyond-reference operators for large-scale training-data pipelines:
deduplication, similarity search, text analysis (incl. the Gopher and C4
rule sets), sampling/mixing, corpus drift monitoring, as-of joins,
multimodal columns.  All designed Spark-first: built-in column expressions (JVM-side,
codegen-friendly) wherever possible; Arrow-batched pandas only where
semantics demand it (SURVEY §7 step 11)."""
