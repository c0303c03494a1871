"""The declared query suite: every operator from SURVEY §2 plus the
LLM-pipeline extensions, each as a (spark_fn, oracle_sql) pair."""

from pdtable_spark.queries.suite import ORACLES, QUERIES  # noqa: F401
