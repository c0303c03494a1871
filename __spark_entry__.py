"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship multi-join query on sf0.001.
``queries()`` — every declared operator (SURVEY §2 + LLM-pipeline
extensions), from ``pdtable_spark.queries.suite``.
``oracle_sql()`` — matching DuckDB SQL for each SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdtable_spark.queries.suite import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: star-join revenue by nation
    (exercises scans, broadcast dims, shuffle join, decimal-exact agg)."""
    return QUERIES["q5_region_volume"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
