"""Session factory with the engine's recommended Spark configuration.

One place encoding the 100 TB posture so every entry point (tests, bench,
driver contract, user code) runs with the same tuning:

- **AQE on** (runtime re-planning, partition coalescing, skew-join
  splitting) — the single biggest resilience lever at scale.
- **Shuffle partitions** sized to cores locally; on a real cluster set
  ``shuffle_partitions≈2-3× total executor cores`` (AQE coalesces down, it
  cannot split a too-coarse non-skewed shuffle).
- **maxPartitionBytes 128m** — scan-task granularity; with 100 TB inputs
  that is ~800k tasks, the planner's sweet spot between scheduling overhead
  and per-task memory.
- **Arrow enabled** for every Pandas interchange (mapInPandas /
  applyInPandas / toPandas).
- **UTC session timezone** — cross-engine timestamp determinism (the oracle
  gate depends on it; production pipelines should pin it for the same
  reason).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "pdtable_spark",
    master: Optional[str] = None,
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[Dict[str, str]] = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[N]`` with N from ``SPARK_GRAFT_CPUS`` (or
    all cores); on a cluster pass ``master=None`` with a pre-configured
    ``spark.master`` in the environment and only the tuning below applies.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # TIMESTAMP(NANOS) parquet (e.g. the events table) reads as long +
        # explicit µs truncation instead of erroring (io.parquet.read_nanos_parquet)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
