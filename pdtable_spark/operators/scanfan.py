"""Scale-adaptive fan-out for compute-dense scans (r14 optimization).

Spark sizes scan tasks by BYTES (``maxPartitionBytes`` /
``openCostInBytes``), which under-parallelizes operators whose per-row
work dwarfs their I/O: a 0.8 MB embedding table splits into ~7 tasks, so
a gram/pair-cosine fold runs on 7 of 32 cores (measured: gram_matrix
3.48 s -> 0.99 s, margin_mining 3.77 s -> 1.38 s at sf0.1 after fanning
to the core count).  This is guide §2.5's "repartition immediately after
the read" for under-split inputs, with a hard SIZE GATE that makes it
a no-op at scale:

- only local files whose total size is <= ``per_core_bytes`` x cores are
  fanned (the shuffle it introduces is bounded by that product — trivial
  by construction);
- anything bigger, any non-local store, any multi-source plan, or a scan
  already at/above the core count is returned UNCHANGED — at 100 TB the
  scan has thousands of partitions and this function never fires.

Results are layout-independent by the suite's own discipline (exact
integer/decimal aggregates, total-order tie-breaks), pinned by the
partitions=7 oracle sweep.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame

#: fan out only when the whole input fits in this many bytes per core —
#: the introduced shuffle is then bounded by cores x this (128 MB at 32
#: cores), i.e. one scan task's worth of data per guide §6 sizing.
PER_CORE_BYTES = 4 << 20

#: listings larger than this are certainly not "tiny input" — skip
#: without statting anything.
MAX_FILES = 256


def fanout_small_scan(df: DataFrame, per_core_bytes: int = PER_CORE_BYTES) -> DataFrame:
    """Round-robin ``repartition(defaultParallelism)`` for a provably tiny
    local input feeding compute-dense work; identity otherwise (see
    module docstring — the gate, not the repartition, is the point)."""
    try:
        spark = df.sparkSession
        cores = spark.sparkContext.defaultParallelism
        files = df.inputFiles()
        if not files or len(files) > MAX_FILES:
            return df
        total = 0
        for f in files:
            p = re.sub("^file:/+", "/", f)
            if not p.startswith("/") or not os.path.exists(p):
                return df  # non-local storage: never second-guess the scan
            total += os.path.getsize(p)
        if total > per_core_bytes * cores:
            return df
        # provably tiny: estimate the scan's split count from the
        # session's file-packing parameters instead of materializing the
        # physical plan — ``df.rdd.getNumPartitions()`` forces full
        # analysis+optimization of the lineage, measured ~0.8 s of
        # driver time when the input feeds a derived tree (sq_query's
        # decode corpus).  ``ceil((bytes + n*openCost)/maxSplit)`` is a
        # LOWER bound on FilePartition packing, so "est >= cores" only
        # ever skips when the scan truly already fans out; when it
        # underestimates we add one exchange of provably tiny data.
        if _est_scan_tasks(spark, total, len(files)) >= cores:
            return df
        return df.repartition(cores)
    except Exception:
        # multi-source plans / exotic relations: leave the scan alone
        return df


def _est_scan_tasks(spark, total_bytes: int, n_files: int) -> int:
    """Lower bound on the FileSourceScan task count for ``n_files``
    totalling ``total_bytes``, from the same quantities Spark's
    ``FilePartition.maxSplitBytes`` uses (driver-only, no plan walk)."""
    try:
        c = spark._jsparkSession.sessionState().conf()
        mpb = int(c.filesMaxPartitionBytes())
        open_cost = int(c.filesOpenCostInBytes())
    except Exception:
        mpb, open_cost = 128 << 20, 4 << 20
    cores = spark.sparkContext.defaultParallelism
    padded = total_bytes + n_files * open_cost
    max_split = min(mpb, max(open_cost, padded // max(cores, 1) + 1))
    return -(-padded // max(max_split, 1))
