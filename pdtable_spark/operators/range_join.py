"""Point-in-interval (range) join — an operator stock Spark plans as a
broadcast-nested-loop or cartesian product.

``interval_join(points, intervals)``: attach every interval containing the
point (``start <= t < end``).  The naive non-equi join degenerates to
O(n·m) comparisons; this implementation buckets both sides on a time grain
so the join becomes an *equi*-join on the bucket id, with the exact
containment predicate applied only within matching buckets:

- each point lands in exactly one bucket;
- each interval is exploded into the buckets it overlaps (an interval
  spanning k grains costs k rows — pick ``grain`` near the typical interval
  length so k stays small);
- Spark then shuffle-hash/sort-merge joins on (optional keys +) bucket —
  standard scalable equi-join machinery, AQE/skew handling included.

Same bucketing trick as Databricks' range-join optimization and PostGIS
grid joins.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__bucket"


def _to_long(c: Column) -> Column:
    """Seconds-since-epoch for timestamps; pass numerics through."""
    return F.when(F.lit(True), c).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str = "start",
    end_col: str = "end",
    by: Optional[Union[str, Sequence[str]]] = None,
    grain_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to interval rows with ``start <= point < end``
    (optionally also matching ``by`` keys).

    ``grain_seconds`` is the bucket width (for numeric columns: plain
    units).  Intervals spanning many grains are exploded per grain — choose
    a grain comparable to typical interval length.
    """
    by = [by] if isinstance(by, str) else list(by or [])

    p = points.withColumn(_BUCKET, (_to_long(F.col(point_col)) / grain_seconds).cast("long"))
    b0 = (_to_long(F.col(start_col)) / grain_seconds).cast("long")
    # end is exclusive: an interval ending exactly on a grain boundary does
    # not occupy the next bucket
    b1 = ((_to_long(F.col(end_col)) - 1) / grain_seconds).cast("long")
    iv = intervals.withColumn(_BUCKET, F.explode(F.sequence(b0, F.greatest(b1, b0))))

    cond = (
        (F.col(start_col) <= F.col(point_col))
        & (F.col(point_col) < F.col(end_col))
    )
    out = p.join(iv, on=[*by, _BUCKET], how="inner").filter(cond).drop(_BUCKET)
    if how == "inner":
        return out
    if how == "left":
        # re-attach unmatched points (anti join on the matched set)
        matched_keys = out.select(*points.columns).dropDuplicates(points.columns)
        unmatched = points.join(matched_keys, points.columns, "left_anti")
        for c in intervals.columns:
            if c not in points.columns:
                unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
        return out.unionByName(unmatched)
    raise ValueError(f"Unsupported how: {how!r} (inner|left)")
