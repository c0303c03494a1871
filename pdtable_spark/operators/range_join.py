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


def _to_num(df: DataFrame, name: str) -> Column:
    """Fractional seconds-since-epoch for timestamp columns (tz'd or NTZ);
    numerics pass through as double.

    Double, NOT truncated long: truncation would misplace fractional points
    (and trunc≠floor for negatives), silently dropping matches whose point
    bucket differs from every interval bucket."""
    c = F.col(name)
    if dict(df.dtypes).get(name, "").startswith("timestamp"):
        # NTZ casts to timestamp in the session zone; unix_micros keeps
        # sub-second precision (a straight double cast rejects NTZ)
        return F.unix_micros(c.cast("timestamp")) / F.lit(1_000_000.0)
    return c.cast("double")


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

    # floor() on the un-truncated value: correct for fractional domains,
    # sub-second timestamps, and negative values (floor ≠ trunc there)
    p = points.withColumn(_BUCKET, F.floor(_to_num(points, point_col) / grain_seconds))
    b0 = F.floor(_to_num(intervals, start_col) / grain_seconds)
    # explode through floor(end/grain) inclusive; an interval whose exclusive
    # end sits exactly on a grain boundary costs one extra candidate bucket,
    # and the exact containment predicate discards those rows
    b1 = F.floor(_to_num(intervals, end_col) / grain_seconds)
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
