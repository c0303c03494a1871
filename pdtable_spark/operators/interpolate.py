"""Time-weighted linear interpolation at query timestamps — the
time-series gap-fill/resample primitive (pandas ``interpolate`` /
InfluxDB-style), built from two as-of passes.

For each query row, find the last point at-or-before (backward as-of) and
the first point strictly after (forward as-of), then blend linearly in
time.  Cost = the two window passes of :func:`asof_join` over the same key
partitioning — ONE shuffle on the key, never a range explosion.  Edge
rules: only a previous point → its value (flat-forward); only a next →
its value (flat-backward); neither → null.

Determinism: timestamps are compared as exact integer microseconds; the
blend ``prev + (next − prev) · frac`` is a single IEEE expression tree —
bit-identical on any engine given the same points (assumes unique point
timestamps per key, the usual time-series contract; ties would need an
explicit sequence tie-break).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdtable_spark.operators.asof import asof_join


def interpolate_at(
    points: DataFrame,
    queries: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    value_col: str = "value",
    out_col: str = "interp_value",
) -> DataFrame:
    """Attach ``out_col`` to ``queries``: the value series of ``points``
    linearly interpolated at each query's ``on`` timestamp, per ``by`` key."""
    pts = points.select(by, on, value_col)
    back = asof_join(
        queries, pts, on=on, by=by, right_cols=[value_col], direction="backward"
    ).withColumnsRenamed({value_col: "__prev_val", on + "_right": "__prev_ts"})
    both = asof_join(
        back, pts, on=on, by=by, right_cols=[value_col], direction="forward", strict=True
    ).withColumnsRenamed({value_col: "__next_val", on + "_right": "__next_ts"})

    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    frac = (us(on) - us("__prev_ts")).cast("double") / (
        us("__next_ts") - us("__prev_ts")
    ).cast("double")
    interp = (
        F.when(F.col("__prev_ts").isNull() & F.col("__next_ts").isNull(), F.lit(None))
        .when(F.col("__prev_ts").isNull(), F.col("__next_val"))
        .when(F.col("__next_ts").isNull(), F.col("__prev_val"))
        .otherwise(
            F.col("__prev_val") + (F.col("__next_val") - F.col("__prev_val")) * frac
        )
    )
    drop = ["__prev_val", "__prev_ts", "__next_val", "__next_ts"]
    return both.withColumn(out_col, interp.cast("double")).drop(*drop)
