"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right, on=ts, by=keys)``: for each left row, attach the
most recent right row with ``right.ts <= left.ts`` within the same key group.

Spark-first implementation (no pandas, no UDF): union the two sides tagged,
sort within each key partition once, and carry the right side's values
forward with ``last(..., ignorenulls=True)`` over an unbounded-preceding
window.  Cost = ONE shuffle on the key (the window sort), versus the naive
range-join which explodes to O(n·m) pairs.  Skew: the window partitions by
``by`` keys; salt the key upstream if one key dominates.

(Equivalent semantics to pandas ``merge_asof`` / QuestDB ASOF JOIN;
DuckDB's ``ASOF JOIN`` is the oracle in tests.)
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Optional[Union[str, Sequence[str]]] = None,
    right_cols: Optional[List[str]] = None,
    suffix: str = "_right",
    strict: bool = False,
) -> DataFrame:
    """For each left row, the latest right row with ``right.on <= left.on``
    (``<`` if strict), matched within ``by`` groups.

    ``right_cols`` limits which right columns are attached (default: all
    non-key, non-ts columns).  Attached columns are suffixed on collision.
    Right ``on`` is attached as ``{on}{suffix}``.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]

    out_names = {}
    for c in right_cols:
        out_names[c] = c + suffix if c in left.columns else c
    ts_right = on + suffix

    tag = "__is_left__"
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias(tag),
        F.lit(None).cast(right.schema[on].dataType).alias(ts_right),
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c]) for c in right_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on and c not in by],
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias(tag),
        F.col(on).alias(ts_right),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
    ).select(*l_tagged.columns)  # align column order

    unioned = l_tagged.unionByName(r_tagged)
    # Right rows sort before left rows at the same timestamp unless strict:
    # tag asc (0=right first) gives <=; tag desc gives <.
    order = [F.col(on).asc(), F.col(tag).asc() if not strict else F.col(tag).desc()]
    w = (
        Window.partitionBy(*by).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        if by
        else Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[c for c in unioned.columns if c not in (tag, ts_right, *out_names.values())],
        F.col(tag),
        F.last(ts_right, ignorenulls=True).over(w).alias(ts_right),
        *[F.last(out_names[c], ignorenulls=True).over(w).alias(out_names[c]) for c in right_cols],
    )
    return filled.filter(F.col(tag) == 1).drop(tag)
