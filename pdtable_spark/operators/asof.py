"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right, on=ts, by=keys)``: for each left row, attach the
most recent right row with ``right.ts <= left.ts`` within the same key group
(or the earliest after / the nearest, per ``direction``).

Spark-first implementation (no pandas, no UDF): union the two sides tagged,
sort within each key partition once, and carry the right side's values
forward with ``last(..., ignorenulls=True)`` over an unbounded-preceding
window (backward), or backward with ``first(...)`` over unbounded-following
(forward).  Cost = ONE shuffle on the key (the window sort), versus the
naive range-join which explodes to O(n·m) pairs.  Skew: the window
partitions by ``by`` keys; salt the key upstream if one key dominates.

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
    direction: str = "backward",
    tolerance: Optional[float] = None,
) -> DataFrame:
    """pandas ``merge_asof``-style join, single-shuffle.

    - ``direction``: 'backward' (most recent right at/before; default),
      'forward' (earliest right at/after), or 'nearest' (the closer of the
      two; backward wins exact ties).  All three are window passes over the
      same ``by``-partitioning — nearest costs one extra in-partition sort,
      no extra shuffle.
    - ``strict``: exclude equal timestamps (``<`` / ``>`` instead of
      ``<=`` / ``>=``).
    - ``tolerance``: maximum |left.on − right.on| in the column's native
      units (seconds for timestamps); matches further away become nulls.
    - ``right_cols`` limits which right columns attach (default: all
      non-key, non-ts).  Collisions get ``suffix``; right's ``on`` is
      attached as ``{on}{suffix}``.

    Determinism contract: if the RIGHT side has duplicate ``on`` values
    within a key, which duplicate's attributes attach is unspecified (the
    window tie-break covers only left-vs-right at equal ts, not
    right-vs-right).  Deduplicate the right side on (key, on) first — the
    usual time-series contract — when attached values must be reproducible.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]

    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}
    ts_right = on + suffix

    tag = "__is_left__"
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias(tag),
        F.lit(None).cast(right.schema[on].dataType).alias(ts_right),
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c]) for c in right_cols],
    )
    r_tagged = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c != on and c not in by
        ],
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias(tag),
        F.col(on).alias(ts_right),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
    ).select(*l_tagged.columns)  # align column order

    unioned = l_tagged.unionByName(r_tagged)

    def window(reverse_ties: bool, following: bool):
        # Tie order decides <= vs <: for backward, right-before-left at the
        # same ts includes equal timestamps; for forward, right-after-left.
        tie = F.col(tag).asc() if not reverse_ties else F.col(tag).desc()
        w = Window.partitionBy(*by) if by else Window.partitionBy()
        w = w.orderBy(F.col(on).asc(), tie)
        if following:
            return w.rowsBetween(0, Window.unboundedFollowing)
        return w.rowsBetween(Window.unboundedPreceding, 0)

    w_back = window(reverse_ties=strict, following=False)
    w_fwd = window(reverse_ties=not strict, following=True)

    ts_is_temporal = str(left.schema[on].dataType.typeName()).startswith(
        ("timestamp", "date")
    )

    def _num(c):
        """Fractional-seconds numeric view of an `on`-typed expression for
        distance math.  TIMESTAMP_NTZ/DATE reject a straight double cast in
        Spark 4; route them through unix_micros (sub-second exact).

        Caveats (documented contract): for temporal `on` columns, tolerance
        and nearest-side distances are ALWAYS in seconds — including DATE
        columns, where 1 day = 86400 s, not "the column's native unit".  The
        NTZ/DATE → TIMESTAMP cast interprets wall clocks in the session
        timezone, so distance math assumes a UTC (or DST-free) session tz:
        around a DST transition under a zoned session tz, nearest-side
        selection and tolerances can skew by up to the DST offset.  Run with
        ``spark.sql.session.timeZone=UTC`` (the engine's default) for exact
        semantics."""
        if ts_is_temporal:
            return F.unix_micros(c.cast("timestamp")) / F.lit(1_000_000.0)
        return c.cast("double")

    def fills(col_name):
        """(backward_fill, forward_fill) expressions for one attached col."""
        return (
            F.last(col_name, ignorenulls=True).over(w_back),
            F.first(col_name, ignorenulls=True).over(w_fwd),
        )

    attached = [ts_right] + [out_names[c] for c in right_cols]
    base_cols = [c for c in unioned.columns if c not in (tag, *attached)]

    if direction in ("backward", "forward"):
        pick = (lambda b, f: b) if direction == "backward" else (lambda b, f: f)
        filled = unioned.select(
            *base_cols, F.col(tag), *[pick(*fills(c)).alias(c) for c in attached]
        )
    else:  # nearest
        tb, tf = fills(ts_right)
        d_back = F.abs(_num(F.col(on)) - _num(tb))
        d_fwd = F.abs(_num(F.col(on)) - _num(tf))
        use_back = tb.isNotNull() & (tf.isNull() | (d_back <= d_fwd))
        filled = unioned.select(
            *base_cols,
            F.col(tag),
            *[F.when(use_back, fills(c)[0]).otherwise(fills(c)[1]).alias(c) for c in attached],
        )

    out = filled.filter(F.col(tag) == 1).drop(tag)
    if tolerance is not None:
        in_tol = F.abs(_num(F.col(on)) - _num(F.col(ts_right))) <= tolerance
        out = out.select(
            *[c for c in out.columns if c not in attached],
            *[F.when(in_tol, F.col(c)).otherwise(F.lit(None)).alias(c) for c in attached],
        )
    return out
