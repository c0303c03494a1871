"""Skew-mitigation utilities: salted joins and salted aggregation.

Spark's AQE handles moderate skew (``skewJoin.enabled`` splits oversized
partitions), but pathological hot keys — a null-heavy foreign key, a
celebrity user, an empty-string document — still serialize one reducer.
Salting is the classic fix:

- **salted_join**: replicate the build side R times, spray the hot side's
  rows across R sub-keys.  Shuffle volume: build side ×R (choose a small R),
  probe side unchanged, hot key now spread over R reducers.
- **salted_agg**: two-phase aggregation through a salt column — partial
  per (key, salt), final per key.  Only needed for non-algebraic aggs
  (e.g. ``collect_list``); sums/counts already combine map-side.

Both are plain DataFrame transformations — no RDDs, AQE-compatible.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
    right_is_small: bool = False,
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``salt`` sub-keys.

    ``right`` is replicated ``salt`` times (one copy per salt value) — use
    for a *moderately* sized right side that is too big to broadcast but
    whose ×salt replication is still cheaper than a serialized hot reducer.
    If the right side fits in memory, skip salting entirely and
    ``F.broadcast`` it (``right_is_small=True`` does this as a convenience —
    a broadcast join has no shuffle to skew).
    """
    if right_is_small:
        return left.join(F.broadcast(right), list(on), how)

    keys = list(on)
    salted_left = left.withColumn(_SALT, (F.rand(seed=7) * salt).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias(_SALT)
    salted_right = right.select("*", salts)
    out = salted_left.join(salted_right, keys + [_SALT], how)
    return out.drop(_SALT)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt: int = 16,
    *,
    partial_aggs: List[Column],
    final_aggs: List[Column],
) -> DataFrame:
    """Two-phase aggregation through a salt: groupBy(keys + salt) with
    ``partial_aggs``, then groupBy(keys) with ``final_aggs`` over the
    partials.  Caps any single reducer's input at ~|hot key| / salt.

    Example (collect distinct values under a hot key)::

        salted_agg(df, ["k"], partial_aggs=[F.collect_set("v").alias("vs")],
                   final_aggs=[F.array_distinct(F.flatten(F.collect_list("vs"))).alias("vs")])
    """
    keys = list(keys)
    salted = df.withColumn(_SALT, (F.rand(seed=7) * salt).cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def top_frequent_keys(df: DataFrame, key: str, n: int = 20) -> DataFrame:
    """Diagnostic: the n most frequent key values with counts — run this
    before deciding a join needs salting (sorted by count desc)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"), F.asc_nulls_first(key))
        .limit(n)
    )


def skew_report(df: DataFrame, key: str, n: int = 20) -> DataFrame:
    """Key-skew diagnostic with context: the ``n`` hottest key values with
    row count, corpus share, and skew factor (count / mean-rows-per-key) —
    the number that says how many salt sub-keys a join on this key needs
    (a hot key at factor 40 wants salt ≈ 40 to level its reducer).

    Returns (key, n_rows, share, skew_factor, rank) sorted hottest-first
    with a key tie-break (total order → reproducible).

    Plan shape: ONE map-side-combinable ``groupBy(key).count()``; the
    totals are aggregates OVER that counts frame (key-cardinality-sized,
    not corpus-sized) broadcast back as a single row — Spark reuses the
    counts exchange across the two branches at runtime, and the top-n is
    a TakeOrdered, never a global sort.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__total"), F.count(F.lit(1)).alias("__nkeys")
    )
    w = Window.orderBy(F.desc("n_rows"), F.asc_nulls_first(key))
    top = (
        counts.orderBy(F.desc("n_rows"), F.asc_nulls_first(key))
        .limit(n)
        .withColumn("rank", F.row_number().over(w))
    )
    return top.crossJoin(F.broadcast(totals)).select(
        key,
        "n_rows",
        (F.col("n_rows").cast("double") / F.col("__total").cast("double")).alias(
            "share"
        ),
        (
            F.col("n_rows").cast("double")
            / (F.col("__total").cast("double") / F.col("__nkeys").cast("double"))
        ).alias("skew_factor"),
        "rank",
    )
