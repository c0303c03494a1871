"""Fuzzy (edit-distance) joins — approximate string matching at scale.

The naive form is a cross join with a ``levenshtein() <= k`` filter: O(n·m)
comparisons, a guaranteed scale-killer.  This module blocks on string
LENGTH first: edit distance ≤ k implies |len(a) − len(b)| ≤ k, so
candidates only need to meet within length bands.  Each left row explodes
to the ≤ ⌈2k/(k+1)⌉+1 ≈ 3 bands its matches can live in; the join is then
an equi-join on the band key and the exact distance filter runs only on
band-mates.  At 100 TB, compose the band key with a second cheap signature
(first character, character-frequency sketch) to cut candidates further —
the necessary-condition structure is the same.

``F.levenshtein`` is JVM-side codegen (no UDF); DuckDB's ``levenshtein``
computes the identical unit-cost metric, so results are fully
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    dist_col: str = "dist",
) -> DataFrame:
    """Inner-join rows whose strings are within ``max_dist`` edits.

    Length-band blocking (band width ``max_dist + 1``): the right side maps
    to its own band, the left side explodes to every band a string within
    ``max_dist`` edits could occupy.  Complete by the length necessary
    condition; exact by the final levenshtein filter.
    """
    w = max_dist + 1
    ll = F.length(F.col(left_col))
    lr = F.length(F.col(right_col))
    a = left.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.floor((ll - F.lit(max_dist)) / w), F.floor((ll + F.lit(max_dist)) / w)
            )
        ),
    )
    b = right.withColumn("__band", F.floor(lr / w))
    dist = F.levenshtein(F.col(left_col), F.col(right_col))
    return (
        a.join(b, "__band")
        .filter(F.abs(ll - lr) <= max_dist)
        .filter(dist <= max_dist)
        .withColumn(dist_col, dist.cast("int"))
        .drop("__band")
    )


def fuzzy_self_pairs(
    df: DataFrame, col: str, id_col: str, max_dist: int = 2, dist_col: str = "dist"
) -> DataFrame:
    """All unordered pairs of rows whose ``col`` values are within
    ``max_dist`` edits (``id_a < id_b``); the dedup-style spelling of
    :func:`fuzzy_join` against itself."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(col).alias("__sa"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(col).alias("__sb"))
    out = fuzzy_join(a, b, "__sa", "__sb", max_dist=max_dist, dist_col=dist_col)
    return out.filter(F.col("id_a") < F.col("id_b")).select(
        "id_a",
        "id_b",
        F.col("__sa").alias(col + "_a"),
        F.col("__sb").alias(col + "_b"),
        dist_col,
    )
