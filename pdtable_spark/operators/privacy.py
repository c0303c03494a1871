"""Record-level privacy operators: k-anonymity suppression and risk
reporting over quasi-identifier combinations.

The text side of the privacy story lives in ``operators.text`` (PII
pattern redaction inside document bodies); this module covers the
METADATA side: rows whose quasi-identifier combination (region ×
segment × birth-decade × …) is rare enough to re-identify someone must
be suppressed (or their identifiers generalized) before a corpus ships.
Sweeney's k-anonymity is the standard floor: every released row must
share its quasi-identifier combination with at least ``k-1`` others.

Spark-first shape: one map-side-combinable groupBy over the
quasi-identifier columns (partial aggregation absorbs hot combinations
before the shuffle — the reason this spelling beats a count-window over
the same keys at crawl scale), then either a key join back (suppression)
or a second aggregate over the group-size frame (reporting).  No UDFs,
no collects; generalization is plain column arithmetic the caller
applies first (bucket a birth year to its decade, truncate a zip code)
— suppression then enforces whatever granularity survived.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _group_sizes(df: DataFrame, quasi_cols: Sequence[str]) -> DataFrame:
    """Per quasi-identifier combination: its row count.  NULL is a
    legitimate quasi-identifier value (an absent segment is itself
    identifying) — groupBy keys on it like any other value."""
    return df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__n"))


def k_anonymize(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Rows whose quasi-identifier combination occurs at least ``k``
    times — the suppression form of k-anonymity (rare combinations are
    DROPPED; generalize identifiers first if dropping is too lossy).

    The join back is null-SAFE on every quasi column, so rows with NULL
    identifiers are suppressed or kept by their group's size exactly
    like any other group — a plain equi-join would silently drop every
    NULL-keyed row regardless of k.

    Scale: one aggregate + one join, both keyed on the quasi columns;
    the group-size frame is distinct-combination-sized, usually far
    below corpus-sized (AQE broadcasts it when small).
    """
    if k < 1:
        raise ValueError(f"k_anonymize: k must be >= 1, got {k}")
    sizes = _group_sizes(df, quasi_cols).filter(F.col("__n") >= k)
    renamed = sizes.select(
        *[F.col(c).alias(f"__q_{c}") for c in quasi_cols]
    )
    cond = None
    for c in quasi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"__q_{c}"))
        cond = eq if cond is None else (cond & eq)
    return df.join(renamed, cond, "left_semi")


def anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    ks: Iterable[int] = (2, 5, 10, 25),
    sensitive_col: Optional[str] = None,
) -> DataFrame:
    """Re-identification risk report: one row per threshold ``k`` with
    how many quasi-identifier groups (and rows) fall below it — the
    pre-release audit that decides k and whether generalization is
    needed before :func:`k_anonymize`.

    Columns: ``k``, ``n_groups_below``, ``n_rows_below``,
    ``share_rows_below``, plus the k-independent corpus facts
    ``n_groups``, ``min_group_size``, and — when ``sensitive_col`` is
    given — ``min_l_diversity``: the smallest number of DISTINCT
    sensitive values in any group (l-diversity; a group of k identical
    diagnoses is k-anonymous yet discloses the diagnosis).

    Scale: the quasi groupBy, then an aggregate over the
    distinct-combination-sized group frame; the per-k expansion happens
    on that small frame, never on the corpus.
    """
    ks = sorted(set(int(k) for k in ks))
    if not ks or ks[0] < 1:
        raise ValueError(f"anonymity_report: thresholds must be >= 1, got {ks}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(F.col(sensitive_col)).alias("__l"))
    sizes = df.groupBy(*quasi_cols).agg(*aggs)
    per_k = sizes.select(
        F.explode(F.array(*[F.lit(k) for k in ks])).alias("k"),
        F.col("__n"),
        *([F.col("__l")] if sensitive_col is not None else []),
    )
    below = F.when(F.col("__n") < F.col("k"), 1).otherwise(0)
    out = per_k.groupBy("k").agg(
        F.sum(below).cast("long").alias("n_groups_below"),
        F.sum(below * F.col("__n")).cast("long").alias("n_rows_below"),
        (
            F.sum(below * F.col("__n")).cast("double")
            / F.sum(F.col("__n")).cast("double")
        ).alias("share_rows_below"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("__n").cast("long").alias("min_group_size"),
        *(
            [F.min("__l").cast("long").alias("min_l_diversity")]
            if sensitive_col is not None
            else []
        ),
    )
    return out
