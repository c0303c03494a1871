"""Bucketed tables: pay the shuffle once at write time, join for free after.

At 100 TB the dominant cost of repeated fact⋈fact joins is re-shuffling the
same data every query.  Hive-style bucketing persists the hash-partitioning:
``write_bucketed`` shuffles once into N buckets on the join key; every later
equi-join (or aggregation) on that key between same-bucketed tables runs
with NO exchange — Spark's planner proves the co-location from catalog
metadata.

Local/test note: bucketed tables are managed tables in the session
warehouse (``spark.sql.warehouse.dir``); on a cluster back them with an
external metastore path.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Union[str, Sequence[str]],
    num_buckets: int = 32,
    sort_cols: Optional[Union[str, Sequence[str]]] = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) managed table.

    ``sort_cols`` additionally sorts within buckets — upgrades downstream
    sort-merge joins to zero-sort streams.  Choose ``num_buckets`` so one
    bucket ≈ a comfortable task (100-500 MB at scale).
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).format(format).bucketBy(num_buckets, *bucket_cols)
    if sort_cols is not None:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sort_cols)
    try:
        w.saveAsTable(table_name)
        return
    except Exception as e:
        # REACTIVE cleanup only (no pre-emptive DROP/delete): overwrite
        # mode already replaces a cataloged managed table atomically
        # inside saveAsTable, a VIEW or EXTERNAL table of the same name
        # surfaces Spark's own loud error untouched, and nothing is
        # deleted before a write failure has actually occurred.  The one
        # case worth recovering is an ORPHANED managed location: an
        # in-memory catalog (fresh session) forgets the table while its
        # LOCATION survives in the warehouse dir, so saveAsTable fails
        # with LOCATION_ALREADY_EXISTS even in overwrite mode.
        # prefer the structured error class (Spark >= 3.4; this repo
        # targets 4.x); the message-substring fallback applies ONLY when
        # no error class is retrievable — a wrapped/unrelated failure
        # whose message merely mentions the token must not trigger the
        # recovery delete (ADVICE r13)
        err_class = None
        get_cls = getattr(e, "getErrorClass", None)
        if callable(get_cls):
            try:
                err_class = get_cls()
            except Exception:
                err_class = None
        matched = (
            err_class == "LOCATION_ALREADY_EXISTS"
            if err_class is not None
            else "LOCATION_ALREADY_EXISTS" in str(e)
        )
        if mode != "overwrite" or not matched:
            raise
        orig_err = e  # `e` is unbound past the except clause (PEP 3110)
    # derive the stale managed path FROM THE CATALOG (database location
    # + bare name), never by string-concatenating
    # spark.sql.warehouse.dir — a guessed path could recursively delete
    # an unrelated table's live data and still miss the real stale dir
    # for a database-qualified name
    spark = df.sparkSession
    parts = table_name.split(".")
    db = parts[-2] if len(parts) > 1 else spark.catalog.currentDatabase()
    try:
        db_loc = spark.catalog.getDatabase(db).locationUri
    except Exception:
        # an odd catalog state must surface the ORIGINAL saveAsTable
        # failure, not a confusing secondary lookup error (ADVICE r13)
        raise orig_err
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(
        db_loc.rstrip("/") + "/" + parts[-1].lower()
    )
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        fs.delete(jpath, True)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Union[str, List[str]],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket counts and keys the physical plan contains no
    Exchange on either side (verify with ``assert_no_shuffle``).  Broadcast
    is disabled for this join so the planner demonstrates the bucket path
    even on small test data.
    """
    on = [on] if isinstance(on, str) else list(on)
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("merge").join(right, on=on, how=how)


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the physical plan contains a shuffle exchange — used by
    tests (and pipeline authors) to pin the bucket-join guarantee."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan:
        raise AssertionError(f"plan contains a shuffle exchange:\n{plan}")
