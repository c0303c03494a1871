"""JSON-Lines corpus I/O — the interchange format of large text-corpus
pipelines (one JSON object per line, newline-delimited, gz/zstd-splittable
per file).

Spark-first design notes:

- **Always pass an explicit schema at scale.**  ``spark.read.json`` without
  a schema runs a full inference pass over the data — at 100 TB that is a
  second complete scan before the first real job.  ``read_jsonl`` therefore
  requires (or defaults) a schema and never infers.
- **Corrupt lines are data, not crashes.**  A trillion-line crawl always
  has malformed records; the default read drops them (DROPMALFORMED) while
  ``bad_lines_df`` / ``keep_corrupt=True`` give the quarantine view with
  the raw text of every unparseable line — count it, sample it, file it.
- The JSON parser is JVM-side (Jackson) — no Python in the scan path; each
  file (or each split of an uncompressed file) parses in its own task.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Default corpus schema: matches the documents testdata table.
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: Optional[T.StructType] = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a JSONL corpus with an explicit schema (no inference scan).

    ``keep_corrupt=True`` appends a ``_corrupt_record`` string column holding
    the raw line for records that failed to parse (all data columns null);
    otherwise malformed lines are dropped after counting is possible via
    :func:`bad_lines_df`.
    """
    schema = schema or DOCUMENT_SCHEMA
    if keep_corrupt:
        # Spark disallows predicates that reference ONLY the corrupt-record
        # column of a raw JSON scan; parsing text lines through from_json
        # sidesteps the restriction with the same executor-side Jackson path.
        read_schema = T.StructType(
            schema.fields + [T.StructField(_CORRUPT, T.StringType())]
        )
        raw = spark.read.text(path)
        parsed = raw.select(
            F.from_json(
                F.col("value"),
                read_schema,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
            ).alias("j"),
            F.col("value"),
        )
        return parsed.select(
            *[F.col(f"j.{f.name}").alias(f.name) for f in schema.fields],
            F.when(F.col(f"j.{_CORRUPT}").isNotNull(), F.col("value")).alias(_CORRUPT),
        )
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)


def bad_lines_df(
    spark: SparkSession, path: str, schema: Optional[T.StructType] = None
) -> DataFrame:
    """The quarantine view: raw text of every line that failed to parse
    against the schema."""
    df = read_jsonl(spark, path, schema, keep_corrupt=True)
    return df.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: Optional[T.StructType] = None,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Continuous corpus ingestion: a Structured Streaming file source over
    a JSONL landing directory — new files picked up per micro-batch,
    exactly-once via checkpointed file tracking.  ``max_files_per_trigger``
    bounds batch size for backpressure.  Compose with the corpus operators
    (they are plain column expressions, so the same pipeline runs batch or
    streaming) and a checkpointed sink (``streaming.sinks``)."""
    reader = spark.readStream.schema(schema or DOCUMENT_SCHEMA).option(
        "mode", "DROPMALFORMED"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: Optional[str] = "gzip",
    partitions: Optional[int] = None,
) -> None:
    """Write a DataFrame as JSONL part-files via the Hadoop committer
    (task-atomic, speculative-execution-safe — same guarantees as parquet
    writes).  ``partitions`` repartitions first to control output file count
    and size; compressed files are one-split-per-file on read, so target
    ~100-500 MB per part at scale.
    """
    if partitions is not None:
        df = df.repartition(partitions)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
