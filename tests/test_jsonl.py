"""JSONL corpus source/sink: schema-enforced reads, corrupt-line
quarantine, committer-backed writes."""

import json
import os

from pyspark.sql import functions as F

from pdtable_spark.io import jsonl


def test_jsonl_round_trip(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "corpus")
    jsonl.write_jsonl(docs, out, compression=None, partitions=3)
    back = jsonl.read_jsonl(spark, out)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b
    # multiple part files were written (partition control works)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 3


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "good one", "lang": "en", "source": "s", "n_chars": 8}),
        "{this is not json",
        json.dumps({"doc_id": 2, "text": "also fine", "lang": "en", "source": "s", "n_chars": 9}),
        '"a bare string is not an object"',
    ]
    p.write_text("\n".join(lines) + "\n")
    good = jsonl.read_jsonl(spark, str(p))
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    assert "_corrupt_record" not in good.columns
    bad = jsonl.bad_lines_df(spark, str(p))
    raws = [r["raw_line"] for r in bad.collect()]
    assert len(raws) == 2 and "{this is not json" in raws


def test_jsonl_gzip_round_trip(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    out = str(tmp_path / "gz")
    jsonl.write_jsonl(docs, out, compression="gzip", partitions=1)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert parts and parts[0].endswith(".gz")
    assert jsonl.read_jsonl(spark, out).count() == 20


def test_jsonl_stream_ingestion(spark, tmp_path):
    """Streaming JSONL ingestion: files landed in the directory flow through
    a (batch-identical) text-stats pipeline into a memory sink."""
    from pdtable_spark.io.jsonl import read_jsonl_stream
    from pdtable_spark.operators import text as text_ops
    from pdtable_spark.streaming import run_to_memory

    land = tmp_path / "landing"
    land.mkdir()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    docs.coalesce(1).write.mode("overwrite").json(str(tmp_path / "stage"))
    import glob as g
    import shutil

    for i, f in enumerate(g.glob(str(tmp_path / "stage" / "part-*"))):
        shutil.copy(f, land / f"batch-{i}.jsonl")
    stream = read_jsonl_stream(spark, str(land)).withColumn(
        "n_tokens", text_ops.token_count(F.col("text"))
    )
    assert stream.isStreaming
    run_to_memory(stream, "jsonl_ingest")
    got = spark.sql("SELECT count(*) AS n FROM jsonl_ingest").collect()[0]["n"]
    assert got == 50
