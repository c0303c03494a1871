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
