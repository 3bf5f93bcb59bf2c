"""JSONL corpus boundary: round-trip vs the parquet documents table,
corrupt-line quarantine, and partitioned layout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_2025_spark.io import read_jsonl, read_table, write_jsonl


def test_documents_roundtrip(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    # cache before filtering on _corrupt_record: Spark disallows
    # corrupt-column-only queries straight off the raw scan
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — see read_jsonl docstring
    back = (
        read_jsonl(spark, path, schema=docs.schema)
        .cache()
        .filter(F.col("_corrupt_record").isNull())
        .drop("_corrupt_record")
    )
    assert back.count() == docs.count()
    want = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == want


def test_corrupt_lines_quarantined_not_dropped(spark, tmp_path):
    src = tmp_path / "mixed.jsonl"
    src.write_text(
        '{"doc_id": 1, "text": "good"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also good"}\n'
        '{"doc_id": "not-a-number", "text": "bad type"}\n'
    )
    df = read_jsonl(
        spark, str(src), schema="doc_id long, text string"
    ).cache()
    clean = df.filter(F.col("_corrupt_record").isNull())
    quarantine = df.filter(F.col("_corrupt_record").isNotNull())
    # every input line is accounted for
    assert df.count() == 4
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    assert quarantine.count() == 2
    # the raw offending line is preserved for triage
    raws = [r["_corrupt_record"] for r in quarantine.collect()]
    assert any("not json" in r for r in raws)


def test_read_jsonl_does_not_mutate_caller_schema(spark, sf_dir, tmp_path):
    """StructType.add mutates in place; read_jsonl must copy before
    extending, or passing df.schema (cached on the DataFrame) would
    permanently leak a phantom _corrupt_record field into the SOURCE
    DataFrame's schema."""
    docs = read_table(spark, sf_dir, "documents")
    before = [f.name for f in docs.schema.fields]
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    read_jsonl(spark, path, schema=docs.schema)
    after = [f.name for f in docs.schema.fields]
    assert after == before
    assert "_corrupt_record" not in after


def test_partitioned_write_layout(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "lang_bucket", (F.col("doc_id") % 3).cast("int")
    )
    path = str(tmp_path / "parted")
    write_jsonl(docs, path, partition_by=["lang_bucket"])
    subdirs = {d for d in os.listdir(path) if d.startswith("lang_bucket=")}
    assert subdirs == {"lang_bucket=0", "lang_bucket=1", "lang_bucket=2"}
    back = read_jsonl(spark, path, schema=docs.drop("lang_bucket").schema)
    # partition column comes back from the directory layout
    assert back.filter(F.col("lang_bucket") == 1).count() == docs.filter(
        F.col("doc_id") % 3 == 1
    ).count()
