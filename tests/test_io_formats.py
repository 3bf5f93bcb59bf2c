"""ORC round-trip + raw-text corpus ingestion: the non-parquet
batch-source surface (JSONL and Excel/CSV live in their own tests)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_2025_spark.io import (
    read_orc,
    read_table,
    read_text_corpus,
    write_orc,
)
from cdc_2025_spark.plans import scan_detail


def test_orc_round_trip_and_pushdown(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    path = os.path.join(tmp_path, "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path)
    assert back.count() == docs.count()
    assert {f.name for f in back.schema.fields} == {
        f.name for f in docs.schema.fields
    }
    # predicate pushdown reaches the ORC scan like parquet
    pushed = scan_detail(back.filter(F.col("doc_id") < 10), "PushedFilters")
    assert any("LessThan(doc_id,10)" in line for line in pushed)


def test_orc_partitioned_write_prunes(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    path = os.path.join(tmp_path, "docs_orc_part")
    write_orc(docs, path, partition_by=["source"])
    back = read_orc(spark, path).filter(F.col("source") == "src1")
    assert back.count() == docs.filter(F.col("source") == "src1").count()
    # partition pruning: the source predicate must appear INSIDE the
    # PartitionFilters list (the line itself prints even when empty)
    part = scan_detail(back, "PartitionFilters")
    assert any("src1" in line for line in part), part


def test_read_text_corpus_lines_and_whole(spark, tmp_path):
    d = os.path.join(tmp_path, "txt")
    os.makedirs(d)
    with open(os.path.join(d, "a.txt"), "w") as f:
        f.write("line one\nline two\n")
    with open(os.path.join(d, "b.txt"), "w") as f:
        f.write("solo document")
    lines = read_text_corpus(spark, d)
    assert lines.count() == 3
    assert set(lines.columns) == {"source_file", "text"}
    whole = read_text_corpus(spark, d, whole_files=True)
    rows = {
        os.path.basename(r["source_file"]): r["text"]
        for r in whole.collect()
    }
    assert rows["a.txt"] == "line one\nline two\n"
    assert rows["b.txt"] == "solo document"
