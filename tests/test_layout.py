"""Z-order write tests: the Morton key must interleave correctly, and
a Z-ordered parquet layout must tighten per-file min-max stats on
EVERY participating column (the property that buys scan pruning)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from cdc_2025_spark.layout import write_zordered, zorder_key


def test_zorder_key_interleaves_bits(spark):
    """For two columns at full rank resolution, the key of (max, min)
    and (min, max) must place each column's bits in alternating
    positions: rank bits of col i occupy positions b*2 + i."""
    df = spark.createDataFrame(
        [(0, 0), (0, 100), (100, 0), (100, 100)], "x long, y long"
    )
    keyed = {
        (r["x"], r["y"]): r["_zkey"]
        for r in zorder_key(df, ["x", "y"], bits=4).collect()
    }
    full = (1 << 4) - 1  # rank 15
    x_bits = sum(1 << (b * 2 + 0) for b in range(4))
    y_bits = sum(1 << (b * 2 + 1) for b in range(4))
    assert keyed[(0, 0)] == 0
    assert keyed[(100, 0)] == x_bits
    assert keyed[(0, 100)] == y_bits
    assert keyed[(100, 100)] == x_bits | y_bits
    del full


def test_zorder_key_locality(spark):
    """Morton locality: close points in (x, y) must have closer keys
    than far points, on average — pinned via a coarse monotonicity
    check on axis-aligned neighbors."""
    pts = [(x, y) for x in range(0, 64, 4) for y in range(0, 64, 4)]
    df = spark.createDataFrame(pts, "x long, y long")
    keyed = {
        (r["x"], r["y"]): r["_zkey"]
        for r in zorder_key(df, ["x", "y"], bits=6).collect()
    }
    near = [
        abs(keyed[(x, y)] - keyed[(x + 4, y)])
        for x in range(0, 60, 4)
        for y in range(0, 64, 4)
    ]
    far = [
        abs(keyed[(x, y)] - keyed[(60 - x, 60 - y)])
        for x in range(0, 28, 4)
        for y in range(0, 28, 4)
    ]
    assert sum(near) / len(near) < sum(far) / len(far)


def test_zorder_write_tightens_stats_on_both_columns(spark, sf_dir, tmpdir):
    """The payoff property: after write_zordered(events, [user_id,
    value]), the AVERAGE per-file min-max span of BOTH columns must be
    well below the global span (each file owns a compact Z-range), and
    reading the layout back returns the identical row multiset."""
    import pyarrow.parquet as pq

    from cdc_2025_spark.io import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    out = str(tmpdir.join("events_z"))
    write_zordered(ev, out, ["user_id", "value"], n_files=8)

    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= 4  # repartitionByRange target
    spans = {"user_id": [], "value": []}
    glob_min, glob_max = {}, {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for i in range(row.num_columns):
                col = row.column(i)
                name = col.path_in_schema
                if name in spans and col.statistics is not None:
                    st = col.statistics
                    spans[name].append(st.max - st.min)
                    glob_min[name] = min(
                        glob_min.get(name, st.min), st.min
                    )
                    glob_max[name] = max(
                        glob_max.get(name, st.max), st.max
                    )
    for name in ("user_id", "value"):
        global_span = glob_max[name] - glob_min[name]
        avg_span = sum(spans[name]) / len(spans[name])
        # 8 files x 2 cols: each column's per-file span should be a
        # fraction of global; sqrt(1/8) per dim is the Z-order ideal,
        # assert the conservative half bound
        assert avg_span < 0.55 * global_span, (name, avg_span, global_span)

    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert back.select(F.sum("event_id")).first()[0] == ev.select(
        F.sum("event_id")
    ).first()[0]
    assert sorted(back.columns) == sorted(ev.columns)


def test_zorder_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        zorder_key(df, [])
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=32)


def test_zorder_write_with_date_column(spark, sf_dir, tmpdir):
    """Z-order over a (date, numeric) pair — the common lakehouse
    layout key: per-file date ranges must tighten alongside the
    numeric column, and the round-trip preserves the rows."""
    import glob as _glob

    import pyarrow.parquet as pq
    from cdc_2025_spark.io import read_table

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("day"),
        "o_totalprice",
    )
    out = str(tmpdir.join("orders_z"))
    # 16 files = 4 top z-bits = TWO range splits per dimension (with 8
    # files one dim only halves: alternating bits give the top 3 key
    # bits to [col1, col0, col1], leaving col0's expected span at
    # 0.5*global — measured 0.586 with boundary spill)
    write_zordered(orders, out, ["day", "o_totalprice"], n_files=16)
    files = sorted(_glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= 8
    spans, gmin, gmax = [], None, None
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for i in range(row.num_columns):
                col = row.column(i)
                if col.path_in_schema == "day" and col.statistics:
                    st = col.statistics
                    spans.append((st.max - st.min).days)
                    gmin = st.min if gmin is None else min(gmin, st.min)
                    gmax = st.max if gmax is None else max(gmax, st.max)
    global_span = (gmax - gmin).days
    assert sum(spans) / len(spans) < 0.55 * global_span
    back = spark.read.parquet(out)
    assert back.count() == orders.count()


def test_compact_table_merges_small_files(spark, sf_dir, tmpdir):
    """Compaction: a 64-tiny-file table collapses to the byte-sized
    target file count with identical data, and the stats dict reports
    the before/after truthfully."""
    from cdc_2025_spark.io import read_table
    from cdc_2025_spark.layout import compact_table

    path = str(tmpdir.join("events_smallfiles"))
    events = read_table(spark, sf_dir, "events")
    events.repartition(64).write.parquet(path)
    before = spark.read.parquet(path)
    # materialize BEFORE compacting — the swap deletes these files
    want = sorted(map(tuple, before.collect()), key=str)
    n_files_in = len(before.inputFiles())
    assert n_files_in >= 64

    stats = compact_table(spark, path, target_file_mb=128)
    after = spark.read.parquet(path)
    assert stats["files_before"] == n_files_in
    # sf0.001 events is well under 128 MB -> exactly one output file
    assert stats["files_after"] == len(after.inputFiles()) == 1
    got = sorted(map(tuple, after.collect()), key=str)
    assert got == want


def test_compact_table_with_zorder_restores_clustering(
    spark, sf_dir, tmpdir
):
    """Compaction with zorder_cols re-clusters while merging: output
    files' per-file min-max on the leading key must be tighter than
    the global span (appends destroyed clustering; compaction is
    where it comes back)."""
    import glob as _glob

    import pyarrow.parquet as pq

    from cdc_2025_spark.layout import compact_table

    path = str(tmpdir.join("events_z_compact"))
    # generated frame, incompressible payload, big enough that a 1 MB
    # target forces a multi-file layout (the sf0.001 tables are tiny)
    events = spark.range(300_000).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id"), F.lit(500)).alias("user_id"),
        F.xxhash64("id", F.lit(7)).alias("payload"),
    )
    # simulate many unclustered appends
    events.repartition(32).write.parquet(path)
    compact_table(
        spark, path, target_file_mb=1, zorder_cols=["user_id", "event_id"]
    )
    files = sorted(_glob.glob(f"{path}/part-*.parquet"))
    assert len(files) >= 2  # 1 MB target forces a multi-file layout
    spans, gmin, gmax = [], None, None
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for i in range(row.num_columns):
                col = row.column(i)
                if col.path_in_schema == "user_id" and col.statistics:
                    st = col.statistics
                    spans.append(st.max - st.min)
                    gmin = st.min if gmin is None else min(gmin, st.min)
                    gmax = st.max if gmax is None else max(gmax, st.max)
    assert spans and (gmax - gmin) > 0
    assert sum(spans) / len(spans) < 0.75 * (gmax - gmin)
    back = spark.read.parquet(path)
    assert back.count() == events.count()


def test_compact_table_recovers_crashed_swap(spark, sf_dir, tmpdir):
    """A .old backup left by a crash inside the previous compaction's
    rename window must be recovered before the new rewrite — the same
    contract the CDC snapshot store pins."""
    import os
    import shutil

    from cdc_2025_spark.io import read_table
    from cdc_2025_spark.layout import compact_table

    path = str(tmpdir.join("crashy"))
    nation = read_table(spark, sf_dir, "nation")
    nation.repartition(4).write.parquet(path)
    n = nation.count()
    # crash state: live renamed aside, new never landed
    os.rename(path, path + ".old")
    assert not os.path.exists(path)
    stats = compact_table(spark, path, target_file_mb=64)
    assert stats["files_after"] == 1
    back = spark.read.parquet(path)
    assert back.count() == n
    assert not os.path.exists(path + ".old")
    shutil.rmtree(path)
