"""Bin-bucketed interval (range) joins.

A range join ``fact.ts BETWEEN interval.start AND interval.end`` has no
equi-key, so Spark plans BroadcastNestedLoopJoin — every fact row is
tested against EVERY interval (O(|intervals|) per row). Bucketing by a
fixed time bin turns it into a broadcast HASH join: each interval is
exploded to the bins it overlaps, each fact row computes its single
bin, and the hash probe finds only the intervals sharing that bin,
re-checked exactly. Per-row cost drops to O(1 + overlaps), which is
what makes the operator survive both a 100 TB fact side and a long
interval list — and keeps a single-task local scan CPU-light.

This is the same bucket-then-verify shape the MinHash LSH pipeline
uses (dedup/minhash.py): a coarse equi-key prunes the cross product,
an exact predicate restores exactness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch_us(col: Column) -> Column:
    """Epoch microseconds for TIMESTAMP or TIMESTAMP_NTZ input.

    NTZ casts through timestamp_ltz (identity clock mapping under the
    pinned-UTC session, session.py); both join sides go through the
    same function so any shift would cancel in the bin comparison."""
    return F.unix_micros(col.cast("timestamp_ltz"))


def binned_interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Join fact rows to intervals with ``start <= ts < end`` via a
    bin-bucketed equi-join plus exact re-filter.

    ``bin_seconds`` trades bucket fan-out against probe selectivity:
    an interval spanning B bins emits B build-side rows. Pick it near
    the typical interval length so most intervals emit 1-2 rows.
    Exact for ANY interval layout (overlapping intervals simply match
    multiple bins and survive the re-filter).

    With ``broadcast_intervals`` (the default; correct whenever the
    interval list fits an executor — even a year of 4-hour windows is
    ~2k rows) the fact side NEVER shuffles: scan -> hash probe ->
    filter, all inside one codegen stage.
    """
    bin_us = F.lit(bin_seconds * 1_000_000)
    # Malformed (end <= start) intervals would make F.sequence count
    # DOWN (Spark defaults step to -1 when stop < start), silently
    # exploding an inverted interval into a huge build-side fan-out.
    # They can match nothing under the half-open re-filter anyway, so
    # drop them before the explode — they cost zero instead.
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(_epoch_us(F.col(start_col)) / bin_us),
                # half-open end: an interval ending exactly on a bin
                # boundary does not reach into that bin
                F.floor((_epoch_us(F.col(end_col)) - 1) / bin_us),
            )
        ),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    fact_b = facts.withColumn("_bin", F.floor(_epoch_us(F.col(ts_col)) / bin_us))
    ts = F.col(ts_col)
    return (
        fact_b.join(iv, "_bin")
        .filter((ts >= F.col(start_col)) & (ts < F.col(end_col)))
        .drop("_bin")
    )
