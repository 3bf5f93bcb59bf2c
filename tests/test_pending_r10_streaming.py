"""Engine parity for the late-data audit's watermark rule: drive a
REAL Structured Streaming query (file source, one row per microbatch,
withWatermark + dropDuplicatesWithinWatermark on unique keys so the
only dropped rows are late ones) and pin late_flagged's contract
against what the engine actually drops.

Measured engine behavior (probed, Spark 4.x): the watermark effective
in microbatch k is max(event time over batches <= k-2) minus the
delay — the update is computed from the previous batch but COMMITS
one batch late. late_flagged states the tight no-lag rule (strictly
preceding arrivals), so:

- SAFETY: engine-dropped ⊆ audit-late on any arrival sequence;
- EQUALITY: once a straggler's lateness exceeds one batch of
  event-time progress, the sets coincide.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cdc_2025_spark.queries.pending_r10 import late_flagged

BASE = datetime(2024, 1, 1, 12, 0, 0)


def _write_arrivals(src: str, arrivals) -> None:
    """One parquet file per arrival, ordered names + strictly
    increasing mtimes — the file source orders batches by
    (mtime, path); Spark's own writer would randomize the path
    tiebreak."""
    os.makedirs(src)
    for i, (eid, off) in enumerate(arrivals):
        tbl = pa.table(
            {
                "event_id": pa.array([eid], pa.int64()),
                "ts": pa.array(
                    [BASE + timedelta(minutes=off)], pa.timestamp("us")
                ),
            }
        )
        path = os.path.join(src, f"arrival_{i:03d}.parquet")
        pq.write_table(tbl, path)
        t = time.time() + i
        os.utime(path, (t, t))


def _stream_survivors(spark, tmp_path, arrivals, name) -> set[int]:
    src = str(tmp_path / f"src_{name}")
    _write_arrivals(src, arrivals)
    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream.withWatermark(
        "ts", "30 minutes"
    ).dropDuplicatesWithinWatermark(["event_id"])
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        r["event_id"]
        for r in spark.sql(f"select * from {name}").collect()
    }


def _audit_late(spark, arrivals) -> set[int]:
    arr_df = spark.createDataFrame(
        [
            (i, eid, BASE + timedelta(minutes=off))
            for i, (eid, off) in enumerate(arrivals)
        ],
        "arrival_seq long, event_id long, ts timestamp",
    )
    return {
        r["event_id"]
        for r in late_flagged(arr_df, ["arrival_seq"], 30)
        .filter(F.col("is_late"))
        .collect()
    }


def test_engine_drops_subset_of_audit_on_lag_boundary(spark, tmp_path):
    """Stragglers late by less than one batch of event-time progress
    sit exactly in the engine's commit-lag window: the audit flags
    them (tight rule), the engine may still accept them — the safety
    direction must hold regardless."""
    arrivals = [
        (1, 0), (2, 10), (3, 20), (4, 120),
        (5, 35),   # audit-late vs the tight wm (120-30); inside the
                   # engine's one-batch lag window -> engine accepts
        (6, 130),
        (7, 125),  # not late under either rule
        (8, 61),   # late under both (lag wm is already 100)
        (9, 140),
    ]
    all_ids = {eid for eid, _ in arrivals}
    survivors = _stream_survivors(spark, tmp_path, arrivals, "late_lag")
    engine_dropped = all_ids - survivors
    audit_late = _audit_late(spark, arrivals)
    assert audit_late == {5, 8}
    assert engine_dropped <= audit_late
    assert 8 in engine_dropped  # the unambiguous straggler IS dropped


def test_engine_matches_audit_beyond_the_lag(spark, tmp_path):
    """Stragglers whose lateness exceeds one batch of event-time
    progress: the audit and the real engine agree exactly."""
    arrivals = [
        (1, 0), (2, 10),
        (3, 300), (4, 310),  # time jumps far ahead, TWO batches
        (5, 20),             # straggler: late under lag-2 wm too
        (6, 320),
        (7, 40),             # another deep straggler
        (8, 330),
    ]
    all_ids = {eid for eid, _ in arrivals}
    survivors = _stream_survivors(spark, tmp_path, arrivals, "late_deep")
    engine_dropped = all_ids - survivors
    audit_late = _audit_late(spark, arrivals)
    assert audit_late == {5, 7}
    assert engine_dropped == audit_late


def test_late_flagged_matches_python_model(spark):
    """Hypothesis-free exhaustive model check on small sequences is
    flaky to enumerate; instead, a seeded pseudo-random batch of
    arrival sequences (deterministic — no runtime RNG) checked
    against a pure-python strictly-preceding-max model."""
    import hashlib

    def u(seed, i):
        return int(
            hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16
        )

    for seed in range(8):
        n = 6 + u(seed, 99) % 7
        offs = [u(seed, i) % 300 for i in range(n)]
        arrivals = [(i + 1, off) for i, off in enumerate(offs)]
        # python model
        want = set()
        mx = None
        for eid, off in arrivals:
            if mx is not None and off < mx - 30:
                want.add(eid)
            mx = off if mx is None else max(mx, off)
        got = _audit_late(spark, arrivals)
        assert got == want, (seed, arrivals, got, want)
