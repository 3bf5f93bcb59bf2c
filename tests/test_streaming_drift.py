"""Streaming PSI drift monitor: engine parity (streaming == batch on
the same files), a plain-python PSI oracle, and watermark-bounded
late-data behavior.

Harness notes (same as test_pending_r10_streaming): file source with
ordered names + strictly increasing mtimes so microbatch order is
deterministic; memory sink + availableNow trigger.
"""

from __future__ import annotations

import math
import os
import time
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cdc_2025_spark.streaming.drift import (
    PSI_FLOOR,
    psi_of_shares,
    reference_bin_shares,
    reference_decile_edges,
    streaming_psi_monitor,
)

BASE = datetime(2024, 3, 1, 0, 0, 0)
SF = "/root/testdata/sf0.001"


def _write_batches(src: str, batches) -> None:
    """One parquet file per microbatch: list of (value, minute_offset)
    rows per batch."""
    os.makedirs(src)
    for i, rows in enumerate(batches):
        tbl = pa.table(
            {
                "ts": pa.array(
                    [BASE + timedelta(minutes=off) for _, off in rows],
                    pa.timestamp("us"),
                ),
                "value": pa.array(
                    [float(v) for v, _ in rows], pa.float64()
                ),
            }
        )
        path = os.path.join(src, f"batch_{i:03d}.parquet")
        pq.write_table(tbl, path)
        t = time.time() + i
        os.utime(path, (t, t))


def _run_stream(spark, tmp_path, src, name, edges, shares, **kw):
    stream = (
        spark.readStream.schema("ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_psi_monitor(stream, edges, shares, **kw)
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
        r["window_start"]: (r["n"], r["psi"])
        for r in spark.sql(f"select * from {name}").collect()
    }


@pytest.fixture(scope="module")
def ref_geometry(spark):
    ref = spark.read.parquet(f"{SF}/events.parquet")
    edges = reference_decile_edges(ref)
    shares = reference_bin_shares(ref, edges)
    return ref, edges, shares


def test_streaming_matches_batch_on_same_files(
    spark, tmp_path, ref_geometry
):
    """availableNow over files == the same monitor applied batch-side
    to the union of those files, when nothing is late."""
    _, edges, shares = ref_geometry
    # 3 in-order batches over two 1-hour windows, then a far-future
    # sentinel batch: append mode only EMITS a window once the
    # watermark passes its end (plus the one-batch commit lag), so
    # without the sentinel availableNow finishes with zero output.
    batches = [
        [(10.0, 0), (20.0, 10), (300.0, 20)],
        [(15.0, 40), (700.0, 65), (2.0, 70)],
        [(50.0, 80), (8.0, 110), (9999.0, 115)],
        [(1.0, 600)],  # sentinel: advances watermark past both windows
        [(1.0, 660)],  # second sentinel: clears the one-batch commit lag
    ]
    src = str(tmp_path / "src_parity")
    _write_batches(src, batches)
    got = _run_stream(
        spark,
        tmp_path,
        src,
        "psi_parity",
        edges,
        shares,
        window_duration="1 hour",
        watermark="30 minutes",
    )
    batch = spark.read.parquet(src)
    want = {
        r["window_start"]: (r["n"], r["psi"])
        for r in streaming_psi_monitor(
            batch, edges, shares, window_duration="1 hour"
        ).collect()
    }
    # the two data windows are finalized and must match batch exactly;
    # the sentinel windows never finalize and are absent from `got`
    w0, w1 = BASE, BASE + timedelta(hours=1)
    assert got[w0] == want[w0] and got[w1] == want[w1]
    assert all(n > 0 for n, _ in (want[w0], want[w1]))
    assert set(got).issubset(set(want))


def test_psi_matches_python_model(spark, ref_geometry):
    """Batch-applied monitor over the full reference == plain-python
    PSI of the observed shares (and ~0 against its own reference)."""
    ref, edges, shares = ref_geometry
    row = (
        streaming_psi_monitor(
            ref, edges, shares, window_duration="365 days"
        )
        .collect()
    )
    total_n = sum(r["n"] for r in row)
    assert total_n == ref.count()
    # recompute observed shares per window python-side
    import pyspark.sql.functions as F

    for r in row:
        w0, w1 = r["window_start"], r["window_end"]
        vals = [
            x["value"]
            for x in ref.filter(
                (F.col("ts") >= w0) & (F.col("ts") < w1)
            ).collect()
        ]
        n_bins = len(edges) + 1
        counts = [0] * n_bins
        for v in vals:
            b = sum(round(v, 4) > c for c in edges)
            counts[b] += 1
        cur = [c / len(vals) for c in counts]
        want = round(psi_of_shares(cur, shares), 6)
        assert abs(r["psi"] - want) <= 1e-6
    # the window covering the whole corpus scores ~0 vs itself
    whole = [r for r in row if r["n"] == total_n]
    if whole:
        assert whole[0]["psi"] < 1e-6


def test_late_event_is_dropped_from_closed_window(spark, tmp_path):
    """An event arriving after its window's watermark horizon has
    passed (by more than the one-batch commit lag) is excluded; the
    batch run over the same files includes it — the documented
    streaming/batch divergence on late data."""
    edges = [10.0 * i for i in range(1, 10)]
    shares = [0.1] * 10
    batches = [
        [(5.0, 0), (15.0, 10)],        # window [00:00, 01:00)
        [(25.0, 300)],                 # event time jumps to 05:00
        [(35.0, 420)],                 # 07:00 — watermark passes 01:00
        [(45.0, 30)],                  # LATE: lands in the closed window
        [(55.0, 480)],                 # one more batch so commit lag clears
    ]
    src = str(tmp_path / "src_late")
    _write_batches(src, batches)
    got = _run_stream(
        spark,
        tmp_path,
        src,
        "psi_late",
        edges,
        shares,
        window_duration="1 hour",
        watermark="30 minutes",
    )
    first = BASE
    assert got[first][0] == 2  # late row NOT counted
    batch = spark.read.parquet(src)
    want = {
        r["window_start"]: r["n"]
        for r in streaming_psi_monitor(
            batch, edges, shares, window_duration="1 hour"
        ).collect()
    }
    assert want[first] == 3  # batch sees all three


def test_null_values_excluded_everywhere(spark):
    """NULL values neither count toward a window's n nor land in a
    bin, and the reference-share builder skips them too — n always
    equals the sum of bin counts, and PSI matches the python model
    over the non-null values alone."""
    import pyspark.sql.functions as F  # noqa: F401

    edges = [10.0]
    df = spark.createDataFrame(
        [(BASE, 5.0), (BASE, None), (BASE, 15.0), (BASE, None)],
        "ts timestamp, value double",
    )
    shares = reference_bin_shares(df, edges)
    assert shares == [0.5, 0.5]  # nulls excluded from the reference too
    row = streaming_psi_monitor(
        df, edges, shares, window_duration="1 hour"
    ).collect()[0]
    assert row["n"] == 2
    assert row["psi"] == round(psi_of_shares([0.5, 0.5], shares), 6)


def test_ref_shares_validated():
    import pyspark.sql.functions as F  # noqa: F401

    with pytest.raises(ValueError, match="ref_shares"):
        streaming_psi_monitor(None, [1.0, 2.0], [0.5, 0.5])


def test_floor_guards_empty_bins():
    """A current window with every value in one bin still yields a
    finite PSI (the 1e-4 floor keeps the log defined)."""
    cur = [1.0] + [0.0] * 9
    ref = [0.1] * 10
    val = psi_of_shares(cur, ref)
    assert math.isfinite(val) and val > 0
    # closed form: (1-0.1)ln(1/0.1) + 9*(1e-4-0.1)ln(1e-4/0.1)
    want = (1.0 - 0.1) * math.log(1.0 / 0.1) + 9 * (
        (PSI_FLOOR - 0.1) * math.log(PSI_FLOOR / 0.1)
    )
    assert abs(val - want) < 1e-12


# ---------------------------------------------------------------------------
# Streaming sequential CUSUM monitor
# ---------------------------------------------------------------------------

from cdc_2025_spark.streaming.drift import (  # noqa: E402
    cusum_replay,
    streaming_cusum_monitor,
)


def _write_kv_batches(src, batches):
    """batches: list of list of (key, value, minute_offset)."""
    os.makedirs(src)
    for i, rows in enumerate(batches):
        tbl = pa.table(
            {
                "event_type": pa.array([k for k, _, _ in rows]),
                "ts": pa.array(
                    [BASE + timedelta(minutes=off) for _, _, off in rows],
                    pa.timestamp("us"),
                ),
                "value": pa.array(
                    [v for _, v, _ in rows], pa.float64()
                ),
            }
        )
        path = os.path.join(src, f"batch_{i:03d}.parquet")
        pq.write_table(tbl, path)
        t = time.time() + i
        os.utime(path, (t, t))


def _run_cusum_stream(spark, tmp_path, batches, name, mu0, k, h):
    src = str(tmp_path / f"src_{name}")
    _write_kv_batches(src, batches)
    stream = (
        spark.readStream.schema(
            "event_type string, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_cusum_monitor(stream, mu0=mu0, k=k, h=h)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # memory sink in update mode appends each batch's update rows;
    # the LAST row per key is the final state
    rows = spark.sql(
        f"select * from {name} order by n_seen"
    ).collect()
    final = {}
    for r in rows:
        final[r["key"]] = (
            r["n_seen"],
            r["s_pos"],
            r["s_neg"],
            r["n_alarms"],
        )
    return final


def test_cusum_matches_replay_and_fires_on_shift(spark, tmp_path):
    """Stable key 'a' never alarms; key 'b' shifts mean mid-stream
    and must alarm. Final engine state equals the python replay over
    arrival order (event-time order within each batch — batch 2's
    'a' rows arrive ts-shuffled to exercise the in-batch sort)."""
    mu0, k, h = 10.0, 0.5, 6.0
    batches = [
        [("a", 10.2, 0), ("a", 9.9, 1), ("b", 10.1, 0)],
        # in-batch ts order differs from row order for 'a'
        [("a", 10.4, 3), ("a", 9.7, 2), ("b", 10.0, 2)],
        [("b", 14.0, 4), ("b", 14.5, 5), ("b", 14.2, 6)],
        [("b", 14.8, 7), ("a", 10.1, 8)],
    ]
    final = _run_cusum_stream(
        spark, tmp_path, batches, "cusum_shift", mu0, k, h
    )
    # replay in arrival order = batch order, ts-sorted within batch
    a_vals = [10.2, 9.9, 9.7, 10.4, 10.1]
    b_vals = [10.1, 10.0, 14.0, 14.5, 14.2, 14.8]
    ra = cusum_replay(a_vals, mu0, k, h)
    rb = cusum_replay(b_vals, mu0, k, h)
    assert final["a"] == (
        ra[0],
        round(ra[1], 6),
        round(ra[2], 6),
        ra[3],
    )
    assert final["b"] == (
        rb[0],
        round(rb[1], 6),
        round(rb[2], 6),
        rb[3],
    )
    assert final["a"][3] == 0  # stable key never alarms
    assert final["b"][3] >= 1  # shifted key alarms


def test_cusum_replay_model_properties():
    """Replay model invariants: zero drift stays at zero (allowance
    absorbs noise), a sustained +shift alarms after ~h/(shift-k)
    samples, and both sides reset after the alarm."""
    n, sp, sn, al = cusum_replay([10.0] * 50, 10.0, 0.5, 6.0)
    assert (n, sp, sn, al) == (50, 0.0, 0.0, 0)
    # shift of +2 with k=0.5 accumulates 1.5/sample -> alarm at 5th
    n, sp, sn, al = cusum_replay([12.0] * 5, 10.0, 0.5, 6.0)
    assert al == 1 and sp == 0.0 and sn == 0.0
    n, sp, sn, al = cusum_replay([12.0] * 4, 10.0, 0.5, 6.0)
    assert al == 0 and sp == 6.0


def test_cusum_nulls_excluded(spark, tmp_path):
    mu0, k, h = 10.0, 0.5, 6.0
    batches = [
        [("a", 10.0, 0), ("a", None, 1), ("a", 10.2, 2)],
    ]
    final = _run_cusum_stream(
        spark, tmp_path, batches, "cusum_nulls", mu0, k, h
    )
    assert final["a"][0] == 2  # the NULL row never counted


def test_reference_guards_empty_frame(spark):
    """An empty or all-NULL reference corpus must fail loud from both
    reference builders, not leak a ZeroDivisionError / all-None edge
    list into a silently-broken bin expression."""
    empty = spark.createDataFrame(
        [(None,), (None,)], "value double"
    )
    with pytest.raises(ValueError, match="no non-NULL"):
        reference_decile_edges(empty)
    with pytest.raises(ValueError, match="no non-NULL"):
        reference_bin_shares(empty, [1.0, 2.0])


def test_cusum_multichunk_microbatch_sorts_whole_batch(
    spark, tmp_path
):
    """A key's microbatch larger than the Arrow batch size reaches the
    state function as MULTIPLE chunks; the recurrence must run over
    the WHOLE batch in event-time order, not per-chunk (per-chunk
    sorting makes alarm counts chunk-boundary-dependent). Rows arrive
    ts-DESCENDING with maxRecordsPerBatch=3 so per-chunk order and
    whole-batch order provably diverge (asserted on the replay model
    below), then the engine is pinned to the whole-batch order."""
    mu0, k, h = 10.0, 0.5, 6.0
    # values by event-time offset 0..11
    by_ts = [13.0] * 4 + [7.0] * 4 + [13.0] * 4
    # arrival (row) order inside the single file: ts-descending
    rows = [("a", by_ts[off], off) for off in range(11, -1, -1)]
    # old per-chunk behavior at chunk size 3: each 3-row chunk of the
    # arrival order, ts-sorted internally
    per_chunk_order = []
    for c in range(0, 12, 3):
        chunk = sorted(rows[c : c + 3], key=lambda r: r[2])
        per_chunk_order.extend(v for _, v, _ in chunk)
    whole_batch_order = by_ts
    assert (
        cusum_replay(per_chunk_order, mu0, k, h)
        != cusum_replay(whole_batch_order, mu0, k, h)
    ), "fixture is not order-discriminating; pick new values"
    old = spark.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch", None
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        final = _run_cusum_stream(
            spark, tmp_path, [rows], "cusum_chunks", mu0, k, h
        )
    finally:
        if old is None:
            spark.conf.unset(
                "spark.sql.execution.arrow.maxRecordsPerBatch"
            )
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )
    want = cusum_replay(whole_batch_order, mu0, k, h)
    assert final["a"] == (
        want[0],
        round(want[1], 6),
        round(want[2], 6),
        want[3],
    )


# ---------------------------------------------------------------------------
# Streaming Misra-Gries heavy-hitters monitor
# ---------------------------------------------------------------------------

from cdc_2025_spark.streaming.drift import (  # noqa: E402
    mg_replay,
    streaming_heavy_hitters_monitor,
)


def _write_id_batches(src, batches):
    """batches: list of list of (key, user_id, minute_offset)."""
    os.makedirs(src)
    for i, rows in enumerate(batches):
        tbl = pa.table(
            {
                "event_type": pa.array([k for k, _, _ in rows]),
                "ts": pa.array(
                    [BASE + timedelta(minutes=off) for _, _, off in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array(
                    [u for _, u, _ in rows], pa.int64()
                ),
            }
        )
        path = os.path.join(src, f"batch_{i:03d}.parquet")
        pq.write_table(tbl, path)
        t = time.time() + i
        os.utime(path, (t, t))


def test_heavy_hitters_matches_replay(spark, tmp_path):
    """Final engine counters per key equal the python Misra-Gries
    replay over event-time-ordered arrivals, across batches, with the
    decrement phase exercised (more distinct ids than counters)."""
    k = 3
    # key 'a': id 1 dominates, 6 distinct ids churn the counters;
    # key 'b': uniform churn (nothing survives reliably)
    a_seq = [1, 2, 1, 3, 1, 4, 1, 5, 1, 6, 1, 2, 1, 3, 1]
    b_seq = [10, 11, 12, 13, 10, 14, 15, 16]
    batches = []
    off = 0
    for chunk in range(3):
        rows = []
        for v in a_seq[chunk * 5 : chunk * 5 + 5]:
            rows.append(("a", v, off)); off += 1
        for v in b_seq[chunk * 3 : chunk * 3 + 3]:
            rows.append(("b", v, off)); off += 1
        # arrival order inside the file: ts-descending, to exercise
        # the whole-batch sort
        batches.append(rows[::-1])
    src = str(tmp_path / "src_mg")
    _write_id_batches(src, batches)
    stream = (
        spark.readStream.schema(
            "event_type string, ts timestamp, user_id long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_heavy_hitters_monitor(stream, k=k)
    q = (
        out.writeStream.format("memory")
        .queryName("mg_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_mg"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select * from mg_test order by n_seen"
    ).collect()
    final = {}
    for r in rows:  # last batch per key wins (ordered by n_seen)
        final.setdefault(r["key"], {})
        if r["n_seen"] == max(
            x["n_seen"] for x in rows if x["key"] == r["key"]
        ):
            if r["hitter"] is not None:  # empty-summary sentinel
                final[r["key"]][r["hitter"]] = r["est_count"]
    wa, na = mg_replay(a_seq, k)
    wb, nb = mg_replay(b_seq, k)
    assert final["a"] == wa
    assert final["b"] == wb
    # key 'b' drained to an EMPTY summary in its final batch: the
    # sentinel row (NULL hitter, rank 0, current n_seen) must be
    # there — silence would be indistinguishable from no update
    b_last = [
        r for r in rows
        if r["key"] == "b"
        and r["n_seen"] == max(x["n_seen"] for x in rows if x["key"] == "b")
    ]
    assert len(b_last) == 1 and b_last[0]["hitter"] is None
    assert b_last[0]["rank"] == 0 and b_last[0]["n_seen"] == nb
    # the dominant id survives with the MG guarantee intact
    assert 1 in final["a"]
    assert final["a"][1] >= a_seq.count(1) - na // (k + 1)


def test_mg_replay_guarantees():
    """Model invariants: any id with frequency > n/(k+1) survives,
    and estimates never overcount."""
    import random as _random

    rng = _random.Random(3)
    seq = [1] * 40 + [rng.randint(2, 50) for _ in range(60)]
    rng.shuffle(seq)
    ctr, n = mg_replay(seq, k=4)
    assert 1 in ctr  # 40 > 100/5
    for i, c in ctr.items():
        true = seq.count(i)
        assert c <= true
        assert c >= true - n // 5


def test_heavy_hitters_validates_k():
    with pytest.raises(ValueError, match="k must be"):
        streaming_heavy_hitters_monitor(None, k=0)


# ---------------------------------------------------------------------------
# Streaming HyperLogLog cardinality monitor
# ---------------------------------------------------------------------------

from cdc_2025_spark.streaming.drift import (  # noqa: E402
    hll_replay,
    streaming_hll_cardinality_monitor,
)


def _write_hll_batches(src, batches):
    """batches: list of list of (key, user_id)."""
    os.makedirs(src)
    for i, rows in enumerate(batches):
        tbl = pa.table(
            {
                "event_type": pa.array([k for k, _ in rows]),
                "user_id": pa.array(
                    [v for _, v in rows], pa.int64()
                ),
            }
        )
        path = os.path.join(src, f"batch_{i:03d}.parquet")
        pq.write_table(tbl, path)
        t = time.time() + i
        os.utime(path, (t, t))


def test_hll_monitor_matches_replay(spark, tmp_path):
    """Final engine row per key equals the python replay over the
    same ids — exact, because both share _hll_add/hll_estimate.
    Duplicates across batches must not move the estimate; NULL ids
    are excluded."""
    a1 = list(range(40))
    a2 = list(range(20, 60))        # overlaps batch 1
    b1 = [100 + i for i in range(7)]
    b2 = [100 + i for i in range(7)]  # exact duplicate batch
    batches = [
        [("a", v) for v in a1] + [("b", v) for v in b1],
        [("a", v) for v in a2] + [("b", v) for v in b2]
        + [("b", None)],
    ]
    src = str(tmp_path / "src_hll")
    _write_hll_batches(src, batches)
    stream = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_hll_cardinality_monitor(stream, p=8)
    q = (
        out.writeStream.format("memory")
        .queryName("hll_mon")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select * from hll_mon order by n_seen"
    ).collect()
    final = {r["key"]: r for r in rows}
    ra = hll_replay(a1 + a2, 8)
    rb = hll_replay(b1 + b2, 8)
    assert final["a"]["estimate"] == ra[0]
    assert final["a"]["n_seen"] == ra[1] == 80
    assert final["a"]["n_zero_regs"] == ra[2]
    assert final["b"]["estimate"] == rb[0]
    assert final["b"]["n_seen"] == rb[1] == 14
    # duplicate-batch invariance: b's estimate equals one batch alone
    assert rb[0] == hll_replay(b1, 8)[0]
    # per-batch emission: key 'b' appears once per batch
    assert sum(1 for r in rows if r["key"] == "b") == 2
    assert all(r["n_regs"] == 256 for r in rows)


def test_hll_replay_accuracy_envelope():
    """Estimate within 5 standard errors (1.04/sqrt(m)) of truth for
    a range of cardinalities, and exactly duplicate-invariant."""
    for p, n in ((10, 500), (10, 5000), (8, 2000)):
        est, n_seen, _ = hll_replay(list(range(n)), p)
        se = 1.04 / (1 << p) ** 0.5
        assert abs(est - n) / n < 5 * se, (p, n, est)
        assert n_seen == n
        assert hll_replay(list(range(n)) * 2, p)[0] == est


def test_hll_monitor_validates_p():
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    with pytest.raises(ValueError, match="p must be"):
        streaming_hll_cardinality_monitor(None, p=3)
    with pytest.raises(ValueError, match="p must be"):
        streaming_hll_cardinality_monitor(None, p=17)


# ---------------------------------------------------------------------------
# Streaming quantile monitor (deterministic bottom-K reservoir)
# ---------------------------------------------------------------------------

from cdc_2025_spark.streaming.drift import (  # noqa: E402
    quantile_replay,
    streaming_quantile_monitor,
)


def _write_idval_batches(src, batches):
    """batches: list of list of (key, event_id, value)."""
    os.makedirs(src)
    for i, rows in enumerate(batches):
        tbl = pa.table(
            {
                "event_type": pa.array([k for k, _, _ in rows]),
                "event_id": pa.array(
                    [e for _, e, _ in rows], pa.int64()
                ),
                "value": pa.array(
                    [v for _, _, v in rows], pa.float64()
                ),
            }
        )
        path = os.path.join(src, f"batch_{i:03d}.parquet")
        pq.write_table(tbl, path)
        t = time.time() + i
        os.utime(path, (t, t))


def test_quantile_monitor_matches_replay(spark, tmp_path):
    """Final engine row per key equals the python replay EXACTLY
    (sample membership is a pure function of the ids), regardless of
    batch split; NULL values/ids excluded; a small key's sample is
    the whole population (exact quantiles)."""
    a = [(i, float((i * 37) % 500)) for i in range(120)]
    b = [(1000 + i, 10.0 * i) for i in range(9)]
    batches = [
        [("a", e, v) for e, v in a[:50]]
        + [("b", e, v) for e, v in b[:4]],
        [("a", e, v) for e, v in a[50:]]
        + [("b", e, v) for e, v in b[4:]]
        + [("b", None, 1.0), ("b", 9999, None)],
    ]
    src = str(tmp_path / "src_q")
    _write_idval_batches(src, batches)
    stream = (
        spark.readStream.schema(
            "event_type string, event_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_quantile_monitor(stream, k=32)
    q = (
        out.writeStream.format("memory")
        .queryName("quant_mon")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_q"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select * from quant_mon order by n_seen"
    ).collect()
    final = {r["key"]: r for r in rows}
    ra = quantile_replay(a, 32)
    rb = quantile_replay(b, 32)
    for key, want in (("a", ra), ("b", rb)):
        got = final[key]
        assert (
            got["n_seen"],
            got["sample_n"],
            got["q50"],
            got["q90"],
            got["q99"],
        ) == want, key
    # key b: 9 rows < k -> the sample IS the population, quantiles
    # are exact disc percentiles of 0..80
    assert final["b"]["sample_n"] == 9
    assert final["b"]["q50"] == 40.0
    assert final["b"]["q99"] == 80.0
    # per-batch emission
    assert sum(1 for r in rows if r["key"] == "a") == 2


def test_quantile_replay_is_batch_reservoir(spark):
    """The streaming sample equals functions/reservoir.bottomk_sample
    over the same rows with the same key construction — the lifted
    invariant, checked through the replay's priorities."""
    import hashlib

    rows = [(i, float(i)) for i in range(300)]
    n, sn, q50, _, _ = quantile_replay(rows, 16)
    want_ids = sorted(
        range(300),
        key=lambda i: int(
            hashlib.md5(f"q:{i}".encode()).hexdigest()[:8], 16
        ),
    )[:16]
    want_vals = sorted(float(i) for i in want_ids)
    assert sn == 16 and n == 300
    assert q50 == want_vals[7]  # ceil(0.5*16)-1 = 7


def test_quantile_monitor_validates_k():
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        streaming_quantile_monitor(None, k=0)


def test_quantile_monitor_dedupes_redelivered_ids(spark, tmp_path):
    """At-least-once delivery: the SAME event_id redelivered — within
    a batch and across batches — must not occupy two reservoir slots
    or double-increment n_seen. The final row must equal both the
    replay over the duplicated stream and the replay over the
    exactly-once stream (membership is a pure function of the id
    set)."""
    clean = [(i, float((i * 13) % 97)) for i in range(40)]
    dup_in_batch = [(5, clean[5][1]), (7, clean[7][1])]
    batches = [
        [("a", e, v) for e, v in clean[:20] + dup_in_batch],
        # cross-batch redelivery of ids 0..9 (still in reservoir:
        # 40 ids < k=64, nothing evicted) plus the new tail
        [("a", e, v) for e, v in clean[20:] + clean[:10]],
    ]
    src = str(tmp_path / "src_qdup")
    _write_idval_batches(src, batches)
    stream = (
        spark.readStream.schema(
            "event_type string, event_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_quantile_monitor(stream, k=64)
    q = (
        out.writeStream.format("memory")
        .queryName("quant_dup")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_qdup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = spark.sql(
        "select * from quant_dup order by n_seen desc limit 1"
    ).collect()[0]
    duplicated = clean[:20] + dup_in_batch + clean[20:] + clean[:10]
    want_dup = quantile_replay(duplicated, 64)
    want_clean = quantile_replay(clean, 64)
    assert want_dup == want_clean  # replay itself dedupes
    got = (
        final["n_seen"],
        final["sample_n"],
        final["q50"],
        final["q90"],
        final["q99"],
    )
    assert got == want_clean
    assert final["n_seen"] == 40  # not 52
