"""Streaming tests: file-source replay of the events table through the
windowed operators, and CDC apply-changes upsert/delete semantics —
deterministic via availableNow triggers (SURVEY.md §5.4).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from cdc_2025_spark.io import read_table
from cdc_2025_spark.streaming import (
    apply_changes_batch,
    cdc_upsert_stream,
    session_window_counts,
    sliding_window_stats,
    stateful_user_totals,
    tumbling_window_stats,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="cdc_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def event_files(spark, sf_dir, tmpdir):
    """Replay the events table as 3 parquet files in timestamp order —
    a file-drop CDC-ish source."""
    ev = read_table(spark, sf_dir, "events").orderBy("ts")
    src = os.path.join(tmpdir, "src")
    total = ev.count()
    third = total // 3
    pdf = ev.toPandas()
    os.makedirs(src)
    for i in range(3):
        lo = i * third
        hi = total if i == 2 else (i + 1) * third
        chunk = spark.createDataFrame(pdf.iloc[lo:hi], EVENTS_SCHEMA)
        chunk.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"chunk{i}")
        )
    # flatten: file source wants a directory of files
    flat = os.path.join(tmpdir, "flat")
    os.makedirs(flat)
    n = 0
    for i in range(3):
        d = os.path.join(src, f"chunk{i}")
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(d, f), os.path.join(flat, f"{i}-{n}.parquet"))
                n += 1
    return flat


def test_tumbling_window_stream_matches_batch(spark, sf_dir, event_files, tmpdir):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(event_files)
    out = tumbling_window_stats(stream, "1 hour", "2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("select * from tumbling_test").collect()
    # append mode emits only FINALIZED windows (closed by watermark);
    # compare those against the batch computation
    batch = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in batch.collect()
    }
    assert len(got) > 0
    for r in got:
        key = (r["window_start"], r["event_type"])
        assert key in want
        assert (r["n"], r["total_value"]) == want[key], key


def test_session_window_stream_runs(spark, event_files, tmpdir):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(event_files)
    out = session_window_counts(stream, "30 minutes", "2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("session_test")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from session_test").collect()
    assert len(rows) > 0
    assert all(r["n_events"] >= 1 for r in rows)
    assert all(r["session_end"] > r["session_start"] for r in rows)


def test_sliding_window_stream_matches_batch(spark, sf_dir, event_files, tmpdir):
    """Each event lands in duration/slide windows; finalized windows
    must match the batch twin."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(event_files)
    out = sliding_window_stats(stream, "1 hour", "30 minutes", "2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("sliding_test")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt_slide"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sliding_test").collect()
    assert got
    batch = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
        .select(F.col("window.start").alias("window_start"), "n", "avg_value")
    )
    want = {r["window_start"]: (r["n"], r["avg_value"]) for r in batch.collect()}
    for r in got:
        assert want[r["window_start"]] == (r["n"], r["avg_value"]), (
            r["window_start"]
        )


def test_stateful_user_totals_matches_batch(spark, sf_dir, event_files, tmpdir):
    """applyInPandasWithState running totals: after the stream drains,
    the LAST emitted row per user must equal the batch groupBy."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(event_files)
    out = stateful_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_test")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("select * from stateful_test").collect()
    assert emitted
    # update mode re-emits a user's row per touching batch; running
    # totals only grow, so the final state is the max per user
    final: dict = {}
    for r in emitted:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"], r["last_ts"])
    batch = (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
    )
    want = {
        r["user_id"]: (r["n_events"], r["total_value"], r["last_ts"])
        for r in batch.collect()
    }
    assert set(final) == set(want)
    for uid, (n, total, last_ts) in want.items():
        got_n, got_total, got_last = final[uid]
        assert got_n == n, uid
        assert abs(got_total - total) < 1e-6, uid
        assert got_last == last_ts, uid


def test_stream_static_enrichment(spark, event_files, tmpdir):
    from cdc_2025_spark.streaming import enrich_stream_with_dim

    dim = spark.createDataFrame(
        [("view", 1.0), ("click", 2.0), ("purchase", 10.0),
         ("signup", 5.0), ("error", 0.0)],
        "event_type string, weight double",
    )
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(event_files)
    out = enrich_stream_with_dim(stream, dim)
    q = (
        out.writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql(
        "select count(*) n, count(weight) nw from enrich_test"
    ).first()
    assert rows["n"] > 0 and rows["n"] == rows["nw"]  # every row enriched


def test_stream_stream_interval_join_matches_batch(
    spark, sf_dir, event_files, tmpdir
):
    from cdc_2025_spark.streaming import signup_to_purchase_within

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(event_files)
    out = signup_to_purchase_within(stream, "1 hour", "2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("ssjoin_test")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt_ss"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["signup_ts"], r["purchase_ts"])
        for r in spark.sql("select * from ssjoin_test").collect()
    }
    ev = read_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("u"), F.col("ts").alias("sts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    want = {
        (r["u"], r["sts"], r["pts"])
        for r in s.join(
            p,
            (F.col("u") == F.col("pu"))
            & (F.col("pts") > F.col("sts"))
            & (F.col("pts") <= F.col("sts") + F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    # append-mode emits matches whose state the watermark has closed;
    # everything emitted must be a true match, and coverage must be
    # substantial (the tail inside the final watermark may be held)
    assert got <= want
    assert len(got) >= 0.8 * len(want), (len(got), len(want))


def test_stream_dedup_drops_watermark_repeats(spark, tmpdir):
    """Duplicate event_ids arriving within the watermark must emit
    exactly once."""
    from cdc_2025_spark.streaming import stream_dedup

    src = os.path.join(tmpdir, "dups")
    os.makedirs(src)
    base = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 10, "view", 1.0, "{}"),
        (1, base, 10, "view", 1.0, "{}"),  # exact duplicate
        (2, base, 11, "click", 2.0, "{}"),
        (2, base, 11, "click", 2.0, "{}"),
        (3, base, 12, "view", 3.0, "{}"),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    out = stream_dedup(stream, ["event_id"], "1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = sorted(
        r["event_id"]
        for r in spark.sql("select * from dedup_stream_test").collect()
    )
    assert got == [1, 2, 3]


def test_cdc_source_rate_and_files(spark, event_files, tmpdir):
    """cdc_source builds working file and rate streams (kafka is the
    same construction against a connector this container lacks)."""
    from cdc_2025_spark.streaming import cdc_source

    file_stream = cdc_source(
        spark, "parquet", schema=EVENTS_SCHEMA, path=event_files
    )
    assert file_stream.isStreaming

    rate = cdc_source(spark, "rate", rows_per_second=50)
    assert rate.isStreaming
    q = (
        rate.writeStream.format("memory")
        .queryName("rate_test")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt_rate"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("select * from rate_test").collect()
    assert all(set(r.asDict()) == {"timestamp", "value"} for r in rows)

    with pytest.raises(ValueError):
        cdc_source(spark, "kafka")
    with pytest.raises(ValueError):
        cdc_source(spark, "parquet")


CHANGES_SCHEMA = (
    "k long, op string, op_ts timestamp, _seq long, name string, amount double"
)


def test_apply_changes_batch_semantics(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, name string, amount double"
    )
    changes = spark.createDataFrame(
        [
            # update k=1 twice in-batch: later op_ts wins
            (1, "U", datetime(2024, 1, 1, 0, 0, 1), 1, "a1", 11.0),
            (1, "U", datetime(2024, 1, 1, 0, 0, 2), 2, "a2", 12.0),
            # delete k=2
            (2, "D", datetime(2024, 1, 1, 0, 0, 1), 3, None, None),
            # insert k=3; same op_ts tie broken by _seq
            (3, "I", datetime(2024, 1, 1, 0, 0, 1), 4, "c-old", 30.0),
            (3, "U", datetime(2024, 1, 1, 0, 0, 1), 5, "c-new", 31.0),
        ],
        CHANGES_SCHEMA,
    )
    out = {
        r["k"]: (r["name"], r["amount"])
        for r in apply_changes_batch(snap, changes, ["k"]).collect()
    }
    assert out == {1: ("a2", 12.0), 3: ("c-new", 31.0)}


def test_cdc_upsert_stream_end_to_end(spark, tmpdir):
    src = os.path.join(tmpdir, "changes")
    os.makedirs(src)
    b1 = spark.createDataFrame(
        [
            (1, "I", datetime(2024, 1, 1, 0, 0, 0), 1, "one", 1.0),
            (2, "I", datetime(2024, 1, 1, 0, 0, 0), 2, "two", 2.0),
        ],
        CHANGES_SCHEMA,
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(b1.schema).parquet(src)
    snap_path = os.path.join(tmpdir, "snapshot")
    q = cdc_upsert_stream(
        stream,
        snap_path,
        ["k"],
        checkpoint_path=os.path.join(tmpdir, "ckpt3"),
    )
    q.awaitTermination(120)
    got = {
        r["k"]: r["name"] for r in spark.read.parquet(snap_path).collect()
    }
    assert got == {1: "one", 2: "two"}

    # second batch: update + delete, restart stream (new files only)
    b2 = spark.createDataFrame(
        [
            (1, "U", datetime(2024, 1, 1, 0, 1, 0), 3, "ONE", 1.5),
            (2, "D", datetime(2024, 1, 1, 0, 1, 0), 4, None, None),
            (3, "I", datetime(2024, 1, 1, 0, 1, 0), 5, "three", 3.0),
        ],
        CHANGES_SCHEMA,
    )
    b2.coalesce(1).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(b1.schema).parquet(src)
    q2 = cdc_upsert_stream(
        stream2,
        snap_path,
        ["k"],
        checkpoint_path=os.path.join(tmpdir, "ckpt3"),
    )
    q2.awaitTermination(120)
    got2 = {
        r["k"]: (r["name"], r["amount"])
        for r in spark.read.parquet(snap_path).collect()
    }
    assert got2 == {1: ("ONE", 1.5), 3: ("three", 3.0)}


def test_cdc_crash_restart_exactly_once(spark, tmpdir):
    """Checkpoint recovery: kill the upsert query MID-STREAM — after a
    microbatch's snapshot swap landed but BEFORE its checkpoint commit
    — then restart from the same checkpoint. Structured Streaming
    re-delivers the uncommitted batch (at-least-once), and the
    idempotent merge makes the final snapshot state exactly-once:
    every change applied, none applied twice, later batches intact.
    """
    from cdc_2025_spark.streaming import snapshot_merger

    src = os.path.join(tmpdir, "changes")
    os.makedirs(src)
    snap_path = os.path.join(tmpdir, "snapshot")
    ckpt = os.path.join(tmpdir, "ckpt_crash")

    batches = [
        [
            (1, "I", datetime(2024, 1, 1, 0, 0, 0), 1, "one", 1.0),
            (2, "I", datetime(2024, 1, 1, 0, 0, 0), 2, "two", 2.0),
        ],
        [
            (1, "U", datetime(2024, 1, 1, 0, 1, 0), 3, "ONE", 1.5),
            (3, "I", datetime(2024, 1, 1, 0, 1, 0), 4, "three", 3.0),
        ],
        [
            (2, "D", datetime(2024, 1, 1, 0, 2, 0), 5, None, None),
            (4, "I", datetime(2024, 1, 1, 0, 2, 0), 6, "four", 4.0),
        ],
    ]
    for rows in batches:
        spark.createDataFrame(rows, CHANGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # one file per microbatch so the crash lands mid-stream
    def make_stream():
        return (
            spark.readStream.schema(CHANGES_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    inner = snapshot_merger(snap_path, ["k"])
    applied: list[int] = []

    def crashing_merge(batch, batch_id):
        inner(batch, batch_id)  # effects land...
        applied.append(batch_id)
        if batch_id == 1:
            # ...then the "process dies" before the checkpoint commit
            raise RuntimeError("injected crash after merge")

    q = cdc_upsert_stream(
        make_stream(), snap_path, ["k"], checkpoint_path=ckpt,
        merge_fn=crashing_merge,
    )
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()
    assert applied == [0, 1]
    # batch 1's effects are on disk even though its commit was lost
    mid = {r["k"]: r["name"] for r in spark.read.parquet(snap_path).collect()}
    assert mid == {1: "ONE", 2: "two", 3: "three"}

    # restart from the same checkpoint with the normal merger
    replayed: list[int] = []

    def recording_merge(batch, batch_id):
        inner(batch, batch_id)
        replayed.append(batch_id)

    q2 = cdc_upsert_stream(
        make_stream(), snap_path, ["k"], checkpoint_path=ckpt,
        merge_fn=recording_merge,
    )
    q2.awaitTermination(120)
    assert q2.exception() is None
    # batch 1 was RE-delivered (its commit never landed), batch 0 not
    assert replayed == [1, 2]
    got = {
        r["k"]: (r["name"], r["amount"])
        for r in spark.read.parquet(snap_path).collect()
    }
    assert got == {
        1: ("ONE", 1.5),
        3: ("three", 3.0),
        4: ("four", 4.0),
    }


def test_cdc_into_dedup_compose(spark, tmpdir):
    """Pipeline composition: a CDC'd document corpus streamed into a
    snapshot, then batch dedup over the snapshot — the 'continuously
    ingested training corpus with dedup' shape. The dedup result over
    the streamed snapshot must equal dedup over the known final
    corpus state (updates change content groups; deletes remove
    docs)."""
    from cdc_2025_spark.dedup import exact_dup_groups
    from cdc_2025_spark.dedup.exact import content_key

    schema = (
        "doc_id long, op string, op_ts timestamp, _seq long, text string"
    )
    src = os.path.join(tmpdir, "doc_changes")
    os.makedirs(src)
    t0 = datetime(2024, 1, 1)
    changes = spark.createDataFrame(
        [
            (1, "I", t0, 1, "hello world"),
            (2, "I", t0, 2, "HELLO   world"),  # dup of 1 (normalized)
            (3, "I", t0, 3, "something else"),
            (4, "I", t0, 4, "to be deleted"),
            (2, "U", datetime(2024, 1, 2), 5, "now unique text"),
            (4, "D", datetime(2024, 1, 2), 6, None),
            (5, "I", datetime(2024, 1, 2), 7, "hello world"),  # new dup of 1
        ],
        schema,
    )
    changes.coalesce(1).write.mode("append").parquet(src)
    snap_path = os.path.join(tmpdir, "doc_snapshot")
    q = cdc_upsert_stream(
        spark.readStream.schema(changes.schema).parquet(src),
        snap_path,
        ["doc_id"],
        checkpoint_path=os.path.join(tmpdir, "ckpt_docs"),
    )
    q.awaitTermination(120)

    snapshot = spark.read.parquet(snap_path)
    expected_corpus = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "now unique text"),
            (3, "something else"),
            (5, "hello world"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["n_docs"], r["canonical_id"])
        for r in exact_dup_groups(
            snapshot, "doc_id", content_key("text")
        ).collect()
    }
    want = {
        (r["n_docs"], r["canonical_id"])
        for r in exact_dup_groups(
            expected_corpus, "doc_id", content_key("text")
        ).collect()
    }
    assert got == want
    assert (2, 1) in got  # docs 1 and 5 duplicate; min-id survivor


def test_scd2_history_semantics(spark):
    """I/U open versions, D closes without emitting, re-insert after
    delete opens a fresh interval, _seq breaks ties."""
    from cdc_2025_spark.streaming import scd2_history

    changes = spark.createDataFrame(
        [
            (1, "I", datetime(2024, 1, 1, 0, 0, 0), 1, "a", 1.0),
            (1, "U", datetime(2024, 1, 1, 0, 1, 0), 2, "a2", 1.5),
            (1, "D", datetime(2024, 1, 1, 0, 2, 0), 3, None, None),
            (1, "I", datetime(2024, 1, 1, 0, 3, 0), 4, "a3", 2.0),
            # key 2: tie on op_ts, _seq orders the versions
            (2, "I", datetime(2024, 1, 1, 0, 0, 0), 5, "b", 9.0),
            (2, "U", datetime(2024, 1, 1, 0, 0, 0), 6, "b2", 9.5),
        ],
        CHANGES_SCHEMA,
    )
    hist = scd2_history(changes, ["k"]).collect()
    by_key_from = {
        (r["k"], r["valid_from"]): r for r in hist
    }
    assert len(hist) == 5  # 3 for k=1 (D emits nothing), 2 for k=2
    v1 = by_key_from[(1, datetime(2024, 1, 1, 0, 0, 0))]
    assert v1["valid_to"] == datetime(2024, 1, 1, 0, 1, 0)
    v2 = by_key_from[(1, datetime(2024, 1, 1, 0, 1, 0))]
    # closed by the DELETE, not by the re-insert
    assert v2["valid_to"] == datetime(2024, 1, 1, 0, 2, 0)
    v3 = by_key_from[(1, datetime(2024, 1, 1, 0, 3, 0))]
    assert v3["valid_to"] is None and v3["is_current"]
    # tie: _seq=5 version closed by _seq=6 at the same instant
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    assert by_key_from[(2, t0)]["name"] in ("b", "b2")
    currents = [r for r in hist if r["k"] == 2 and r["is_current"]]
    assert len(currents) == 1 and currents[0]["name"] == "b2"


def test_scd2_sequential_apply_matches_full_log(spark):
    """Property: splitting the change log into batches and applying
    incrementally reproduces the full-log history bit-for-bit, and
    replaying a batch is a no-op (idempotency)."""
    import random

    from cdc_2025_spark.streaming import apply_changes_scd2, scd2_history

    rng = random.Random(7)
    rows = []
    seq = 0
    for t in range(40):
        k = rng.randrange(5)
        op = rng.choice(["I", "U", "U", "D"])
        seq += 1
        rows.append(
            (
                k,
                op,
                datetime(2024, 1, 1, 0, 0, t),
                seq,
                None if op == "D" else f"v{seq}",
                None if op == "D" else float(seq),
            )
        )
    log = spark.createDataFrame(rows, CHANGES_SCHEMA)
    full = scd2_history(log, ["k"])

    hist = None
    batches = [
        log.filter(F.col("op_ts") < datetime(2024, 1, 1, 0, 0, 15)),
        log.filter(
            (F.col("op_ts") >= datetime(2024, 1, 1, 0, 0, 15))
            & (F.col("op_ts") < datetime(2024, 1, 1, 0, 0, 30))
        ),
        log.filter(F.col("op_ts") >= datetime(2024, 1, 1, 0, 0, 30)),
    ]
    for b in batches:
        hist = apply_changes_scd2(hist, b, ["k"])
    # replay the last batch: must change nothing
    replayed = apply_changes_scd2(hist, batches[-1], ["k"])

    def canon(df):
        return sorted(
            (r["k"], r["name"], r["amount"], r["valid_from"],
             r["valid_to"], r["is_current"])
            for r in df.collect()
        )

    assert canon(hist) == canon(full)
    assert canon(replayed) == canon(full)


def test_cdc_scd2_stream_end_to_end(spark, tmpdir):
    """File-drop change stream -> SCD2 parquet history via
    foreachBatch, across two availableNow runs sharing a
    checkpoint."""
    from cdc_2025_spark.streaming import cdc_scd2_stream

    src = os.path.join(tmpdir, "changes")
    os.makedirs(src)
    b1 = spark.createDataFrame(
        [
            (1, "I", datetime(2024, 1, 1, 0, 0, 0), 1, "one", 1.0),
            (2, "I", datetime(2024, 1, 1, 0, 0, 0), 2, "two", 2.0),
        ],
        CHANGES_SCHEMA,
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    hist_path = os.path.join(tmpdir, "history")
    ckpt = os.path.join(tmpdir, "ckpt_scd2")
    q = cdc_scd2_stream(
        spark.readStream.schema(b1.schema).parquet(src),
        hist_path,
        ["k"],
        checkpoint_path=ckpt,
    )
    q.awaitTermination(120)
    assert spark.read.parquet(hist_path).count() == 2

    b2 = spark.createDataFrame(
        [
            (1, "U", datetime(2024, 1, 1, 0, 1, 0), 3, "ONE", 1.5),
            (2, "D", datetime(2024, 1, 1, 0, 1, 0), 4, None, None),
        ],
        CHANGES_SCHEMA,
    )
    b2.coalesce(1).write.mode("append").parquet(src)
    q2 = cdc_scd2_stream(
        spark.readStream.schema(b1.schema).parquet(src),
        hist_path,
        ["k"],
        checkpoint_path=ckpt,
    )
    q2.awaitTermination(120)
    hist = {
        (r["k"], r["valid_from"]): r
        for r in spark.read.parquet(hist_path).collect()
    }
    assert len(hist) == 3  # two v1 rows + k=1's update (D emits none)
    assert hist[(1, datetime(2024, 1, 1, 0, 0, 0))]["valid_to"] == datetime(
        2024, 1, 1, 0, 1, 0
    )
    assert hist[(1, datetime(2024, 1, 1, 0, 1, 0))]["is_current"]
    # k=2 deleted: its only version is closed, nothing current
    assert hist[(2, datetime(2024, 1, 1, 0, 0, 0))]["valid_to"] == datetime(
        2024, 1, 1, 0, 1, 0
    )
    assert not any(r["is_current"] for (k, _), r in hist.items() if k == 2)


def test_swap_crash_window_recovery(spark, tmpdir):
    """A crash INSIDE the swap (between the two renames, or after the
    new live landed but before the backup delete) must never lose the
    store: _recover_store rolls back / cleans up, and re-merging the
    interrupted batch (at-least-once redelivery) converges to the
    correct state. The old rmtree+rename swap failed this: the crash
    window left NO live dir and a restart silently treated the next
    batch as initial state."""
    from cdc_2025_spark.streaming import snapshot_merger

    snap_path = os.path.join(tmpdir, "snap")
    merge = snapshot_merger(snap_path, ["k"])
    b1 = spark.createDataFrame(
        [
            (1, "I", datetime(2024, 1, 1, 0, 0, 0), 1, "one", 1.0),
            (2, "I", datetime(2024, 1, 1, 0, 0, 0), 2, "two", 2.0),
        ],
        CHANGES_SCHEMA,
    )
    b2 = spark.createDataFrame(
        [
            (1, "U", datetime(2024, 1, 1, 0, 1, 0), 3, "ONE", 1.5),
            (3, "I", datetime(2024, 1, 1, 0, 1, 0), 4, "three", 3.0),
        ],
        CHANGES_SCHEMA,
    )
    merge(b1, 0)

    # Crash state A: between rename(live -> live.old) and
    # rename(tmp -> live) during b2's merge — live is MISSING.
    os.rename(snap_path, snap_path + ".old")
    assert not os.path.exists(snap_path)
    merge(b2, 1)  # redelivered batch: recovery rolls back, then merges
    got = {
        r["k"]: (r["name"], r["amount"])
        for r in spark.read.parquet(snap_path).collect()
    }
    assert got == {1: ("ONE", 1.5), 2: ("two", 2.0), 3: ("three", 3.0)}
    assert not os.path.exists(snap_path + ".old")

    # Crash state B: new live landed but the backup delete didn't run.
    # The stale backup must be dropped, the live store left intact.
    b3 = spark.createDataFrame(
        [(2, "D", datetime(2024, 1, 1, 0, 2, 0), 5, None, None)],
        CHANGES_SCHEMA,
    )
    os.makedirs(snap_path + ".old")
    merge(b3, 2)
    got = {
        r["k"]: (r["name"], r["amount"])
        for r in spark.read.parquet(snap_path).collect()
    }
    assert got == {1: ("ONE", 1.5), 3: ("three", 3.0)}
    assert not os.path.exists(snap_path + ".old")


def test_scd2_same_ts_across_batch_boundary(spark):
    """The replay-safety guard must not mask a REAL same-timestamp
    successor arriving in a later batch: two updates to one key with
    equal op_ts split across microbatches close/dedupe by (ts, _seq),
    reproducing the full-log history exactly — including the
    degenerate zero-length interval for the superseded version — and
    replaying either batch stays a no-op."""
    from cdc_2025_spark.streaming import apply_changes_scd2, scd2_history

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    t1 = datetime(2024, 1, 1, 0, 1, 0)
    rows = [
        (1, "I", t0, 1, "a", 1.0),
        (1, "U", t0, 2, "a2", 2.0),   # same ts, later seq, SAME batch
        (1, "U", t1, 3, "a3", 3.0),
        (1, "U", t1, 4, "a4", 4.0),   # same ts, later seq, NEXT batch
        (2, "I", t1, 5, "b", 9.0),
    ]
    log = spark.createDataFrame(rows, CHANGES_SCHEMA)
    full = scd2_history(log, ["k"], keep_seq=True)

    b1 = log.filter(F.col("_seq") <= 3)
    b2 = log.filter(F.col("_seq") > 3)
    hist = apply_changes_scd2(None, b1, ["k"])
    hist = apply_changes_scd2(hist, b2, ["k"])

    def canon(df):
        return sorted(
            (r["k"], r["name"], r["valid_from"], r["valid_from_seq"],
             r["valid_to"], r["is_current"])
            for r in df.collect()
        )

    assert canon(hist) == canon(full)
    # the (t1, seq=3) version opened in b1 was closed by b2's
    # same-timestamp successor — a strict-ts guard would miss this
    v3 = [r for r in hist.collect() if r["valid_from_seq"] == 3][0]
    assert v3["valid_to"] == t1 and not v3["is_current"]
    # idempotency: replaying either batch changes nothing
    assert canon(apply_changes_scd2(hist, b1, ["k"])) == canon(full)
    assert canon(apply_changes_scd2(hist, b2, ["k"])) == canon(full)


def test_stream_static_binned_interval_join_matches_batch(
    spark, sf_dir, event_files, tmpdir
):
    """The bin-bucketed interval join (functions/intervals.py) is
    stateless against a static interval table, so it composes directly
    with a streaming fact side: streamed events joined to broadcast
    observation windows must emit exactly the batch result."""
    from cdc_2025_spark.functions.intervals import binned_interval_join

    windows = (
        spark.range(0, 175)
        .select(
            (
                F.lit("2024-01-01").cast("timestamp")
                + F.make_interval(hours=F.lit(4) * F.col("id"))
            ).alias("w_start")
        )
        .withColumn(
            "w_end", F.col("w_start") + F.make_interval(mins=F.lit(90))
        )
    )
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(event_files)
    out = binned_interval_join(
        stream, windows, "ts", "w_start", "w_end", bin_seconds=4 * 3600
    ).select("event_id", "w_start")
    q = (
        out.writeStream.format("memory")
        .queryName("binned_iv_test")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt_biv"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["event_id"], r["w_start"])
        for r in spark.sql("select * from binned_iv_test").collect()
    }
    ev = read_table(spark, sf_dir, "events")
    want = {
        (r["event_id"], r["w_start"])
        for r in binned_interval_join(
            ev, windows, "ts", "w_start", "w_end", bin_seconds=4 * 3600
        ).select("event_id", "w_start").collect()
    }
    # stateless join, no watermark holdback: exact equality
    assert got == want and len(got) > 0


def test_streaming_bloom_bitmap_maintenance(spark, tmpdir):
    """The Bloom bitmap's incremental story under Structured
    Streaming: each microbatch builds its own small bitmap and
    bit_or-merges it into the store (foreachBatch) — after the stream
    drains, the maintained bitmap must equal the bitmap built over
    the full key set in one batch, bit for bit (so probes, FPR, and
    the no-false-negative guarantee are identical to a rebuild)."""
    from cdc_2025_spark.dedup.bloom import bloom_build, bloom_params

    src = os.path.join(tmpdir, "bloom_keys")
    os.makedirs(src)
    all_keys = [f"key{i}" for i in range(600)]
    for b in range(3):
        spark.createDataFrame(
            [(k,) for k in all_keys[b * 200 : (b + 1) * 200]],
            "key string",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"b{b}")
        )
    flat = os.path.join(tmpdir, "bloom_flat")
    os.makedirs(flat)
    for b in range(3):
        d = os.path.join(src, f"b{b}")
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                shutil.copy(
                    os.path.join(d, f), os.path.join(flat, f"{b}-{f}")
                )

    m, k = bloom_params(600, 0.01)
    store: dict[int, int] = {}

    def absorb(batch_df, batch_id):
        for r in bloom_build(batch_df, "key", m, k).collect():
            store[r["bucket"]] = store.get(r["bucket"], 0) | r["bits"]

    stream = spark.readStream.schema("key string").option(
        "maxFilesPerTrigger", 1
    ).parquet(flat)
    q = (
        stream.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", os.path.join(tmpdir, "bloom_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    full = {
        r["bucket"]: r["bits"]
        for r in bloom_build(
            spark.createDataFrame([(x,) for x in all_keys], "key string"),
            "key",
            m,
            k,
        ).collect()
    }
    assert store == full and len(store) > 0


def test_streaming_cms_table_maintenance(spark, tmpdir):
    """The count-min table's incremental story under Structured
    Streaming (the Bloom pattern above, summed instead of OR'd):
    each microbatch sketches itself and its cells ADD into the
    store — counters are linear, so after the stream drains the
    maintained table must equal the one-batch rebuild cell for
    cell, making estimates and the one-sided-error guarantee
    identical to a rebuild."""
    from cdc_2025_spark.functions.cms import cms_table

    src = os.path.join(tmpdir, "cms_keys")
    os.makedirs(src)
    all_keys = [f"k{i % 37}" for i in range(600)]  # skewed stream
    flat = os.path.join(tmpdir, "cms_flat")
    os.makedirs(flat)
    for b in range(3):
        d = os.path.join(src, f"b{b}")
        spark.createDataFrame(
            [(k,) for k in all_keys[b * 200 : (b + 1) * 200]],
            "key string",
        ).coalesce(1).write.mode("overwrite").parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                shutil.copy(
                    os.path.join(d, f), os.path.join(flat, f"{b}-{f}")
                )

    depth, width = 4, 32
    store: dict[tuple[int, int], int] = {}

    def absorb(batch_df, batch_id):
        sk = cms_table(batch_df, "key", depth=depth, width=width)
        for r in sk.table.collect():
            cell = (r["row"], r["col"])
            store[cell] = store.get(cell, 0) + r["cnt"]

    stream = spark.readStream.schema("key string").option(
        "maxFilesPerTrigger", 1
    ).parquet(flat)
    q = (
        stream.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", os.path.join(tmpdir, "cms_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    full = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_table(
            spark.createDataFrame([(x,) for x in all_keys], "key string"),
            "key",
            depth=depth,
            width=width,
        ).table.collect()
    }
    assert store == full and len(store) > 0


def test_streaming_hll_sketch_maintenance(spark, tmpdir):
    """The third mergeable-summary streaming leg (Bloom = bit_or,
    CMS = sum, HLL = union): per-microbatch HLL sketches union-merge
    into a store, and the drained store's distinct estimate must
    agree with the one-batch rebuild AND sit inside the sketch's
    error envelope around the exact count. (Datasketches unions are
    not guaranteed byte-identical to a direct sketch, so the pinned
    invariant is estimate agreement, not bitmap equality.)"""
    src = os.path.join(tmpdir, "hll_keys")
    os.makedirs(src)
    all_keys = [f"u{i}" for i in range(3000)]
    flat = os.path.join(tmpdir, "hll_flat")
    os.makedirs(flat)
    for b in range(3):
        d = os.path.join(src, f"b{b}")
        spark.createDataFrame(
            # overlapping batches: dedup across batches is the point
            [(k,) for k in all_keys[b * 800 : b * 800 + 1400]],
            "user_id string",
        ).coalesce(1).write.mode("overwrite").parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                shutil.copy(
                    os.path.join(d, f), os.path.join(flat, f"{b}-{f}")
                )

    batch_sketches: list[bytearray] = []

    def absorb(batch_df, batch_id):
        row = batch_df.agg(
            F.hll_sketch_agg("user_id").alias("sk")
        ).collect()[0]
        batch_sketches.append(row["sk"])

    stream = spark.readStream.schema("user_id string").option(
        "maxFilesPerTrigger", 1
    ).parquet(flat)
    q = (
        stream.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", os.path.join(tmpdir, "hll_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(batch_sketches) == 3

    merged_est = (
        spark.createDataFrame([(bytes(s),) for s in batch_sketches], "sk binary")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    n_exact = len(set(all_keys[:1400]) | set(all_keys[800:2200]) | set(all_keys[1600:3000]))
    rebuilt_est = (
        spark.createDataFrame([(k,) for k in all_keys[:3000]], "user_id string")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(merged_est - rebuilt_est) / n_exact <= 0.05
    assert abs(merged_est - n_exact) / n_exact <= 0.05


def test_streaming_reservoir_sample_maintenance(spark, tmpdir):
    """The fourth mergeable-summary streaming leg (Bloom = bit_or,
    CMS = sum, HLL = union, reservoir = union + re-take): each
    microbatch takes its own bottom-k and merges into the store;
    after the stream drains, the maintained K-sample must equal the
    one-batch rebuild row for row — bottom-k merge is exact, not
    approximate."""
    from cdc_2025_spark.functions.reservoir import bottomk_sample

    src = os.path.join(tmpdir, "rsv_keys")
    os.makedirs(src)
    all_ids = list(range(900))
    flat = os.path.join(tmpdir, "rsv_flat")
    os.makedirs(flat)
    for b in range(3):
        d = os.path.join(src, f"b{b}")
        spark.createDataFrame(
            [(i,) for i in all_ids[b * 300 : (b + 1) * 300]],
            "doc_id long",
        ).coalesce(1).write.mode("overwrite").parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                shutil.copy(
                    os.path.join(d, f), os.path.join(flat, f"{b}-{f}")
                )

    k = 40
    store: dict[int, int] = {}  # doc_id -> prio

    def absorb(batch_df, batch_id):
        for r in bottomk_sample(batch_df, k, "doc_id").collect():
            store[r["doc_id"]] = r["prio"]
        keep = sorted(store.items(), key=lambda kv: (kv[1], kv[0]))[:k]
        store.clear()
        store.update(keep)

    stream = spark.readStream.schema("doc_id long").option(
        "maxFilesPerTrigger", 1
    ).parquet(flat)
    q = (
        stream.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", os.path.join(tmpdir, "rsv_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    full = {
        r["doc_id"]: r["prio"]
        for r in bottomk_sample(
            spark.createDataFrame([(i,) for i in all_ids], "doc_id long"),
            k,
            "doc_id",
        ).collect()
    }
    assert store == full and len(store) == k


def test_streaming_pca_suffstat_maintenance(spark, tmpdir):
    """The fifth mergeable-summary streaming leg (Bloom = bit_or,
    CMS = sum, HLL = union, reservoir = union+take, PCA = suffstat
    ADD): each microbatch reduces to (n, sum, Gram) and the store
    adds them; after the stream drains, refitting from the
    maintained stats must reproduce the one-batch fit — counts
    exactly, moments and the spectrum to float-sum tolerance."""
    import numpy as np

    from cdc_2025_spark.functions.pca import (
        pca_fit,
        pca_fit_from_stats,
        pca_suffstats,
    )

    rng_rows = [
        (i, [((i * 31 + j * 7) % 97) / 97.0 for j in range(8)])
        for i in range(600)
    ]
    flat = os.path.join(tmpdir, "pca_flat")
    os.makedirs(flat)
    for b in range(3):
        d = os.path.join(tmpdir, f"pca_b{b}")
        spark.createDataFrame(
            rng_rows[b * 200 : (b + 1) * 200],
            "vec_id long, embedding array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                shutil.copy(
                    os.path.join(d, f), os.path.join(flat, f"{b}-{f}")
                )

    store = {"n": 0, "s": np.zeros(8), "g": np.zeros((8, 8))}

    def absorb(batch_df, batch_id):
        n, s, g = pca_suffstats(batch_df)
        store["n"] += n
        store["s"] = store["s"] + s
        store["g"] = store["g"] + g

    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).option("maxFilesPerTrigger", 1).parquet(flat)
    q = (
        stream.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", os.path.join(tmpdir, "pca_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    full = spark.createDataFrame(
        rng_rows, "vec_id long, embedding array<double>"
    )
    mu_m, comps_m, w_m, n_m = pca_fit_from_stats(
        store["n"], store["s"], store["g"], 3
    )
    mu_f, comps_f, w_f, n_f = pca_fit(full, 3)
    assert n_m == n_f == 600
    np.testing.assert_allclose(mu_m, mu_f, atol=1e-12)
    np.testing.assert_allclose(w_m, w_f, atol=1e-10)
    np.testing.assert_allclose(comps_m, comps_f, atol=1e-8)


def test_streaming_weighted_reservoir_maintenance(spark, tmpdir):
    """The weighted reservoir inherits the mergeable-summary
    streaming contract: per-microbatch weighted bottom-k merged by
    race key into the store equals the one-batch rebuild row for
    row — the Efraimidis-Spirakis race key is a pure function of
    (key, weight), so union + re-take is exact."""
    from cdc_2025_spark.functions.reservoir import (
        weighted_bottomk_sample,
    )

    src = os.path.join(tmpdir, "wrsv_flat")
    os.makedirs(src)
    rows = [(i, float(1 + (i * 7) % 50)) for i in range(600)]
    for b in range(3):
        d = os.path.join(tmpdir, f"wrsv_b{b}")
        spark.createDataFrame(
            rows[b * 200 : (b + 1) * 200], "doc_id long, w double"
        ).coalesce(1).write.mode("overwrite").parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                shutil.copy(
                    os.path.join(d, f), os.path.join(src, f"{b}-{f}")
                )

    k = 30
    store: dict[int, tuple[float, float]] = {}

    def absorb(batch_df, batch_id):
        for r in weighted_bottomk_sample(
            batch_df, k, "doc_id", "w"
        ).collect():
            store[r["doc_id"]] = (r["wprio"], r["weight"])
        keep = sorted(store.items(), key=lambda kv: (kv[1][0], kv[0]))[:k]
        store.clear()
        store.update(keep)

    stream = spark.readStream.schema("doc_id long, w double").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", os.path.join(tmpdir, "wrsv_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    full = {
        r["doc_id"]: (r["wprio"], r["weight"])
        for r in weighted_bottomk_sample(
            spark.createDataFrame(rows, "doc_id long, w double"),
            k,
            "doc_id",
            "w",
        ).collect()
    }
    assert store == full and len(store) == k


def test_kafka_reader_option_surface():
    """The Kafka leg of cdc_source is constructed but UNTESTABLE here
    (the spark-sql-kafka connector is not on the sandbox classpath),
    so the config contract is pinned as a pure function: replay from
    earliest retained offsets on first start, subscribe (not assign)
    so partition discovery is dynamic, and NO failOnDataLoss override
    (the default true is the correct CDC posture — silent gaps corrupt
    every downstream snapshot)."""
    from cdc_2025_spark.streaming.cdc import kafka_reader_options

    opts = kafka_reader_options("broker1:9092,broker2:9092", "cdc.users")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "cdc.users",
        "startingOffsets": "earliest",
    }
    assert "failOnDataLoss" not in opts
    for bad in [(None, "t"), ("b", None), ("", ""), (None, None)]:
        with pytest.raises(ValueError, match="kafka"):
            kafka_reader_options(*bad)


def test_versioned_sink_exactly_once_under_replay(spark, tmpdir):
    """foreachBatch into a versioned table via versioned_sink: each
    microbatch commits one snapshot with the (query, batch_id)
    idempotent txn, so manually re-invoking the sink with an
    already-committed batch_id (the replay failure mode) changes
    NOTHING — no new version, no duplicate rows — while a genuinely
    new batch id commits."""
    from cdc_2025_spark.streaming.cdc import versioned_sink
    from cdc_2025_spark.versioned import (
        history,
        latest_version,
        read_versioned,
    )

    src = os.path.join(tmpdir, "rows")
    os.makedirs(src)
    b1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    table = os.path.join(tmpdir, "vtbl")
    sink = versioned_sink(table, "q_sink")
    q = (
        spark.readStream.schema(b1.schema)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option(
            "checkpointLocation", os.path.join(tmpdir, "ckpt_vs")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert read_versioned(spark, table).count() == 2
    v_after = latest_version(table)
    committed_batches = history(table)[-1]["txns"]["q_sink"]
    # REPLAY: re-invoke the sink with the committed batch id
    sink(b1, committed_batches)
    assert latest_version(table) == v_after
    assert read_versioned(spark, table).count() == 2
    # an older batch id is also skipped
    sink(b1, committed_batches - 1)
    assert latest_version(table) == v_after
    # a genuinely new batch id commits
    sink(
        spark.createDataFrame([(3, "c")], "id long, v string"),
        committed_batches + 1,
    )
    assert latest_version(table) == v_after + 1
    assert read_versioned(spark, table).count() == 3
    # empty batches are a no-op (no version burned)
    sink(b1.limit(0), committed_batches + 2)
    assert latest_version(table) == v_after + 1
