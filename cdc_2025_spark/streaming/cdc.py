"""CDC apply-changes: upsert/delete semantics over a change stream.

Change-row contract (the Debezium-style envelope, flattened):

    key columns ... , op string in {'I','U','D'}, op_ts timestamp,
    payload columns ...

``apply_changes_batch`` is the pure batch kernel: given the current
snapshot and a microbatch of changes, produce the next snapshot —
last-writer-wins per key by (op_ts, tiebreak), deletes drop the key.
``cdc_upsert_stream`` wires that kernel into foreachBatch over any
streaming source (kafka/file/rate), persisting the snapshot as
parquet.

Scale notes: the per-batch winner selection is one hash aggregate on
the key (max_by over the change struct), and the snapshot merge is an
outer join on the key — both shuffle only the microbatch + touched
snapshot partitions. On a real deployment the parquet snapshot store
would be an ACID table format (Delta/Iceberg MERGE INTO), which this
container lacks; the kernel is format-agnostic on purpose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def latest_changes_per_key(
    changes: DataFrame, key_cols: list[str], ts_col: str = "op_ts"
) -> DataFrame:
    """Collapse a change batch to the last change per key:
    max_by(full-row struct, (ts, seq)) — one aggregate, no window sort.

    A ``_seq`` column, if present, breaks op_ts ties (file/offset
    order); otherwise ties resolve by the struct's natural ordering —
    supply _seq for strict CDC streams.
    """
    order_cols = [F.col(ts_col)]
    if "_seq" in changes.columns:
        order_cols.append(F.col("_seq"))
    ordering = F.struct(*order_cols)
    payload = F.struct(*[F.col(c) for c in changes.columns])
    return (
        changes.groupBy(*key_cols)
        .agg(F.max_by(payload, ordering).alias("_last"))
        .select("_last.*")
    )


def apply_changes_batch(
    snapshot: DataFrame | None,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str = "op_ts",
) -> DataFrame:
    """Next snapshot = snapshot MERGE latest(changes).

    - op in ('I','U'): upsert payload
    - op = 'D': remove key
    Rows in the snapshot untouched by the batch pass through.
    """
    last = latest_changes_per_key(changes, key_cols, ts_col)
    upserts = last.filter(F.col("op") != "D").drop("op", ts_col, "_seq")
    deletes = last.filter(F.col("op") == "D").select(*key_cols)
    if snapshot is None:
        return upserts
    kept = snapshot.join(last.select(*key_cols), key_cols, "left_anti")
    return kept.unionByName(upserts)


def cdc_source(
    spark,
    source: str,
    schema=None,
    path: str | None = None,
    kafka_bootstrap: str | None = None,
    kafka_topic: str | None = None,
    rows_per_second: int = 100,
) -> DataFrame:
    """Uniform change-stream reader: 'parquet'/'json' file drops,
    'rate' (synthetic, for load tests), or 'kafka' (Debezium-style
    topics; requires the Kafka connector on the classpath — not
    present in this container, exercised in real deployments only).

    All three return the same unstarted streaming DataFrame shape the
    rest of the CDC pipeline consumes; file and rate paths are tested
    (tests/test_streaming.py), kafka is constructed identically.
    """
    if source in ("parquet", "json"):
        if schema is None or path is None:
            raise ValueError("file sources need schema and path")
        return getattr(
            spark.readStream.schema(schema), source
        )(path)
    if source == "rate":
        return spark.readStream.format("rate").option(
            "rowsPerSecond", str(rows_per_second)
        ).load()
    if source == "kafka":
        reader = spark.readStream.format("kafka")
        for k, v in kafka_reader_options(
            kafka_bootstrap, kafka_topic
        ).items():
            reader = reader.option(k, v)
        return reader.load()
    raise ValueError(f"unknown CDC source {source!r}")


def kafka_reader_options(
    bootstrap: str | None, topic: str | None
) -> dict[str, str]:
    """The Kafka reader's full option surface, as a pure function so
    the config contract is unit-testable WITHOUT the connector on the
    classpath (the spark-sql-kafka package is not in this container;
    ``load()`` is exercised in real deployments only — the file and
    rate paths cover the rest of the pipeline's streaming semantics
    over the same frame shape).

    startingOffsets=earliest: a CDC consumer must replay the topic's
    retained history on first start or the initial snapshot is
    incomplete; after the first checkpoint commit, offsets come from
    the checkpoint and this option is ignored — so it is safe for
    restarts too. failOnDataLoss stays at its default (true): silent
    gaps in a change stream corrupt every downstream snapshot."""
    if not (bootstrap and topic):
        raise ValueError("kafka source needs bootstrap servers and topic")
    return {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": "earliest",
    }


def _recover_store(path: str) -> None:
    """Restore a parquet store to a consistent state after a crash
    inside ``_swap_store``'s rename window.

    Possible on-disk states and their meaning:
    - live only                      -> healthy, nothing to do
    - live + live.old                -> crash AFTER the new live landed
                                        but before the backup was
                                        deleted: drop the stale backup
    - live.old only (live missing)   -> crash BETWEEN the two renames:
                                        roll back to the pre-batch
                                        state; the interrupted batch
                                        was never checkpoint-committed,
                                        so the stream re-delivers it
                                        (at-least-once) and the merge
                                        re-applies it idempotently
    """
    import os
    import shutil

    old = path + ".old"
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)
        else:
            os.rename(old, path)


def _swap_store(path: str, tmp: str) -> None:
    """Replace the live store with ``tmp`` without ever passing
    through a no-live-dir state: rename live aside, rename tmp in,
    then delete the backup. A crash at any point leaves either the
    old or the new store recoverable via ``_recover_store`` — unlike
    rmtree(live)+rename(tmp), whose crash window silently loses all
    prior state and makes a restart treat the next batch as initial.
    """
    import os
    import shutil

    old = path + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def snapshot_merger(
    snapshot_path: str,
    key_cols: list[str],
    ts_col: str = "op_ts",
):
    """Build the foreachBatch merge function: each microbatch reads
    the current parquet snapshot, applies the changes, and atomically
    replaces it (write to temp dir + rename-aside swap, see
    ``_swap_store``/``_recover_store``) — the parquet stand-in for
    MERGE INTO on an ACID table.

    IDEMPOTENT under microbatch replay: foreachBatch is at-least-once
    (a batch whose effects landed but whose checkpoint commit didn't
    is re-delivered after restart), and re-merging the same change
    batch is a no-op — upserts rewrite identical rows, deletes
    left-anti against already-absent keys. That idempotency is what
    turns at-least-once delivery into exactly-once snapshot state;
    pinned by the crash-restart tests in tests/test_streaming.py
    (including a crash injected INSIDE the swap window).
    Exposed separately from cdc_upsert_stream so deployments can swap
    in a Delta/Iceberg MERGE INTO behind the same (batch, batch_id)
    contract.
    """
    import os

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        _recover_store(snapshot_path)
        snap = None
        if os.path.exists(snapshot_path):
            snap = spark.read.parquet(snapshot_path)
        nxt = apply_changes_batch(snap, batch, key_cols, ts_col)
        tmp = snapshot_path + f".tmp-{batch_id}"
        nxt.write.mode("overwrite").parquet(tmp)
        _swap_store(snapshot_path, tmp)

    return merge_batch


def cdc_upsert_stream(
    changes_stream: DataFrame,
    snapshot_path: str,
    key_cols: list[str],
    ts_col: str = "op_ts",
    checkpoint_path: str | None = None,
    trigger_available_now: bool = True,
    merge_fn=None,
) -> StreamingQuery:
    """Run apply-changes over a streaming source into a parquet
    snapshot at ``snapshot_path`` via foreachBatch (see
    snapshot_merger for the per-batch contract and idempotency).

    ``merge_fn`` overrides the default parquet merger — e.g. an ACID
    MERGE INTO, or a fault-injecting wrapper in recovery tests.
    """
    if merge_fn is None:
        merge_fn = snapshot_merger(snapshot_path, key_cols, ts_col)

    writer = changes_stream.writeStream.foreachBatch(merge_fn).outputMode(
        "update"
    )
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- SCD Type-2: change HISTORY, not just the latest snapshot ------


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str = "op_ts",
    keep_seq: bool = False,
) -> DataFrame:
    """Full SCD Type-2 history from a complete change log: one row
    per (key, version) with ``valid_from``/``valid_to`` interval and
    ``is_current`` flag (the APPLY CHANGES ... STORED AS SCD TYPE 2
    semantics of public DLT/warehouse tooling, re-expressed as one
    keyed window).

    - every I/U opens a version at its ``ts_col``;
    - a version closes at the NEXT event for the key (U or D alike),
      so deletes close the open interval without emitting a row, and
      a later re-insert opens a fresh version;
    - ``_seq``, if present, breaks op_ts ties (file/offset order).
    - ``keep_seq=True`` persists the opening event's ``_seq`` as a
      ``valid_from_seq`` column, so a version is identified by
      (key, valid_from, valid_from_seq). The incremental merge
      (``apply_changes_scd2``) needs that to close/replay-detect
      correctly when equal-op_ts changes span microbatch boundaries;
      batch one-shot callers can leave it off.

    Scale: one window keyed by the CDC key — no global sort; skew is
    bounded by per-key change counts (hot keys are the CDC stream's
    own skew, not an artifact of the plan).
    """
    has_seq = "_seq" in changes.columns
    order = [F.col(ts_col)]
    if has_seq:
        order.append(F.col("_seq"))
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*order)
    keep = [
        c for c in changes.columns if c not in ("op", ts_col, "_seq")
    ]
    version_id: list = [F.col(ts_col).alias("valid_from")]
    if keep_seq:
        if not has_seq:
            raise ValueError("keep_seq=True requires a _seq column")
        version_id.append(F.col("_seq").alias("valid_from_seq"))
    return (
        changes.withColumn("valid_to", F.lead(ts_col).over(w))
        .filter(F.col("op") != "D")
        .select(
            *keep,
            *version_id,
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def apply_changes_scd2(
    history: DataFrame | None,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str = "op_ts",
) -> DataFrame:
    """Incremental SCD2 merge: append the batch's versions and close
    the previously-open version of every touched key at the batch's
    first event for that key.

    Contract (standard append-ordered CDC): batch events are newer
    than anything in ``history`` for their key — newer by (op_ts,
    _seq) when the change stream carries ``_seq``, by op_ts alone
    otherwise. With ``_seq`` the history persists ``valid_from_seq``
    and both the close condition and replay detection compare the
    full (ts, seq) pair, so equal-op_ts changes that span microbatch
    boundaries close/dedupe exactly as the full-log ``scd2_history``
    would. IDEMPOTENT under microbatch replay — a version is
    identified by (key, valid_from[, valid_from_seq]), so re-applied
    batches anti-join away their already-appended rows, and
    re-closing is a no-op because under replay the open row never
    strictly predates the batch's first event. Sequential application
    over batch splits reproduces ``scd2_history`` of the full log
    exactly (pinned by property test, including same-timestamp
    updates interleaved across batch boundaries).
    """
    has_seq = "_seq" in changes.columns
    batch_hist = scd2_history(changes, key_cols, ts_col, keep_seq=has_seq)
    if history is None:
        return batch_hist
    if has_seq != ("valid_from_seq" in history.columns):
        raise ValueError(
            "history and change batch disagree on sequence tracking: "
            "either both carry _seq/valid_from_seq or neither"
        )
    if has_seq:
        first = changes.groupBy(*key_cols).agg(
            F.min(F.struct(F.col(ts_col), F.col("_seq"))).alias("_first")
        ).select(
            *key_cols,
            F.col(f"_first.{ts_col}").alias("_first_ts"),
            F.col("_first._seq").alias("_first_seq"),
        )
        # strictly-before in (ts, seq) lexicographic order
        predates = F.struct(
            F.col("valid_from"), F.col("valid_from_seq")
        ) < F.struct(F.col("_first_ts"), F.col("_first_seq"))
        version_key = [*key_cols, "valid_from", "valid_from_seq"]
        helper_cols = ["_first_ts", "_first_seq"]
    else:
        first = changes.groupBy(*key_cols).agg(
            F.min(ts_col).alias("_first_ts")
        )
        predates = F.col("valid_from") < F.col("_first_ts")
        version_key = [*key_cols, "valid_from"]
        helper_cols = ["_first_ts"]
    closed = (
        history.join(first, key_cols, "left")
        .withColumn(
            "valid_to",
            # close only rows that PREDATE the batch: under replay the
            # open row may belong to this same batch (valid_from >=
            # the batch's first event) and must not be closed by it
            F.when(
                F.col("valid_to").isNull()
                & F.col("_first_ts").isNotNull()
                & predates,
                F.col("_first_ts"),
            ).otherwise(F.col("valid_to")),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(*helper_cols)
    )
    new_rows = batch_hist.join(
        history.select(*version_key),
        version_key,
        "left_anti",
    )
    return closed.unionByName(new_rows)


def scd2_merger(
    history_path: str,
    key_cols: list[str],
    ts_col: str = "op_ts",
):
    """foreachBatch merge function for SCD2 history over a parquet
    store — same rename-aside swap + crash recovery contract (and the
    same replay idempotency argument) as snapshot_merger; swap in an
    ACID MERGE INTO on real deployments."""
    import os

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        _recover_store(history_path)
        hist = None
        if os.path.exists(history_path):
            hist = spark.read.parquet(history_path)
        nxt = apply_changes_scd2(hist, batch, key_cols, ts_col)
        tmp = history_path + f".tmp-{batch_id}"
        nxt.write.mode("overwrite").parquet(tmp)
        _swap_store(history_path, tmp)

    return merge_batch


def cdc_scd2_stream(
    changes_stream: DataFrame,
    history_path: str,
    key_cols: list[str],
    ts_col: str = "op_ts",
    checkpoint_path: str | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Run SCD2 apply-changes over a streaming source into a parquet
    history table at ``history_path`` via foreachBatch."""
    writer = changes_stream.writeStream.foreachBatch(
        scd2_merger(history_path, key_cols, ts_col)
    ).outputMode("update")
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def scd2_as_of(history: DataFrame, ts) -> DataFrame:
    """Point-in-time snapshot from an SCD2 history table: the version
    of each key whose validity interval covers ``ts``
    (valid_from <= ts < valid_to, open intervals unbounded). Keys
    deleted before ``ts`` simply have no covering version. A
    partition-pruning filter at scale (valid_from/valid_to are the
    natural partition/zorder columns of a history table)."""
    t = F.lit(ts)
    return history.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop("is_current")


def versioned_sink(
    path: str, query_name: str, mode: str = "append"
):
    """EXACTLY-ONCE foreachBatch sink into a versioned table: each
    microbatch commits as one snapshot with the idempotent-writer
    transaction ``(query_name, batch_id)`` (the Delta
    txnAppId/txnVersion contract), so a REPLAYED microbatch — the
    normal failure mode of foreachBatch, whose work is otherwise
    only at-least-once — is skipped instead of double-committed.

    Usage::

        stream.writeStream.foreachBatch(
            versioned_sink(table_path, "my_query")
        ).start()

    Composes with everything the table layer enforces per commit:
    schema pin, CHECK constraints, manifest stats for later
    predicate skipping, time travel to any microbatch boundary."""
    from cdc_2025_spark.versioned import write_versioned

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        write_versioned(
            batch, path, mode=mode, txn=(query_name, int(batch_id))
        )

    return _sink
