"""Versioned parquet tables (versioned.py): snapshot isolation, time
travel, rollback, vacuum, the os.link version CAS, crash-orphan
invisibility, and the schema pin."""

from __future__ import annotations

import json
import os

import pytest

from cdc_2025_spark.versioned import (
    history,
    latest_version,
    read_versioned,
    rollback,
    vacuum,
    write_versioned,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in vals], "id long, v string"
    )


def test_append_overwrite_time_travel(spark, tmp_path):
    """Each commit is a readable version; time travel reproduces
    every historical snapshot exactly; latest follows the log."""
    t = str(tmp_path / "tbl")
    v1 = write_versioned(_mk(spark, [(1, "a"), (2, "b")]), t)
    v2 = write_versioned(_mk(spark, [(3, "c")]), t, mode="append")
    v3 = write_versioned(_mk(spark, [(9, "z")]), t, mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert latest_version(t) == 3
    assert _rows(read_versioned(spark, t, 1)) == [(1, "a"), (2, "b")]
    assert _rows(read_versioned(spark, t, 2)) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    assert _rows(read_versioned(spark, t)) == [(9, "z")]
    h = history(t)
    assert [m["operation"] for m in h] == ["create", "append", "overwrite"]
    assert [m["n_rows"] for m in h] == [2, 3, 1]


def test_rollback_is_nondestructive(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_versioned(_mk(spark, [(1, "a")]), t)
    write_versioned(_mk(spark, [(2, "bad")]), t, mode="overwrite")
    v3 = rollback(t, 1)
    assert v3 == 3
    assert _rows(read_versioned(spark, t)) == [(1, "a")]
    # the bad version stays readable for forensics
    assert _rows(read_versioned(spark, t, 2)) == [(2, "bad")]
    assert history(t)[-1]["operation"] == "rollback:1"


def test_version_cas_conflict_retries(spark, tmp_path):
    """A pre-taken version number (simulated concurrent writer) makes
    the commit retry and land on the NEXT version — never overwrite
    the winner's manifest."""
    t = str(tmp_path / "tbl")
    write_versioned(_mk(spark, [(1, "a")]), t)
    # simulate a racing writer owning v2
    fake = {
        "version": 2, "parent": 1, "operation": "append",
        "data_dirs": history(t)[0]["data_dirs"], "n_rows": 1,
        "schema": "struct<id:bigint,v:string>", "committed_at": 0,
    }
    with open(os.path.join(t, "_manifests", "v00000002.json"), "w") as f:
        json.dump(fake, f)
    v = write_versioned(_mk(spark, [(5, "e")]), t, mode="append")
    assert v == 3
    assert json.load(
        open(os.path.join(t, "_manifests", "v00000002.json"))
    ) == fake  # the winner's manifest untouched


def test_schema_pin_refuses_mismatch(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_versioned(_mk(spark, [(1, "a")]), t)
    other = spark.createDataFrame([(1.5,)], "x double")
    with pytest.raises(ValueError, match="schema mismatch"):
        write_versioned(other, t, mode="append")


def test_crash_orphan_invisible_and_vacuumed(spark, tmp_path):
    """A data dir with no manifest (a writer that crashed before the
    CAS) is invisible to every read and reclaimed by vacuum."""
    t = str(tmp_path / "tbl")
    write_versioned(_mk(spark, [(1, "a")]), t)
    orphan = os.path.join(t, "data", "99999999-deadbeef")
    _mk(spark, [(7, "junk")]).write.parquet(orphan)
    assert _rows(read_versioned(spark, t)) == [(1, "a")]
    out = vacuum(t, keep_last=5, retention_hours=0)
    assert out["data_dirs_removed"] == 1
    assert not os.path.exists(orphan)
    assert _rows(read_versioned(spark, t)) == [(1, "a")]


def test_vacuum_retention_protects_inflight_writer(spark, tmp_path):
    """The Delta retention rule: an unreferenced data dir YOUNGER than
    the retention window is a possible concurrent writer that has
    written its parquet but not yet landed its manifest link — vacuum
    must keep it, or the writer's CAS would commit a manifest pointing
    at deleted data (a torn snapshot). Backdating the dir past the
    window makes it a reclaimable crashed-writer orphan."""
    import time as _time

    t = str(tmp_path / "tbl")
    write_versioned(_mk(spark, [(1, "a")]), t)
    inflight = os.path.join(t, "data", "00000002-cafef00d")
    _mk(spark, [(2, "pending")]).write.parquet(inflight)
    out = vacuum(t, keep_last=5)  # default 24 h retention
    assert out["data_dirs_removed"] == 0
    assert out["data_dirs_retained"] == 1
    assert os.path.exists(inflight)
    # the writer's manifest link now lands — the snapshot is whole
    m1 = history(t)[0]
    fake = dict(m1, version=2, parent=1, operation="append",
                data_dirs=m1["data_dirs"] + ["data/00000002-cafef00d"],
                n_rows=2)
    with open(os.path.join(t, "_manifests", "v00000002.json"), "w") as f:
        json.dump(fake, f)
    assert _rows(read_versioned(spark, t)) == [(1, "a"), (2, "pending")]
    # an ACTUALLY crashed writer: backdated past retention, no manifest
    write_versioned(_mk(spark, [(9, "z")]), t, mode="overwrite")
    orphan = os.path.join(t, "data", "00000004-deadbeef")
    _mk(spark, [(4, "junk")]).write.parquet(orphan)
    old = _time.time() - 48 * 3600
    os.utime(orphan, (old, old))
    out = vacuum(t, keep_last=1)
    assert not os.path.exists(orphan)
    assert out["data_dirs_removed"] >= 1
    assert _rows(read_versioned(spark, t)) == [(9, "z")]


def test_rollback_cas_conflict_retries(spark, tmp_path):
    """A pre-taken version number makes rollback retry onto the next
    version (same protocol as write_versioned) instead of raising a
    raw FileExistsError and leaving a .tmp manifest behind."""
    t = str(tmp_path / "tbl")
    write_versioned(_mk(spark, [(1, "a")]), t)
    write_versioned(_mk(spark, [(2, "bad")]), t, mode="overwrite")
    # simulate a racing writer owning v3
    m1 = history(t)[0]
    fake = dict(m1, version=3, parent=2, operation="append")
    with open(os.path.join(t, "_manifests", "v00000003.json"), "w") as f:
        json.dump(fake, f)
    v = rollback(t, 1)
    assert v == 4
    assert _rows(read_versioned(spark, t)) == [(1, "a")]
    assert json.load(
        open(os.path.join(t, "_manifests", "v00000003.json"))
    ) == fake  # the winner's manifest untouched
    leftovers = [
        f for f in os.listdir(os.path.join(t, "_manifests"))
        if ".tmp" in f
    ]
    assert leftovers == []


def test_vacuum_expires_history_keeps_live_data(spark, tmp_path):
    """Vacuum drops old manifests and exactly the data dirs no
    surviving manifest references; the kept snapshots stay intact
    (an append chain shares dirs across manifests — shared dirs
    survive)."""
    t = str(tmp_path / "tbl")
    write_versioned(_mk(spark, [(1, "a")]), t)
    write_versioned(_mk(spark, [(2, "b")]), t, mode="append")
    write_versioned(_mk(spark, [(9, "z")]), t, mode="overwrite")
    write_versioned(_mk(spark, [(10, "y")]), t, mode="append")
    out = vacuum(t, keep_last=2, retention_hours=0)
    assert out["manifests_removed"] == 2
    # v1/v2's dirs (a, b) are unreferenced by v3/v4 -> removed
    assert out["data_dirs_removed"] == 2
    assert _rows(read_versioned(spark, t)) == [(9, "z"), (10, "y")]
    assert _rows(read_versioned(spark, t, 3)) == [(9, "z")]
    with pytest.raises(ValueError, match="does not exist"):
        read_versioned(spark, t, 1)


def test_validations(spark, tmp_path):
    t = str(tmp_path / "tbl")
    with pytest.raises(ValueError, match="no committed"):
        read_versioned(spark, t)
    write_versioned(_mk(spark, [(1, "a")]), t)
    with pytest.raises(ValueError, match="mode"):
        write_versioned(_mk(spark, [(2, "b")]), t, mode="merge")
    with pytest.raises(ValueError, match="missing version"):
        rollback(t, 7)
    with pytest.raises(ValueError, match="keep_last"):
        vacuum(t, keep_last=0)


def test_cdc_upsert_stream_into_versioned_table(spark, tmp_path):
    """Integration: a CDC change stream maintained through
    foreachBatch + apply_changes_batch, COMMITTED per microbatch as
    a versioned snapshot — time travel reproduces every mid-stream
    state, and a rollback undoes a bad batch without losing the
    audit trail. The versioned table is the crash-safe store the
    per-batch overwrite pattern lacks (a killed writer leaves an
    invisible orphan, never a torn snapshot)."""
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cdc_2025_spark.streaming.cdc import apply_changes_batch

    src = str(tmp_path / "changes")
    os.makedirs(src)
    batches = [
        [(1, "a", "I", 1.0), (2, "b", "I", 2.0)],
        [(1, "a2", "U", 3.0), (3, "c", "I", 4.0)],
        [(2, None, "D", 5.0)],
    ]
    for i, rows in enumerate(batches):
        tbl = pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "val": pa.array([r[1] for r in rows], pa.string()),
                "op": pa.array([r[2] for r in rows], pa.string()),
                "op_ts": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
        p = os.path.join(src, f"b{i:03d}.parquet")
        pq.write_table(tbl, p)
        t = _time.time() + i
        os.utime(p, (t, t))

    table = str(tmp_path / "snap")
    stream = (
        spark.readStream.schema(
            "k long, val string, op string, op_ts double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def sink(batch_df, _bid):
        if batch_df.isEmpty():
            return
        prev = (
            read_versioned(spark, table)
            if latest_version(table)
            else None
        )
        nxt = apply_changes_batch(prev, batch_df, ["k"])
        write_versioned(nxt, table, mode="overwrite")

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def snap(v=None):
        return sorted(
            (r["k"], r["val"])
            for r in read_versioned(spark, table, v).collect()
        )

    assert latest_version(table) == 3
    assert snap(1) == [(1, "a"), (2, "b")]
    assert snap(2) == [(1, "a2"), (2, "b"), (3, "c")]
    assert snap() == [(1, "a2"), (3, "c")]  # delete applied
    # batch 3 was "bad": roll back to the v2 state, audit preserved
    rollback(table, 2)
    assert snap() == [(1, "a2"), (2, "b"), (3, "c")]
    assert snap(3) == [(1, "a2"), (3, "c")]
    assert history(table)[-1]["operation"] == "rollback:2"


def test_optimize_compacts_and_preserves_rows(spark, tmp_path):
    """OPTIMIZE rewrites an append-fragmented table into one data dir
    as a NEW version with identical rows; pre-optimize versions stay
    time-travelable; vacuum then reclaims the fragments."""
    from cdc_2025_spark.versioned import optimize_versioned

    t = str(tmp_path / "tbl")
    for i in range(5):
        write_versioned(
            _mk(spark, [(i * 10 + j, f"v{i}") for j in range(4)]),
            t,
            mode="append" if i else "overwrite",
        )
    before = _rows(read_versioned(spark, t))
    assert len(history(t)[-1]["data_dirs"]) == 5  # fragmented
    v = optimize_versioned(spark, t, target_file_mb=128)
    assert v == 6
    m = history(t)[-1]
    assert m["operation"] == "optimize"
    assert len(m["data_dirs"]) == 1
    assert _rows(read_versioned(spark, t)) == before
    assert _rows(read_versioned(spark, t, 5)) == before  # time travel
    out = vacuum(t, keep_last=1, retention_hours=0)
    assert out["data_dirs_removed"] == 5
    assert _rows(read_versioned(spark, t)) == before


def test_optimize_zorder_files_cluster(spark, tmp_path):
    """OPTIMIZE ZORDER lays the rewrite out in Morton order: the
    operation is recorded in the manifest and rows are preserved."""
    from cdc_2025_spark.versioned import optimize_versioned

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, (i * 37) % 100, float(i % 50)) for i in range(2000)],
        "id long, a long, b double",
    )
    write_versioned(df, t)
    v = optimize_versioned(spark, t, zorder_cols=["a", "b"])
    m = history(t)[-1]
    assert v == 2 and m["operation"] == "optimize:zorder:a,b"
    assert _rows(read_versioned(spark, t)) == _rows(df)


def test_diff_versions_classifies_churn(spark, tmp_path):
    """diff_versions reports exactly the added/removed/changed keys
    between two snapshots (unchanged keys absent), including NULL
    keys through the null-safe join."""
    from cdc_2025_spark.versioned import diff_versions

    t = str(tmp_path / "tbl")
    a = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "n")],
        "id long, v string",
    )
    b = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d"), (None, "n")],
        "id long, v string",
    )
    write_versioned(a, t)
    write_versioned(b, t, mode="overwrite")
    got = {
        (r["id"], r["change"])
        for r in diff_versions(spark, t, 1, 2, ["id"]).collect()
    }
    assert got == {(2, "changed"), (3, "removed"), (4, "added")}


def test_data_skipping_prunes_dirs_and_stays_exact(spark, tmp_path):
    """Manifest-level data skipping: each append commit records its
    dir's parquet-footer min/max; a predicated read plans a scan
    over ONLY the dirs that can match (pinned via the pruning
    helper and via the scanned-paths plan), and returns exactly the
    filtered snapshot."""
    from pyspark.sql import functions as F

    from cdc_2025_spark.versioned import _dir_may_match

    t = str(tmp_path / "tbl")
    # three appends with DISJOINT key ranges, like daily ingests
    for lo in (0, 100, 200):
        df = spark.createDataFrame(
            [(lo + i, f"s{lo + i}") for i in range(50)],
            "id long, v string",
        )
        write_versioned(df, t, mode="append" if lo else "overwrite")
    m = history(t)[-1]
    stats = m["dir_stats"]
    assert set(stats) == set(m["data_dirs"])
    for d in m["data_dirs"]:
        assert "id" in stats[d] and "v" in stats[d]
    # pruning helper: a point read keeps exactly one dir
    kept = [
        d
        for d in m["data_dirs"]
        if _dir_may_match(stats[d], [("id", "==", 123)])
    ]
    assert len(kept) == 1
    assert stats[kept[0]]["id"] == [100, 149]
    # exactness: predicated read == full read + filter
    got = _rows(read_versioned(spark, t, predicates=[("id", "==", 123)]))
    want = _rows(read_versioned(spark, t).filter(F.col("id") == 123))
    assert got == want == [(123, "s123")]
    # range read across two commits
    got = _rows(
        read_versioned(
            spark, t, predicates=[("id", ">=", 90), ("id", "<", 110)]
        )
    )
    assert got == [(i, f"s{i}") for i in range(100, 110)]
    # string stats prune too
    got = _rows(read_versioned(spark, t, predicates=[("v", "==", "s201")]))
    assert got == [(201, "s201")]
    # an impossible predicate prunes EVERYTHING and returns an
    # empty frame with the pinned schema
    empty = read_versioned(spark, t, predicates=[("id", ">", 10_000)])
    assert empty.count() == 0
    assert empty.schema.simpleString() == m["schema"]


def test_data_skipping_unknown_column_is_safe(spark, tmp_path):
    """A predicate on a column without stats never prunes — the read
    stays correct, just unskipped; unsupported ops refuse."""
    import pytest as _pytest

    from cdc_2025_spark.versioned import _dir_may_match

    assert _dir_may_match({}, [("nope", ">", 1)])
    with _pytest.raises(ValueError, match="unsupported predicate"):
        _dir_may_match({"a": [1, 2]}, [("a", "!=", 1)])
    with _pytest.raises(ValueError, match="number or string"):
        _dir_may_match({"a": [1, 2]}, [("a", "==", [1])])
    # type-mismatched predicate vs stats: kept, then filtered exact
    t = str(tmp_path / "tbl")
    write_versioned(
        spark.createDataFrame([(1, "a")], "id long, v string"), t
    )
    # string predicate on a long column: stats never prune on a
    # type mismatch, and Spark's OWN comparison semantics decide
    # (ANSI coerces '1' to bigint -> the row matches) — skipping
    # must never change what the filter would have returned
    assert (
        read_versioned(spark, t, predicates=[("id", "==", "1")]).count()
        == 1
    )


def test_data_skipping_survives_rollback_and_optimize(spark, tmp_path):
    """Stats ride along rollback (copied from the restored manifest)
    and optimize (recomputed for the compacted dir)."""
    from cdc_2025_spark.versioned import optimize_versioned

    t = str(tmp_path / "tbl")
    for lo in (0, 100):
        write_versioned(
            spark.createDataFrame(
                [(lo + i,) for i in range(20)], "id long"
            ),
            t,
            mode="append" if lo else "overwrite",
        )
    rollback(t, 1)
    m = history(t)[-1]
    assert set(m["dir_stats"]) == set(m["data_dirs"])
    assert _rows(
        read_versioned(spark, t, predicates=[("id", "<", 5)])
    ) == [(i,) for i in range(5)]
    write_versioned(
        spark.createDataFrame([(100 + i,) for i in range(20)], "id long"),
        t,
        mode="append",
    )
    v = optimize_versioned(spark, t)
    m = history(t)[-1]
    assert m["version"] == v and len(m["data_dirs"]) == 1
    d = m["data_dirs"][0]
    assert m["dir_stats"][d]["id"] == [0, 119]
    assert (
        read_versioned(spark, t, predicates=[("id", "==", 7)]).count()
        == 1
    )


def test_schema_evolution_additive_and_time_travel(spark, tmp_path):
    """merge_schema=True appends a NEW column (old rows read NULL —
    the Delta mergeSchema rule), the pinned schema grows, time
    travel to the pre-evolution version shows the old schema, a
    frame MISSING an old column appends fine (reads back NULL), and
    type changes refuse even with the flag."""
    from cdc_2025_spark.versioned import _merge_schemas

    t = str(tmp_path / "tbl")
    write_versioned(_mk(spark, [(1, "a")]), t)
    evolved = spark.createDataFrame(
        [(2, "b", 3.5)], "id long, v string, score double"
    )
    with pytest.raises(ValueError, match="merge_schema=True"):
        write_versioned(evolved, t, mode="append")
    write_versioned(evolved, t, mode="append", merge_schema=True)
    got = {
        r["id"]: (r["v"], r["score"])
        for r in read_versioned(spark, t).collect()
    }
    assert got == {1: ("a", None), 2: ("b", 3.5)}
    assert history(t)[-1]["schema"] == (
        "struct<id:bigint,v:string,score:double>"
    )
    assert history(t)[-1]["schema_evolved"] is True
    # time travel: v1 keeps its original two-column shape
    assert read_versioned(spark, t, 1).columns == ["id", "v"]
    # a later frame MISSING an old column still appends; the missing
    # column reads back NULL for its rows
    write_versioned(
        spark.createDataFrame([(3, 9.9)], "id long, score double"),
        t,
        mode="append",
        merge_schema=True,
    )
    rows = {
        r["id"]: (r["v"], r["score"])
        for r in read_versioned(spark, t).collect()
    }
    assert rows[3] == (None, 9.9)
    # type change refuses even with the flag
    bad = spark.createDataFrame([(4, 1)], "id long, v long")
    with pytest.raises(ValueError, match="ADDITIVE only"):
        write_versioned(bad, t, mode="append", merge_schema=True)
    # the pure helper agrees
    with pytest.raises(ValueError, match="ADDITIVE only"):
        _merge_schemas("struct<a:bigint>", "struct<a:string>")
    # overwrite with a new schema needs the explicit flag; with it,
    # the schema re-pins and the evolved flag clears
    repin = spark.createDataFrame([(1.5,)], "x double")
    with pytest.raises(ValueError, match="merge_schema=True"):
        write_versioned(repin, t, mode="overwrite")
    write_versioned(repin, t, mode="overwrite", merge_schema=True)
    m = history(t)[-1]
    assert m["schema"] == "struct<x:double>"
    assert m["schema_evolved"] is False
    assert _rows(read_versioned(spark, t)) == [(1.5,)]


def test_version_as_of_timestamp(spark, tmp_path):
    """Timestamp time travel resolves to the highest version
    committed at or before ts (Delta's timestampAsOf rule)."""
    import json as _json
    import os as _os

    from cdc_2025_spark.versioned import version_as_of

    t = str(tmp_path / "tbl")
    write_versioned(_mk(spark, [(1, "a")]), t)
    write_versioned(_mk(spark, [(2, "b")]), t, mode="append")
    write_versioned(_mk(spark, [(3, "c")]), t, mode="append")
    # pin deterministic commit times into the manifests
    for v, ts in ((1, 1000.0), (2, 2000.0), (3, 3000.0)):
        mp = _os.path.join(t, "_manifests", f"v{v:08d}.json")
        m = _json.load(open(mp))
        m["committed_at"] = ts
        tmp = mp + ".rewrite"
        with open(tmp, "w") as f:
            _json.dump(m, f)
        _os.replace(tmp, mp)
    with pytest.raises(ValueError, match="no version"):
        version_as_of(t, 999.0)
    assert version_as_of(t, 1000.0) == 1
    assert version_as_of(t, 2500.0) == 2
    assert version_as_of(t, 9e9) == 3
    assert _rows(
        read_versioned(spark, t, version_as_of(t, 2500.0))
    ) == [(1, "a"), (2, "b")]


def test_rollback_after_evolution_keeps_evolved_columns(spark, tmp_path):
    """ADVICE r13 (high): rolling back TO an evolved snapshot must
    read all its columns. Reads are pinned to the manifest schema
    (never footer sampling), and the rollback manifest carries the
    schema_evolved marker so subsequent appends stay truthful."""
    t = str(tmp_path / "tbl")
    write_versioned(_mk(spark, [(1, "a")]), t)
    write_versioned(
        spark.createDataFrame(
            [(2, "b", 3.5)], "id long, v string, score double"
        ),
        t,
        mode="append",
        merge_schema=True,
    )  # v2, evolved
    write_versioned(_mk(spark, [(9, "z")]), t, mode="overwrite",
                    merge_schema=True)  # v3: bad overwrite to undo
    v4 = rollback(t, 2)
    got = read_versioned(spark, t)
    assert got.columns == ["id", "v", "score"]
    rows = {r["id"]: (r["v"], r["score"]) for r in got.collect()}
    assert rows == {1: ("a", None), 2: ("b", 3.5)}
    assert history(t)[-1]["schema_evolved"] is True
    # appends on top of the rollback keep reading the evolved shape
    write_versioned(
        spark.createDataFrame(
            [(3, "c", 7.0)], "id long, v string, score double"
        ),
        t,
        mode="append",
    )
    rows = {
        r["id"]: (r["v"], r["score"])
        for r in read_versioned(spark, t).collect()
    }
    assert rows == {1: ("a", None), 2: ("b", 3.5), 3: ("c", 7.0)}
    assert v4 == 4


def test_predicate_on_evolved_column_prunes_safely(spark, tmp_path):
    """ADVICE r13 (medium): a predicate on an evolved column must
    never raise UNRESOLVED_COLUMN when stats-pruning leaves only
    pre-evolution dirs — the manifest schema makes the column NULL
    there, so the filtered frame (possibly empty) comes back."""
    t = str(tmp_path / "tbl")
    write_versioned(
        spark.createDataFrame([(1, 10)], "a long, b long"), t
    )
    write_versioned(
        spark.createDataFrame([(2, 20, 5)], "a long, b long, c long"),
        t,
        mode="append",
        merge_schema=True,
    )
    # c > 100 excludes the evolved dir by stats; only the dir LACKING
    # column c survives pruning — pre-fix this raised AnalysisException
    got = read_versioned(spark, t, predicates=[("c", ">", 100)])
    assert got.columns == ["a", "b", "c"]
    assert got.count() == 0
    # and a satisfiable evolved-column predicate returns the row
    got2 = read_versioned(spark, t, predicates=[("c", ">", 1)])
    assert _rows(got2) == [(2, 20, 5)]


def test_version_as_of_clamps_nonmonotone_timestamps(spark, tmp_path):
    """ADVICE r13 (low): a CAS-retried/clock-skewed commit can land a
    higher version with an EARLIER wall clock; effective timestamps
    are clamped to max(own, parent's) — Delta's monotonic adjustment
    — so timestamp resolution agrees with version order."""
    from cdc_2025_spark.versioned import version_as_of

    t = str(tmp_path / "tbl")
    for i in range(3):
        write_versioned(
            _mk(spark, [(i, "x")]), t, mode="append" if i else "overwrite"
        )
    # v2 committed with a LATER clock than v3 (skew)
    for v, ts in ((1, 1000.0), (2, 2000.0), (3, 1500.0)):
        mp = os.path.join(t, "_manifests", f"v{v:08d}.json")
        m = json.load(open(mp))
        m["committed_at"] = ts
        tmp = mp + ".rewrite"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, mp)
    # v3's effective ts clamps to 2000.0 (= v2's), so ts=2000 must
    # resolve to the HIGHEST version at that instant, and no ts may
    # resolve versions out of order
    assert version_as_of(t, 1999.0) == 1
    assert version_as_of(t, 2000.0) == 3
    assert version_as_of(t, 9e9) == 3


def _bal_table(spark, tmp_path):
    """Three banded snapshots of (id, bal): ids 0-9 / 10-19 / 20-29
    with bal = id * 10.0 — disjoint id ranges so stats pruning has
    something to prove."""
    t = str(tmp_path / "tbl")
    for lo in (0, 10, 20):
        df = spark.createDataFrame(
            [(i, i * 10.0) for i in range(lo, lo + 10)],
            "id long, bal double",
        )
        write_versioned(
            df, t, mode="append" if lo else "overwrite"
        )
    return t


def test_delete_versioned_dir_level_cow(spark, tmp_path):
    """DELETE rewrites ONLY the dirs whose stats may match: ids
    12-17 live in the middle band, so the first and last dirs are
    carried over verbatim (same dir names in the new manifest), the
    matching rows are gone, history still has them."""
    from cdc_2025_spark.versioned import delete_versioned

    t = _bal_table(spark, tmp_path)
    before = history(t)[-1]
    out = delete_versioned(
        spark, t, [("id", ">=", 12), ("id", "<=", 17)]
    )
    assert out["rows_changed"] == 6
    assert out["dirs_rewritten"] == 1
    assert out["dirs_kept"] == 2
    after = history(t)[-1]
    assert after["operation"].startswith("delete:")
    assert after["n_rows"] == 24
    # untouched dirs carried verbatim
    kept = set(before["data_dirs"]) & set(after["data_dirs"])
    assert len(kept) == 2
    got = sorted(
        r["id"] for r in read_versioned(spark, t).collect()
    )
    assert got == [i for i in range(30) if not 12 <= i <= 17]
    # time travel: the pre-delete snapshot still holds all 30
    assert read_versioned(spark, t, 3).count() == 30
    # stats pruning still works on the rewritten table
    one = read_versioned(spark, t, predicates=[("id", "==", 5)])
    assert [r["id"] for r in one.collect()] == [5]


def test_delete_versioned_emptying_dir_leaves_no_orphan(
    spark, tmp_path
):
    """A DELETE that empties EVERY touched dir must not leave an
    unreferenced parquet dir on disk waiting for the vacuum sweep
    (r15 ADVICE): the survivor write is cleaned up immediately when
    it counts 0 rows, and the new manifest references only the kept
    dirs."""
    from cdc_2025_spark.versioned import delete_versioned

    t = _bal_table(spark, tmp_path)
    out = delete_versioned(
        spark, t, [("id", ">=", 10), ("id", "<=", 19)]
    )
    assert out["rows_changed"] == 10
    assert out["dirs_rewritten"] == 1
    assert out["dirs_kept"] == 2
    after = history(t)[-1]
    assert after["n_rows"] == 20
    assert len(after["data_dirs"]) == 2
    # every dir on disk is referenced by SOME manifest version
    referenced = set()
    for m in history(t):
        referenced.update(m["data_dirs"])
    on_disk = {
        f"data/{d}" for d in os.listdir(os.path.join(t, "data"))
    }
    assert on_disk <= referenced, (
        f"orphan data dirs: {sorted(on_disk - referenced)}"
    )
    got = sorted(
        r["id"] for r in read_versioned(spark, t).collect()
    )
    assert got == [i for i in range(30) if not 10 <= i <= 19]


def test_delete_versioned_noop_when_stats_conservative(
    spark, tmp_path
):
    """A predicate that touches a dir by stats but matches no actual
    row must be a NO-OP (no new version, no rows lost) — the
    survivors-rewrite bug trap."""
    from cdc_2025_spark.versioned import delete_versioned

    t = _bal_table(spark, tmp_path)
    # bal = id * 10, so (id >= 14) & (bal < 100) is impossible but
    # the conjunctive min/max check cannot see cross-column logic
    out = delete_versioned(
        spark, t, [("id", ">=", 14), ("bal", "<", 100.0)]
    )
    assert out["rows_changed"] == 0
    assert latest_version(t) == 3
    assert read_versioned(spark, t).count() == 30


def test_delete_versioned_null_predicate_rows_kept(spark, tmp_path):
    """Rows where the predicate evaluates NULL are KEPT (the SQL
    DELETE rule), not silently dropped by Spark's filter."""
    from cdc_2025_spark.versioned import delete_versioned

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 50.0)], "id long, bal double"
    )
    write_versioned(df, t)
    out = delete_versioned(spark, t, [("bal", ">", 10.0)])
    assert out["rows_changed"] == 1
    got = sorted(
        (r["id"], r["bal"])
        for r in read_versioned(spark, t).collect()
    )
    assert got == [(1, 5.0), (2, None)]


def test_update_versioned_dir_level_cow(spark, tmp_path):
    """UPDATE applies SQL set-expressions to matching rows only,
    keeps the pinned schema (expr cast back), carries untouched dirs
    verbatim, and leaves NULL-predicate rows unchanged."""
    from cdc_2025_spark.versioned import update_versioned

    t = _bal_table(spark, tmp_path)
    before = history(t)[-1]
    out = update_versioned(
        spark,
        t,
        {"bal": "bal + 1000"},
        [("id", ">=", 25)],
    )
    assert out["rows_changed"] == 5
    assert out["dirs_rewritten"] == 1
    assert out["dirs_kept"] == 2
    after = history(t)[-1]
    assert after["operation"].startswith("update:")
    assert after["n_rows"] == 30
    assert len(
        set(before["data_dirs"]) & set(after["data_dirs"])
    ) == 2
    got = {
        r["id"]: r["bal"]
        for r in read_versioned(spark, t).collect()
    }
    for i in range(30):
        assert got[i] == i * 10.0 + (1000.0 if i >= 25 else 0.0)
    # schema stays pinned
    assert after["schema"] == before["schema"]
    # unknown set column refuses
    with pytest.raises(ValueError, match="unknown columns"):
        update_versioned(
            spark, t, {"nope": "1"}, [("id", ">=", 0)]
        )


def test_update_versioned_stats_refresh(spark, tmp_path):
    """The rewritten dir's stats reflect the UPDATED values, so
    subsequent predicate reads prune correctly against them."""
    from cdc_2025_spark.versioned import update_versioned

    t = _bal_table(spark, tmp_path)
    update_versioned(
        spark, t, {"bal": "bal * 0"}, [("id", ">=", 20)]
    )
    # every surviving bal >= 200 is gone; a stats-pruned read agrees
    got = read_versioned(
        spark, t, predicates=[("bal", ">=", 200.0)]
    )
    assert got.count() == 0
    m = history(t)[-1]
    new_dir = [
        d for d in m["data_dirs"] if d in m["dir_stats"]
        and m["dir_stats"][d].get("bal") == [0.0, 0.0]
    ]
    assert new_dir, m["dir_stats"]


def test_merge_versioned_upsert_dir_level_cow(spark, tmp_path):
    """MERGE replaces matched keys with source rows, inserts the
    rest, rewrites only the dirs whose key stats intersect the
    source's key box, and preserves history."""
    from cdc_2025_spark.versioned import merge_versioned

    t = _bal_table(spark, tmp_path)  # ids 0-29 in three band dirs
    before = history(t)[-1]
    src = spark.createDataFrame(
        [(12, -1.0), (17, -2.0), (31, 310.0)], "id long, bal double"
    )
    out = merge_versioned(spark, t, src, ["id"])
    assert out["rows_matched"] == 2
    assert out["rows_inserted"] == 1
    # source key box [12, 31] intersects the middle and top band
    # dirs; the 0-9 dir is carried verbatim
    assert out["dirs_rewritten"] == 2
    assert out["dirs_kept"] == 1
    after = history(t)[-1]
    assert after["operation"] == "merge:['id']"
    assert after["n_rows"] == 31
    assert len(
        set(before["data_dirs"]) & set(after["data_dirs"])
    ) == 1
    got = {
        r["id"]: r["bal"]
        for r in read_versioned(spark, t).collect()
    }
    assert got[12] == -1.0 and got[17] == -2.0 and got[31] == 310.0
    assert got[5] == 50.0 and got[25] == 250.0
    assert len(got) == 31
    # pre-merge snapshot untouched
    assert read_versioned(spark, t, 3).count() == 30


def test_merge_versioned_insert_only_appends(spark, tmp_path):
    """A source whose key box misses every dir appends without
    rewriting anything."""
    from cdc_2025_spark.versioned import merge_versioned

    t = _bal_table(spark, tmp_path)
    src = spark.createDataFrame(
        [(100, 1.0), (101, 2.0)], "id long, bal double"
    )
    out = merge_versioned(spark, t, src, ["id"])
    assert out["rows_matched"] == 0
    assert out["rows_inserted"] == 2
    assert out["dirs_rewritten"] == 0
    assert out["dirs_kept"] == 3
    assert read_versioned(spark, t).count() == 32


def test_merge_versioned_refusals(spark, tmp_path):
    """Duplicate source keys and schema drift refuse loudly."""
    from cdc_2025_spark.versioned import merge_versioned

    t = _bal_table(spark, tmp_path)
    dup = spark.createDataFrame(
        [(1, 1.0), (1, 2.0)], "id long, bal double"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_versioned(spark, t, dup, ["id"])
    drift = spark.createDataFrame([(1, "x")], "id long, bal string")
    with pytest.raises(ValueError, match="pinned schema"):
        merge_versioned(spark, t, drift, ["id"])
    with pytest.raises(ValueError, match="key columns"):
        merge_versioned(spark, t, dup.limit(1), [])


def test_check_constraints_enforced_everywhere(spark, tmp_path):
    """Delta-style CHECK constraints: existing data validated at ADD
    time, every write path refuses violating rows (append, update,
    merge), NULL evaluates as pass (the SQL rule), constraints ride
    rollback/optimize commits, and DROP lifts the gate."""
    from cdc_2025_spark.versioned import (
        add_constraint,
        drop_constraint,
        merge_versioned,
        optimize_versioned,
        update_versioned,
    )

    t = _bal_table(spark, tmp_path)  # bal = id * 10, ids 0..29
    v = add_constraint(spark, t, "bal_nonneg", "bal >= 0")
    assert history(t)[-1]["operation"] == "add_constraint:bal_nonneg"
    assert history(t)[-1]["constraints"] == {"bal_nonneg": "bal >= 0"}
    assert v == 4
    # adding a constraint the existing data violates refuses
    with pytest.raises(ValueError, match="violated by 30"):
        add_constraint(spark, t, "impossible", "bal < 0")
    # append of a violating frame refuses; a complying one commits
    bad = spark.createDataFrame([(99, -5.0)], "id long, bal double")
    with pytest.raises(ValueError, match="bal_nonneg"):
        write_versioned(bad, t, mode="append")
    write_versioned(
        spark.createDataFrame([(99, 5.0)], "id long, bal double"),
        t,
        mode="append",
    )
    # NULL passes (SQL CHECK: only FALSE violates)
    write_versioned(
        spark.createDataFrame([(98, None)], "id long, bal double"),
        t,
        mode="append",
    )
    # UPDATE that would push rows below zero refuses
    with pytest.raises(ValueError, match="bal_nonneg"):
        update_versioned(
            spark, t, {"bal": "bal - 1000"}, [("id", "<", 10)]
        )
    # MERGE with a violating source refuses
    with pytest.raises(ValueError, match="MERGE source"):
        merge_versioned(
            spark,
            t,
            spark.createDataFrame(
                [(1, -1.0)], "id long, bal double"
            ),
            ["id"],
        )
    # constraints ride rollback and optimize commits
    rollback(t, 4)
    assert history(t)[-1]["constraints"] == {"bal_nonneg": "bal >= 0"}
    optimize_versioned(spark, t)
    assert history(t)[-1]["constraints"] == {"bal_nonneg": "bal >= 0"}
    # DROP lifts the gate
    drop_constraint(t, "bal_nonneg")
    write_versioned(bad, t, mode="append")
    with pytest.raises(ValueError, match="no constraint"):
        drop_constraint(t, "bal_nonneg")
    with pytest.raises(ValueError, match="already exists"):
        add_constraint(spark, t, "x", "bal IS NOT NULL OR bal IS NULL")
        add_constraint(spark, t, "x", "TRUE")


def test_dml_sequence_matches_python_model(spark, tmp_path):
    """Property-style sequence test for the DML layer: a mixed
    deterministic program of append / delete / update / merge ops
    against a dict model — after every op, read_versioned equals the
    model exactly, n_rows accounting agrees, and history grows only
    on ops that changed something."""
    from cdc_2025_spark.versioned import (
        delete_versioned,
        merge_versioned,
        update_versioned,
    )

    t = str(tmp_path / "tbl")
    model: dict[int, float] = {}

    def mk(rows):
        return spark.createDataFrame(rows, "id long, bal double")

    def check():
        got = sorted(
            (r["id"], r["bal"])
            for r in read_versioned(spark, t).collect()
        )
        assert got == sorted(model.items())
        assert history(t)[-1]["n_rows"] == len(model)

    # deterministic mixed program (LCG-driven op choice)
    x = 42

    def lcg(n):
        nonlocal x
        x = (1103515245 * x + 12345) % (1 << 31)
        return x % n

    write_versioned(mk([(i, float(i)) for i in range(20)]), t)
    model = {i: float(i) for i in range(20)}
    check()
    for _step in range(12):
        op = lcg(4)
        if op == 0:  # append a fresh band
            base = 100 + lcg(50) * 10
            rows = [(base + j, float(base + j)) for j in range(5)]
            write_versioned(mk(rows), t, mode="append")
            model.update({k: v for k, v in rows})
        elif op == 1:  # range delete
            lo = lcg(120)
            hi = lo + 1 + lcg(30)
            delete_versioned(
                spark, t, [("id", ">=", lo), ("id", "<", hi)]
            )
            model = {
                k: v for k, v in model.items() if not lo <= k < hi
            }
        elif op == 2:  # range update
            lo = lcg(120)
            update_versioned(
                spark,
                t,
                {"bal": "bal * 2 + 1"},
                [("id", ">=", lo), ("id", "<", lo + 25)],
            )
            model = {
                k: (v * 2 + 1 if lo <= k < lo + 25 else v)
                for k, v in model.items()
            }
        else:  # merge: update some existing + insert some new
            keys = sorted(model)
            picked = keys[:: max(1, len(keys) // 3)][:4]
            newk = 500 + lcg(100)
            rows = [(k, -float(k)) for k in picked] + [
                (newk, 0.5)
            ]
            merge_versioned(spark, t, mk(rows), ["id"])
            for k, v in rows:
                model[k] = v
        check()


def test_dml_cas_conflict_retries(spark, tmp_path):
    """A pre-taken version number makes DELETE (the shared
    _cow_rewrite path) lose its first CAS and retry onto the next
    version against the NEW latest — the write_versioned conflict
    rule, inherited."""
    import json as _json
    import os as _os

    from cdc_2025_spark.versioned import delete_versioned

    t = _bal_table(spark, tmp_path)
    # squat on version 4 with a manifest identical to v3 (a
    # concurrent metadata writer's commit)
    m3 = history(t)[-1]
    squat = dict(m3, version=4, parent=3, operation="squat")
    with open(_os.path.join(t, "_manifests", "v00000004.json"), "w") as f:
        _json.dump(squat, f)
    out = delete_versioned(
        spark, t, [("id", ">=", 25), ("id", "<", 28)]
    )
    assert out["version"] == 5  # lost v4, won v5
    assert out["rows_changed"] == 3
    got = sorted(
        r["id"] for r in read_versioned(spark, t).collect()
    )
    assert got == [i for i in range(30) if not 25 <= i < 28]


def test_txn_idempotent_writes_and_merge(spark, tmp_path):
    """Delta's txnAppId/txnVersion: a replayed (app, batch) write or
    merge is SKIPPED (no new version, no duplicate rows) — the
    exactly-once contract a Structured Streaming foreachBatch sink
    needs under microbatch replay; txn watermarks ride optimize and
    rollback commits."""
    from cdc_2025_spark.versioned import (
        merge_versioned,
        optimize_versioned,
    )

    t = str(tmp_path / "tbl")
    write_versioned(_mk(spark, [(1, "a")]), t)
    b0 = _mk(spark, [(2, "b")])
    v = write_versioned(b0, t, mode="append", txn=("q1", 0))
    assert v == 2
    # exact replay: skipped, version unchanged, rows unchanged
    assert write_versioned(b0, t, mode="append", txn=("q1", 0)) == 2
    assert read_versioned(spark, t).count() == 2
    # an OLDER txn version is also skipped; a newer one commits
    assert (
        write_versioned(
            _mk(spark, [(9, "x")]), t, mode="append", txn=("q1", -1)
        )
        == 2
    )
    v = write_versioned(
        _mk(spark, [(3, "c")]), t, mode="append", txn=("q1", 1)
    )
    assert v == 3 and read_versioned(spark, t).count() == 3
    # independent apps do not interfere
    v = write_versioned(
        _mk(spark, [(4, "d")]), t, mode="append", txn=("q2", 0)
    )
    assert v == 4
    assert history(t)[-1]["txns"] == {"q1": 1, "q2": 0}
    # merge honors the same watermark
    src = _mk(spark, [(1, "a9"), (5, "e")])
    out = merge_versioned(spark, t, src, ["id"], txn=("q1", 1))
    assert out.get("skipped_txn") is True
    assert read_versioned(spark, t).count() == 4
    out = merge_versioned(spark, t, src, ["id"], txn=("q1", 2))
    assert out["rows_matched"] == 1 and out["rows_inserted"] == 1
    assert history(t)[-1]["txns"] == {"q1": 2, "q2": 0}
    # watermarks ride optimize and rollback
    optimize_versioned(spark, t)
    assert history(t)[-1]["txns"] == {"q1": 2, "q2": 0}
    rollback(t, 4)
    assert history(t)[-1]["txns"] == {"q1": 1, "q2": 0}
    # after rollback, the rolled-back txn watermark governs again
    v = write_versioned(
        _mk(spark, [(6, "f")]), t, mode="append", txn=("q1", 2)
    )
    assert history(t)[-1]["txns"]["q1"] == 2
