"""Incremental view maintenance (functions/ivm.py): after ANY
sequence of insert/update/delete delta batches, the maintained state
must equal a full recompute over the surviving fact rows — counts
integer-exact, moments within retraction-drift tolerance. Plus the
streaming form: foreachBatch microbatches maintaining the same view."""

from __future__ import annotations

import pytest

from cdc_2025_spark.functions.ivm import (
    agg_state,
    apply_delta,
    readout,
)

KEYS = ["grp"]


def _facts(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v double")


def _delta(spark, rows):
    return spark.createDataFrame(
        rows, "op string, grp string, old_value double, new_value double"
    )


def _collect_state(state):
    return {
        r["grp"]: (r["ivm_n"], r["ivm_sum"], r["ivm_sumsq"])
        for r in state.collect()
    }


def test_delta_sequence_equals_recompute(spark):
    """Python fact-table model mutated alongside: after three mixed
    batches the state equals agg_state over the surviving rows."""
    facts = {  # id -> (grp, v)
        1: ("a", 10.0), 2: ("a", 20.0), 3: ("b", 5.0), 4: ("b", 7.0),
        5: ("c", 1.0),
    }
    state = agg_state(
        _facts(spark, [(i, g, v) for i, (g, v) in facts.items()]),
        KEYS,
        "v",
    )
    batches = [
        # insert into a, update 3's value, delete 5 (kills group c)
        [("I", "a", None, 30.0), ("U", "b", 5.0, 6.0),
         ("D", "c", 1.0, None)],
        # delete both b rows (kills b), insert new group d
        [("D", "b", 6.0, None), ("D", "b", 7.0, None),
         ("I", "d", None, 100.0)],
        # re-insert into c after it died, update an a row
        [("I", "c", None, 2.0), ("U", "a", 10.0, 11.0)],
    ]
    model = dict(facts)
    mutations = [
        lambda m: (m.__setitem__(6, ("a", 30.0)),
                   m.__setitem__(3, ("b", 6.0)), m.pop(5)),
        lambda m: (m.pop(3), m.pop(4), m.__setitem__(7, ("d", 100.0))),
        lambda m: (m.__setitem__(8, ("c", 2.0)),
                   m.__setitem__(1, ("a", 11.0))),
    ]
    for batch, mutate in zip(batches, mutations):
        state = apply_delta(state, _delta(spark, batch), KEYS)
        mutate(model)
        want = _collect_state(
            agg_state(
                _facts(
                    spark, [(i, g, v) for i, (g, v) in model.items()]
                ),
                KEYS,
                "v",
            )
        )
        got = _collect_state(state)
        assert set(got) == set(want)
        for g in want:
            assert got[g][0] == want[g][0], g  # counts exact
            assert got[g][1] == pytest.approx(want[g][1], abs=1e-9)
            assert got[g][2] == pytest.approx(want[g][2], abs=1e-9)


def test_zero_count_groups_leave_the_state(spark):
    state = agg_state(_facts(spark, [(1, "x", 4.0)]), KEYS, "v")
    state = apply_delta(
        state, _delta(spark, [("D", "x", 4.0, None)]), KEYS
    )
    assert state.count() == 0
    # re-insert recreates cleanly
    state = apply_delta(
        state, _delta(spark, [("I", "x", None, 9.0)]), KEYS
    )
    assert _collect_state(state) == {"x": (1, 9.0, 81.0)}


def test_readout_matches_spark_aggregates(spark):
    rows = [(i, "g" + str(i % 3), float(i * i % 17)) for i in range(60)]
    state = agg_state(_facts(spark, rows), KEYS, "v")
    got = {r["grp"]: r for r in readout(state, KEYS).collect()}
    from pyspark.sql import functions as F

    want = {
        r["grp"]: r
        for r in _facts(spark, rows)
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("total"),
            F.avg("v").alias("mean"),
            F.var_samp("v").alias("var_samp"),
            F.stddev_samp("v").alias("stddev_samp"),
        )
        .collect()
    }
    for g, w in want.items():
        r = got[g]
        assert r["n"] == w["n"]
        for c in ("total", "mean", "var_samp", "stddev_samp"):
            assert r[c] == pytest.approx(w[c], rel=1e-9), (g, c)


def test_malformed_op_refused(spark):
    state = agg_state(_facts(spark, [(1, "x", 4.0)]), KEYS, "v")
    with pytest.raises(ValueError, match="op not in"):
        apply_delta(
            state, _delta(spark, [("Z", "x", None, 1.0)]), KEYS
        )


def test_null_values_contribute_nothing(spark):
    state = agg_state(_facts(spark, [(1, "x", 4.0)]), KEYS, "v")
    # insert of NULL: no contribution; update NULL->value: pure add;
    # update value->NULL: pure retract
    state = apply_delta(
        state,
        _delta(
            spark,
            [
                ("I", "x", None, None),
                ("U", "x", None, 6.0),
                ("U", "x", 4.0, None),
            ],
        ),
        KEYS,
    )
    assert _collect_state(state) == {"x": (1, 6.0, 36.0)}


def test_streaming_foreachbatch_maintains_view(spark, tmp_path):
    """The same kernel under Structured Streaming: each file
    microbatch is a delta; the final state equals the batch chain."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "deltas")
    os.makedirs(src)
    batches = [
        [("I", "a", None, 1.0), ("I", "a", None, 3.0)],
        [("U", "a", 1.0, 5.0), ("I", "b", None, 2.0)],
        [("D", "a", 3.0, None)],
    ]
    for i, rows in enumerate(batches):
        tbl = pa.table(
            {
                "op": pa.array([r[0] for r in rows]),
                "grp": pa.array([r[1] for r in rows]),
                "old_value": pa.array(
                    [r[2] for r in rows], pa.float64()
                ),
                "new_value": pa.array(
                    [r[3] for r in rows], pa.float64()
                ),
            }
        )
        path = os.path.join(src, f"b{i:03d}.parquet")
        pq.write_table(tbl, path)
        t = time.time() + i
        os.utime(path, (t, t))
    holder = {"state": agg_state(_facts(spark, []), KEYS, "v")}

    def on_batch(df, _bid):
        if df.count():
            holder["state"] = apply_delta(state=holder["state"],
                                          delta=df, keys=KEYS)
            # pin the lineage so state survives across batches
            holder["state"] = holder["state"].localCheckpoint()

    stream = (
        spark.readStream.schema(
            "op string, grp string, old_value double, new_value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_ivm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _collect_state(holder["state"])
    assert got == {"a": (1, 5.0, 25.0), "b": (1, 2.0, 4.0)}


def test_null_group_key_merges_as_one_group(spark):
    """groupBy keeps NULL keys as one group, so the state merge must
    be null-safe: state + delta contributions for the NULL group
    fold into ONE row (a plain equi-join would leave two)."""
    state = agg_state(
        spark.createDataFrame(
            [(1, None, 10.0), (2, None, 50.0)],
            "id long, grp string, v double",
        ),
        KEYS,
        "v",
    )
    state = apply_delta(
        state, _delta(spark, [("I", None, None, 5.0)]), KEYS
    )
    rows = state.collect()
    assert len(rows) == 1
    assert rows[0]["grp"] is None
    assert (rows[0]["ivm_n"], rows[0]["ivm_sum"]) == (3, 65.0)


def test_over_retraction_raises(spark):
    """A delta that retracts rows never present in the state (merged
    ivm_n < 0) must fail loud at evaluation, not silently diverge
    from recompute — same posture as the bad-op refusal."""
    from pyspark.errors import PySparkRuntimeError
    from py4j.protocol import Py4JJavaError

    state = agg_state(_facts(spark, [(1, "a", 10.0)]), KEYS, "v")
    # two deletes against a group holding one row
    delta = _delta(
        spark, [("D", "a", 10.0, None), ("D", "a", 10.0, None)]
    )
    out = apply_delta(state, delta, KEYS)
    with pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception)) as ei:
        out.collect()
    assert "over-retraction" in str(ei.value)


def test_retraction_to_exact_zero_still_drops_group(spark):
    """The tripwire must not fire on the legal boundary: retracting a
    group to exactly n == 0 drops it (no error, no 0/0 row)."""
    state = agg_state(_facts(spark, [(1, "a", 10.0)]), KEYS, "v")
    delta = _delta(spark, [("D", "a", 10.0, None)])
    assert apply_delta(state, delta, KEYS).collect() == []
