"""MERGE INTO semantics: every clause combination on literal frames,
the Delta cardinality error, and a property test against a pure-python
merge model."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc_2025_spark.merge import merge_into


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )


def _source(spark, rows):
    return spark.createDataFrame(rows, "k long, amt double")


def test_all_four_paths(spark):
    # k=1 matched+update, k=2 matched+delete, k=3 target-only,
    # k=9 source-only insert
    out = merge_into(
        _target(spark),
        _source(spark, [(1, 5.0), (2, 99.0), (9, 7.0)]),
        on=["k"],
        update_set={"bal": F.col("t_bal") + F.col("s_amt")},
        delete_condition=F.col("s_amt") > 50,
        insert_values={
            "name": F.lit("new"),
            "bal": F.col("s_amt"),
        },
    )
    got = sorted(map(tuple, out.collect()))
    assert got == [
        (1, "a", 15.0),   # updated
        (3, "c", 30.0),   # untouched
        (9, "new", 7.0),  # inserted
    ]  # k=2 deleted


def test_update_condition_gates_set_clause(spark):
    out = merge_into(
        _target(spark),
        _source(spark, [(1, 5.0), (2, 6.0)]),
        on=["k"],
        update_set={"bal": F.col("s_amt")},
        update_condition=F.col("t_bal") < 15,  # only k=1 qualifies
    )
    got = {r["k"]: r["bal"] for r in out.collect()}
    assert got == {1: 5.0, 2: 20.0, 3: 30.0}


def test_insert_disabled_and_insert_condition(spark):
    no_ins = merge_into(
        _target(spark),
        _source(spark, [(8, 1.0), (9, 2.0)]),
        on=["k"],
        insert=False,
    )
    assert sorted(r["k"] for r in no_ins.collect()) == [1, 2, 3]
    cond_ins = merge_into(
        _target(spark),
        _source(spark, [(8, 1.0), (9, 2.0)]),
        on=["k"],
        insert_values={"name": F.lit("n"), "bal": F.col("s_amt")},
        insert_condition=F.col("s_amt") > 1.5,  # only k=9
    )
    assert sorted(r["k"] for r in cond_ins.collect()) == [1, 2, 3, 9]


def test_default_update_and_insert_take_source_columns(spark):
    # same-named payload column flows through by default on insert;
    # with no update_set a match leaves the target row unchanged
    t = spark.createDataFrame([(1, 10.0)], "k long, bal double")
    s = spark.createDataFrame([(1, 99.0), (2, 7.0)], "k long, bal double")
    out = merge_into(t, s, on=["k"])
    got = sorted(map(tuple, out.collect()))
    assert got == [(1, 10.0), (2, 7.0)]


def test_multi_match_raises_like_delta(spark):
    with pytest.raises(ValueError, match="multiple source rows"):
        merge_into(
            _target(spark),
            _source(spark, [(1, 5.0), (1, 6.0)]),
            on=["k"],
        )


def test_empty_source_and_empty_target(spark):
    t = _target(spark)
    empty_s = _source(spark, [])
    assert sorted(map(tuple, merge_into(t, empty_s, ["k"]).collect())) == \
        sorted(map(tuple, t.collect()))
    empty_t = spark.createDataFrame([], "k long, name string, bal double")
    out = merge_into(
        empty_t,
        _source(spark, [(5, 2.0)]),
        on=["k"],
        insert_values={"name": F.lit("n"), "bal": F.col("s_amt")},
    )
    assert sorted(map(tuple, out.collect())) == [(5, "n", 2.0)]


_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SETTINGS
@given(
    tgt=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=-50, max_value=50),
        ),
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    src=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=-50, max_value=50),
        ),
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    thresh=st.integers(min_value=-50, max_value=50),
)
def test_merge_matches_python_model(spark, tgt, src, thresh):
    """merge_into vs a sequential python model for arbitrary key
    sets: update adds amt, delete fires when amt >= thresh, inserts
    carry amt."""
    t = spark.createDataFrame(
        [(k, float(v)) for k, v in tgt] or [(None, None)],
        "k long, bal double",
    ).filter(F.col("k").isNotNull())
    s = spark.createDataFrame(
        [(k, float(v)) for k, v in src] or [(None, None)],
        "k long, amt double",
    ).filter(F.col("k").isNotNull())
    out = merge_into(
        t,
        s,
        on=["k"],
        update_set={"bal": F.col("t_bal") + F.col("s_amt")},
        delete_condition=F.col("s_amt") >= float(thresh),
        insert_values={"bal": F.col("s_amt")},
        insert_condition=F.col("s_amt") < float(thresh),
    )
    got = {r["k"]: r["bal"] for r in out.collect()}
    td, sd = dict(tgt), dict(src)
    want = {}
    for k, v in td.items():
        if k in sd:
            if sd[k] >= thresh:
                continue  # deleted
            want[k] = float(v + sd[k])
        else:
            want[k] = float(v)
    for k, v in sd.items():
        if k not in td and v < thresh:
            want[k] = float(v)
    assert got == want


def test_null_clause_conditions_leave_rows_unchanged(spark):
    """r8 ADVICE (medium): a clause condition that evaluates to NULL
    (nullable source column) must behave as 'clause not satisfied' —
    Delta semantics — not silently DROP the matched row through
    three-valued logic in the keep filter."""
    t = _target(spark)
    s = spark.createDataFrame(
        [(1, None), (2, 5.0), (9, None)], "k long, amt double"
    )
    out = merge_into(
        t,
        s,
        on=["k"],
        update_set={"bal": F.col("t_bal") + F.col("s_amt")},
        update_condition=F.col("s_amt") > 0,      # NULL for k=1
        delete_condition=F.col("s_amt") > 50,     # NULL for k=1
        insert_values={"name": F.lit("new"), "bal": F.col("s_amt")},
        insert_condition=F.col("s_amt") > 0,      # NULL for k=9
    )
    got = sorted(map(tuple, out.collect()))
    # k=1: both conditions NULL -> row kept UNCHANGED (was dropped);
    # k=2: update applies; k=3: target-only; k=9: insert cond NULL ->
    # not inserted.
    assert got == [
        (1, "a", 10.0),
        (2, "b", 25.0),
        (3, "c", 30.0),
    ]


@_SETTINGS
@given(
    tgt=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=-50, max_value=50),
        ),
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    src=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.one_of(
                st.none(), st.integers(min_value=-50, max_value=50)
            ),
        ),
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    thresh=st.integers(min_value=-50, max_value=50),
)
def test_merge_matches_python_model_with_null_amounts(
    spark, tgt, src, thresh
):
    """The NULL leg of the merge model (r8 ADVICE medium): a NULL
    source amount makes delete/insert conditions evaluate to NULL —
    Delta semantics say 'clause not satisfied', so the matched row is
    UPDATED (condition defaults true; SET yields NULL balance), never
    silently dropped, and the source-only row is not inserted."""
    t = spark.createDataFrame(
        [(k, float(v)) for k, v in tgt] or [(None, None)],
        "k long, bal double",
    ).filter(F.col("k").isNotNull())
    s = spark.createDataFrame(
        [(k, None if v is None else float(v)) for k, v in src]
        or [(None, None)],
        "k long, amt double",
    ).filter(F.col("k").isNotNull())
    out = merge_into(
        t,
        s,
        on=["k"],
        update_set={"bal": F.col("t_bal") + F.col("s_amt")},
        delete_condition=F.col("s_amt") >= float(thresh),
        insert_values={"bal": F.col("s_amt")},
        insert_condition=F.col("s_amt") < float(thresh),
    )
    got = {r["k"]: r["bal"] for r in out.collect()}
    td, sd = dict(tgt), dict(src)
    want = {}
    for k, v in td.items():
        if k in sd:
            if sd[k] is not None and sd[k] >= thresh:
                continue  # deleted
            # update clause (condition defaults true): NULL amt
            # updates the balance to NULL, it does not delete
            want[k] = float(v + sd[k]) if sd[k] is not None else None
        else:
            want[k] = float(v)
    for k, v in sd.items():
        if k not in td and v is not None and v < thresh:
            want[k] = float(v)
    assert got == want
