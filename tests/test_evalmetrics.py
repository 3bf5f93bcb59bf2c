"""Classifier-evaluation kernels: AUC vs the pairwise-comparison
model (including ties), boundary cases, and the threshold sweep's
confusion arithmetic."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_2025_spark.functions.evalmetrics import auc_roc, threshold_sweep

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _pairwise_auc(rows):
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    if not pos or not neg:
        return None
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p in pos
        for n in neg
    )
    return wins / (len(pos) * len(neg))


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5).map(lambda i: i / 5.0),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_auc_matches_pairwise_model(spark, rows):
    """Midrank AUC == P(score_pos > score_neg) + 0.5 P(tie) computed
    by brute-force pairwise comparison — tie-heavy scores included
    (only 6 distinct score values); NULL when a class is absent."""
    df = spark.createDataFrame(rows, "score double, label int")
    got = auc_roc(df, "score", "label").collect()[0]
    want = _pairwise_auc(rows)
    n_pos = sum(y for _, y in rows)
    assert got["n_pos"] == n_pos
    assert got["n_neg"] == len(rows) - n_pos
    if want is None:
        assert got["auc"] is None
    else:
        assert got["auc"] == pytest.approx(want, abs=1e-6)


def test_auc_boundaries(spark):
    sep = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], "score double, label int"
    )
    assert auc_roc(sep, "score", "label").collect()[0]["auc"] == 1.0
    inv = spark.createDataFrame(
        [(0.1, 1), (0.9, 0)], "score double, label int"
    )
    assert auc_roc(inv, "score", "label").collect()[0]["auc"] == 0.0
    tie = spark.createDataFrame(
        [(0.5, 1), (0.5, 0)], "score double, label int"
    )
    assert auc_roc(tie, "score", "label").collect()[0]["auc"] == 0.5


def test_threshold_sweep_confusion(spark):
    """Every row's confusion cells sum to n; tp/fp are cumulative
    from the top score down; precision/recall match hand arithmetic
    at each of the three distinct thresholds."""
    df = spark.createDataFrame(
        [(0.9, 1), (0.9, 0), (0.5, 1), (0.1, 0)],
        "score double, label int",
    )
    rows = {
        r["threshold"]: r
        for r in threshold_sweep(df, "score", "label").collect()
    }
    assert set(rows) == {0.9, 0.5, 0.1}
    r9 = rows[0.9]
    assert (r9["tp"], r9["fp"], r9["fn"], r9["tn"]) == (1, 1, 1, 1)
    assert r9["precision"] == 0.5 and r9["recall"] == 0.5
    r5 = rows[0.5]
    assert (r5["tp"], r5["fp"], r5["fn"], r5["tn"]) == (2, 1, 0, 1)
    assert r5["recall"] == 1.0
    r1 = rows[0.1]
    assert (r1["tp"], r1["fp"], r1["fn"], r1["tn"]) == (2, 2, 0, 0)
    for r in rows.values():
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == 4


def test_sweep_bounded_frame_and_null_exclusion(spark):
    """The sweep has one row per DISTINCT score regardless of corpus
    size, and NULL scores/labels are excluded from both kernels."""
    from pyspark.sql import functions as F

    big = spark.range(10_000).select(
        (F.col("id") % 4 / 4.0).alias("score"),
        (F.col("id") % 2).cast("int").alias("label"),
    )
    sweep = threshold_sweep(big, "score", "label")
    assert sweep.count() == 4
    with_nulls = spark.createDataFrame(
        [(0.9, 1), (None, 0), (0.1, None), (0.1, 0)],
        "score double, label int",
    )
    got = auc_roc(with_nulls, "score", "label").collect()[0]
    assert (got["n_pos"], got["n_neg"]) == (1, 1)
    assert got["auc"] == 1.0


def test_nonbinary_labels_raise(spark):
    """A -1/+1-labeled column must fail loudly, not produce
    plausible-looking garbage counts."""
    df = spark.createDataFrame(
        [(0.9, 1), (0.1, -1)], "score double, label int"
    )
    with pytest.raises(Exception) as ei:
        auc_roc(df, "score", "label").collect()
    assert "labels must be 0/1" in str(ei.value)


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4).map(lambda i: i / 4.0),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_threshold_sweep_matches_brute_force(spark, rows):
    """Every operating point's confusion cells equal the brute-force
    recount at that threshold (predict positive when score >=
    threshold), for arbitrary tie-heavy score/label multisets."""
    df = spark.createDataFrame(rows, "score double, label int")
    got = {
        r["threshold"]: (r["tp"], r["fp"], r["fn"], r["tn"])
        for r in threshold_sweep(df, "score", "label").collect()
    }
    assert set(got) == {s for s, _ in rows}
    for thr, cells in got.items():
        tp = sum(1 for s, y in rows if s >= thr and y == 1)
        fp = sum(1 for s, y in rows if s >= thr and y == 0)
        fn = sum(1 for s, y in rows if s < thr and y == 1)
        tn = sum(1 for s, y in rows if s < thr and y == 0)
        assert cells == (tp, fp, fn, tn), thr
