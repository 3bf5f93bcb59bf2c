"""Distributed IRLS logistic regression: exact agreement with a numpy
reference model, optimization invariants, classifier quality on the
fixture, and guards."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pytest

from cdc_2025_spark.functions.linear import (
    W_FLOOR,
    hashed_features,
    logreg_score,
    logreg_train_irls,
)
from cdc_2025_spark.io import read_table

NB = 256


def _fixture_xy(spark, sf_dir, marker="spark"):
    rows = sorted(
        (r["doc_id"], r["text"])
        for r in read_table(spark, sf_dir, "documents").collect()
    )
    n = len(rows)
    x = np.zeros((n, NB + 1))
    y = np.zeros(n)
    ids = []
    for i, (did, text) in enumerate(rows):
        ids.append(did)
        toks = re.split(r"\s+", text.strip().lower())
        for t in set(toks):
            b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % NB
            x[i, b] = 1.0
        x[i, NB] = 1.0
        y[i] = 1.0 if marker in toks else 0.0
    return ids, x, y


def _numpy_irls(x, y, n_iter=5, lam_per_row=1e-2):
    n, d1 = x.shape
    lam = lam_per_row * n
    reg = np.full(d1, lam)
    reg[d1 - 1] = 0.0
    w = np.zeros(d1)
    losses = []
    for _ in range(n_iter):
        p = 1 / (1 + np.exp(-(x @ w)))
        losses.append(
            float(
                -(
                    y * np.log(np.maximum(p, 1e-12))
                    + (1 - y) * np.log(np.maximum(1 - p, 1e-12))
                ).mean()
            )
        )
        wd = np.maximum(p * (1 - p), W_FLOOR)
        h = x.T @ (x * wd[:, None]) + np.diag(reg)
        g = x.T @ (y - p) - reg * w
        w = w + np.linalg.solve(h, g)
    return w[: d1 - 1], float(w[d1 - 1]), losses


@pytest.fixture(scope="module")
def trained(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    from pyspark.sql import functions as F

    feat = hashed_features(docs, NB).localCheckpoint(eager=False)
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.array_contains(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+"), "spark"
        )
        .cast("int")
        .alias("y"),
    )
    w, b, losses = logreg_train_irls(feat, labels, NB)
    return feat, labels, w, b, losses


def test_irls_matches_numpy_reference(spark, sf_dir, trained):
    feat, labels, w, b, losses = trained
    _, x, y = _fixture_xy(spark, sf_dir)
    want_w, want_b, want_losses = _numpy_irls(x, y)
    np.testing.assert_allclose(w, want_w, atol=1e-7)
    assert abs(b - want_b) < 1e-7
    np.testing.assert_allclose(losses, want_losses, atol=1e-9)


def test_loss_strictly_decreases(trained):
    _, _, _, _, losses = trained
    assert len(losses) == 5
    assert all(
        losses[i + 1] < losses[i] for i in range(len(losses) - 1)
    ), losses


def test_scores_match_numpy_and_recover_marker(spark, sf_dir, trained):
    feat, labels, w, b, _ = trained
    got = {r["id"]: r["score"] for r in logreg_score(feat, w, b).collect()}
    ids, x, y = _fixture_xy(spark, sf_dir)
    p = 1 / (1 + np.exp(-(x[:, :NB] @ w + x[:, NB] * b)))
    for i, did in enumerate(ids):
        assert got[did] == round(float(p[i]), 4)
    # perfect marker recovery on the fixture; clear separation
    pos = [got[d] for i, d in enumerate(ids) if y[i] == 1]
    neg = [got[d] for i, d in enumerate(ids) if y[i] == 0]
    assert min(pos) >= 0.5 and max(neg) < 0.5
    assert sum(pos) / len(pos) - sum(neg) / len(neg) > 0.5


def test_registered_query_shape(spark, sf_dir):
    from cdc_2025_spark.queries.text import text_quality_classifier_scores

    out = text_quality_classifier_scores(spark, sf_dir)
    assert out.columns == ["doc_id", "y", "score", "predicted_target"]
    rows = out.collect()
    assert len(rows) == 500
    assert all(
        (r["score"] >= 0.5) == r["predicted_target"] for r in rows
    )
    assert all((r["y"] == 1) == r["predicted_target"] for r in rows)


def test_guards(spark):
    from pyspark.sql import functions as F

    empty_feat = spark.createDataFrame(
        [], "id long, bucket long, x double"
    )
    empty_labels = spark.createDataFrame([], "id long, y int")
    with pytest.raises(ValueError, match="empty"):
        logreg_train_irls(empty_feat, empty_labels, 8)
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    feat = hashed_features(docs, 8)
    labels = docs.select(
        F.col("doc_id").alias("id"), F.lit(1).alias("y")
    )
    with pytest.raises(ValueError, match="n_iter"):
        logreg_train_irls(feat, labels, 8, n_iter=0)


def test_w_lookup_literals_roundtrip_numpy_scalars(spark):
    """r8 ADVICE: _w_lookup must embed weights via repr(float(v)) —
    under numpy >= 2.0, repr(np.float64(x)) is 'np.float64(x)' and
    the string CAST would NULL every weight. Pin exact round-trip
    for numpy scalars including awkward doubles."""
    import numpy as np

    from cdc_2025_spark.functions.linear import _w_lookup

    w = np.array([0.1, -1.5e-300, 2**53 + 1.0, np.pi])
    df = spark.createDataFrame(
        [(i,) for i in range(len(w))], "bucket int"
    )
    got = [r["v"] for r in df.select(_w_lookup(w).alias("v")).collect()]
    assert got == [float(x) for x in w]
