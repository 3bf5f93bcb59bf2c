"""Distributed PCA: exact agreement with a full-data numpy model,
spectral invariants, determinism, and empty-input behavior."""

from __future__ import annotations

import numpy as np
import pytest

from cdc_2025_spark.functions.pca import pca_fit, pca_project
from cdc_2025_spark.io import read_table


def _numpy_pca(x: np.ndarray, r: int):
    mu = x.mean(axis=0)
    cov = (x.T @ x) / len(x) - np.outer(mu, mu)
    cov = (cov + cov.T) / 2.0
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:r]
    comps = v[:, order].T.copy()
    for i in range(r):
        if comps[i, np.abs(comps[i]).argmax()] < 0:
            comps[i] = -comps[i]
    return mu, comps, w[order]


def test_fit_matches_numpy_full_data(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    rows = sorted(
        (r["vec_id"], list(r["embedding"])) for r in emb.collect()
    )
    x = np.asarray([v for _, v in rows], dtype=np.float64)
    want_mu, want_comps, want_w = _numpy_pca(x, 4)

    mu, comps, w, n = pca_fit(emb, 4)
    assert n == len(x)
    np.testing.assert_allclose(mu, want_mu, atol=1e-9)
    np.testing.assert_allclose(w, want_w, atol=1e-9)
    # eigenvectors match up to the pinned sign convention; compare
    # via absolute dot (near-degenerate eigenvalues would rotate the
    # basis — the fixture spectrum is checked non-degenerate below)
    gaps = np.diff(want_w)
    assert (gaps < -1e-10).all(), "fixture spectrum is degenerate"
    for i in range(4):
        assert abs(float(comps[i] @ want_comps[i])) > 1 - 1e-9
        np.testing.assert_allclose(comps[i], want_comps[i], atol=1e-7)


def test_spectral_invariants(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    mu, comps, w, n = pca_fit(emb, 4)
    # orthonormal rows
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-9)
    # descending, non-negative eigenvalues
    assert (np.diff(w) <= 1e-12).all()
    assert (w >= -1e-12).all()
    # explained variance is a proper fraction of the total
    x = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                  for r in emb.collect()])
    total = np.var(x, axis=0).sum()
    assert 0.0 < w.sum() <= total + 1e-9


def test_projection_matches_numpy(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    mu, comps, _, _ = pca_fit(emb, 4)
    got = {
        r["id"]: (r["pc1"], r["pc2"], r["pc3"], r["pc4"])
        for r in pca_project(emb, mu, comps).collect()
    }
    for r in emb.collect():
        x = np.asarray(r["embedding"], dtype=np.float64)
        want = np.round((x - mu) @ comps.T, 4)
        assert got[r["vec_id"]] == tuple(want)


def test_fit_is_deterministic(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    a = pca_fit(emb, 3)
    b = pca_fit(emb, 3)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(a[2], b[2])


def test_registered_query_shape_and_cache(spark, sf_dir):
    from cdc_2025_spark.queries.similarity import embed_pca_project

    out = embed_pca_project(spark, sf_dir)
    assert out.columns == ["vec_id", "label", "pc1", "pc2", "pc3", "pc4"]
    assert out.count() == read_table(spark, sf_dir, "embeddings").count()
    # second invocation serves the cached fit and agrees exactly
    again = embed_pca_project(spark, sf_dir)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_empty_and_bad_args(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        pca_fit(empty, 2)
    with pytest.raises(ValueError, match="n_components"):
        pca_fit(empty, 0)
