"""Lloyd's k-means: objective monotonicity, determinism, and
assignment sanity over the embeddings table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_2025_spark.functions.kmeans import (
    assign_cells,
    lloyd_kmeans,
    within_cluster_sse,
)
from cdc_2025_spark.io import read_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").cache()


def test_sse_monotonically_decreases(spark, emb):
    sses = [
        within_cluster_sse(emb, lloyd_kmeans(emb, k=8, n_iter=i))
        for i in (1, 2, 4)
    ]
    assert sses[0] >= sses[1] >= sses[2]
    assert sses[2] > 0


def test_deterministic_across_runs(spark, emb):
    a = {r["cid"]: r["cemb"] for r in lloyd_kmeans(emb, k=8, n_iter=2).collect()}
    b = {r["cid"]: r["cemb"] for r in lloyd_kmeans(emb, k=8, n_iter=2).collect()}
    assert a == b


def test_parallel_init_beats_lowest_id(spark, emb):
    """k-means|| seeding must reach a no-worse objective than the
    k-lowest-id init at the same iteration budget (that spread is the
    whole point of d²-weighted oversampling), and stay deterministic."""
    sse_low = within_cluster_sse(
        emb, lloyd_kmeans(emb, k=8, n_iter=2, init="lowest_id")
    )
    sse_par = within_cluster_sse(
        emb, lloyd_kmeans(emb, k=8, n_iter=2, init="parallel")
    )
    assert sse_par <= sse_low * 1.001  # allow fp noise, not regressions
    a = {
        r["cid"]: r["cemb"]
        for r in lloyd_kmeans(emb, k=8, n_iter=1, init="parallel").collect()
    }
    b = {
        r["cid"]: r["cemb"]
        for r in lloyd_kmeans(emb, k=8, n_iter=1, init="parallel").collect()
    }
    assert a == b


def test_parallel_init_rejects_unknown(spark, emb):
    with pytest.raises(ValueError, match="unknown init"):
        lloyd_kmeans(emb, k=4, init="random")


def test_assignment_covers_corpus_once(spark, emb):
    cents = lloyd_kmeans(emb, k=8, n_iter=2)
    vecs = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("emb"),
    )
    assigned = assign_cells(vecs, cents)
    n = emb.count()
    assert assigned.count() == n  # every vector exactly one cell
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells  # at least one non-empty cell
    cent_ids = {r["cid"] for r in cents.select("cid").collect()}
    assert cells <= cent_ids


def test_numpy_assignment_matches_expression_path(spark, emb):
    """assign_cells_np (Arrow-batched matmul argmin) must reproduce
    the expression path's assignment exactly on the fixture corpus —
    same argmin, same lowest-cid tiebreak — and full Lloyd runs with
    either backend must land on identical centroids."""
    from cdc_2025_spark.functions.kmeans import assign_cells_np

    cents = lloyd_kmeans(emb, k=8, n_iter=2)
    cent_rows = [(r["cid"], r["cemb"]) for r in cents.collect()]
    lit = spark.createDataFrame(cent_rows, "cid int, cemb array<double>")
    vecs = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("emb"),
    )
    want = {
        r["id"]: r["cell"] for r in assign_cells(vecs, lit).collect()
    }
    got = {
        r["id"]: r["cell"]
        for r in assign_cells_np(vecs, cent_rows).collect()
    }
    assert got == want

    a = lloyd_kmeans(emb, k=8, n_iter=3, assign="expr").collect()
    b = lloyd_kmeans(emb, k=8, n_iter=3, assign="numpy").collect()
    assert {r["cid"]: [round(v, 9) for v in r["cemb"]] for r in a} == {
        r["cid"]: [round(v, 9) for v in r["cemb"]] for r in b
    }


def test_lloyd_rejects_unknown_assign_backend(spark, emb):
    with pytest.raises(ValueError, match="assign backend"):
        lloyd_kmeans(emb, k=4, n_iter=1, assign="cuda")
