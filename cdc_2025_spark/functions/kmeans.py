"""Distributed Lloyd's k-means over an array<double> column — the
iterative-algorithm building block behind IVF cell assignment
(queries/similarity.py) and embedding-space clustering generally.

Each iteration is two declarative steps:

1. assign: broadcast the k centroids, argmin squared-distance per
   vector (max_by over negated distance — one codegen pass, no
   shuffle of the corpus);
2. recenter: posexplode vectors to (cell, dim, value), average per
   (cell, dim), reassemble arrays — one shuffle of k*dim partial
   sums thanks to map-side aggregation, NOT a shuffle of the corpus.

Initialization is deterministic (k lowest-id vectors), so results
reproduce across runs and cluster layouts; swap in k-means|| sampling
for quality-sensitive deployments.

Scale: per iteration the corpus is read once; shuffled bytes are
O(partitions * k * dim) regardless of corpus size. Driver holds only
the k centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_cells(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(id, emb) x (cid, cemb) -> (id, emb, cell) by nearest centroid
    (squared euclidean; ties break to the lowest cid)."""
    return (
        vectors.join(F.broadcast(centroids))
        .groupBy("id")
        .agg(
            F.min_by(
                "cid", F.struct(_sq_dist("emb", "cemb").alias("d"), "cid")
            ).alias("cell"),
            F.first("emb").alias("emb"),
        )
    )


def recenter(assigned: DataFrame) -> DataFrame:
    """Mean vector per cell: posexplode -> avg per (cell, dim) ->
    reassemble in dim order. Empty cells vanish (standard Lloyd's)."""
    per_dim = (
        assigned.select("cell", F.posexplode("emb").alias("dim", "v"))
        .groupBy("cell", "dim")
        .agg(F.avg("v").alias("m"))
    )
    return (
        per_dim.groupBy("cell")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm")
        )
        .select(
            F.col("cell").alias("cid"),
            F.transform("dm", lambda s: s.getField("m")).alias("cemb"),
        )
    )


def lloyd_kmeans(
    vectors: DataFrame,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-means centroids (cid, cemb array<double>) after ``n_iter``
    Lloyd iterations from the deterministic k-lowest-id init.

    The corpus is persisted across iterations (each reads it once);
    centroids stay distributed — nothing corpus-sized touches the
    driver.
    """
    emb = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("emb"),
    ).persist()
    cents = (
        emb.orderBy("id")
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy("id")).alias("cid"),
            F.col("emb").alias("cemb"),
        )
    )
    for _ in range(n_iter):
        # materialize current centroids driver-side: k rows, tiny —
        # this is the loop-carried state, not corpus data
        cent_rows = cents.collect()
        lit_cents = emb.sparkSession.createDataFrame(
            [(r["cid"], r["cemb"]) for r in cent_rows],
            "cid int, cemb array<double>",
        )
        cents = recenter(assign_cells(emb, lit_cents))
    emb.unpersist()
    return cents


def within_cluster_sse(vectors: DataFrame, centroids: DataFrame,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> float:
    """Total within-cluster squared error — the Lloyd's objective
    (monotonically non-increasing per iteration; pinned in tests)."""
    emb = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("emb"),
    )
    assigned = (
        emb.join(F.broadcast(centroids))
        .groupBy("id")
        .agg(F.min(_sq_dist("emb", "cemb")).alias("d"))
    )
    return assigned.agg(F.sum("d")).first()[0]
