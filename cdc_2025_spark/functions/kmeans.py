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

Two deterministic initializations:

- ``init="lowest_id"``: the k lowest-id vectors — trivially
  reproducible, quality-poor on clustered data;
- ``init="parallel"``: k-means||-style oversampling (Bahmani et al.,
  "Scalable K-Means++", VLDB 2012 — public) with the random draws
  replaced by a hash threshold (accept x when
  xxhash64(id, seed, round)/2^63 < l*d²(x)/φ), so the init is exactly
  reproducible across runs and cluster layouts while keeping the
  paper's d²-weighted sampling distribution in expectation across ids.
  Candidates (≈ l·rounds rows) are weighted by attraction counts and
  reduced to k driver-side via weight·d² greedy selection (the
  kmeans++ argmax, deterministic).

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


def assign_cells_np(
    vectors: DataFrame, centroid_rows: list[tuple[int, list[float]]]
) -> DataFrame:
    """Arrow-batched numpy variant of ``assign_cells``: centroids ride
    the closure (k·dim floats — the same data the expression path
    broadcasts), each partition does ONE ``X @ C.T`` matmul and an
    argmin instead of n·k interpreted ``zip_with`` folds. Same
    tiebreak (lowest cid: centroids are sorted by cid and argmin
    takes the first minimum). This is the assignment backend for
    large n·k — the expression path's per-pair lambda folds are the
    dominant k-means cost once n·k·dim crosses ~10⁷ (measured 3.2x
    end-to-end on SemDeDup at 20k×64×64, SCALE.md).

    Distances use the expansion ||c||² - 2x·c (the ||x||² term is
    constant per row and cannot move the argmin); floating-point
    rounding near EXACT centroid ties may differ from the fold-order
    expression path — equality on real corpora is pinned in
    tests/test_kmeans.py."""
    import numpy as np  # noqa: PLC0415

    rows = sorted(centroid_rows, key=lambda r: r[0])
    cids = np.asarray([r[0] for r in rows], dtype=np.int64)
    cmat = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    c2 = (cmat * cmat).sum(axis=1)

    def fn(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
            d2 = c2[None, :] - 2.0 * (x @ cmat.T)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "cell": cids[np.argmin(d2, axis=1)].astype(np.int32),
                    "emb": pdf["emb"],
                }
            )

    return vectors.select("id", "emb").mapInPandas(
        fn, "id long, cell int, emb array<double>"
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


def _min_sq_dist(emb: DataFrame, centers: DataFrame) -> DataFrame:
    """(id, emb, d2) — squared distance to the nearest of ``centers``
    (broadcast; corpus never shuffles)."""
    return (
        emb.join(F.broadcast(centers))
        .groupBy("id")
        .agg(
            F.first("emb").alias("emb"),
            F.min(_sq_dist("emb", "cemb")).alias("d2"),
        )
    )


def kmeans_parallel_init(
    emb: DataFrame, k: int, rounds: int = 3, seed: int = 42
) -> list[list[float]]:
    """Deterministic k-means||-style seeding; returns k centers.

    Each round every point is accepted iff
    ``uniform_hash(id, seed, round) < l * d²(x) / φ`` with l = 2k —
    the paper's oversampling step with its Bernoulli draw replaced by
    a fixed hash, making the init reproducible. Runs ``rounds``
    corpus passes; candidates stay ~l·rounds rows, weighted by
    attraction counts, then reduced to k with the deterministic
    weighted-kmeans++ greedy (argmax weight·d²) on the driver.
    """
    l = 2 * k  # noqa: E741 — the paper's oversampling factor name
    first = emb.orderBy("id").limit(1).collect()[0]
    cand_rows = [list(first["emb"])]
    for r in range(rounds):
        centers = emb.sparkSession.createDataFrame(
            [(i, c) for i, c in enumerate(cand_rows)],
            "cid int, cemb array<double>",
        )
        scored = _min_sq_dist(emb, centers)
        phi = scored.agg(F.sum("d2")).first()[0]
        if not phi:  # all points coincide with a candidate
            break
        # uniform in [0,1): top 63 bits of xxhash64 / 2^63
        u = (
            F.shiftrightunsigned(
                F.xxhash64(F.col("id"), F.lit(seed), F.lit(r)), 1
            )
            / F.lit(float(1 << 63))
        )
        accepted = scored.filter(
            u < F.lit(float(l)) * F.col("d2") / F.lit(float(phi))
        ).select("emb")
        cand_rows.extend(list(row["emb"]) for row in accepted.collect())
    # weight candidates by how many points each attracts
    centers = emb.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(cand_rows)],
        "cid int, cemb array<double>",
    )
    weights = dict(
        assign_cells(emb, centers)
        .groupBy("cell")
        .count()
        .collect()
    )
    import numpy as np  # noqa: PLC0415

    cand = np.asarray(cand_rows)
    w = np.asarray([float(weights.get(i, 0)) for i in range(len(cand_rows))])
    chosen = [int(w.argmax())]
    d2 = ((cand - cand[chosen[0]]) ** 2).sum(axis=1)
    while len(chosen) < min(k, len(cand_rows)):
        nxt = int((w * d2).argmax())
        if nxt in chosen:  # all remaining mass at distance 0
            break
        chosen.append(nxt)
        d2 = np.minimum(d2, ((cand - cand[nxt]) ** 2).sum(axis=1))
    return [cand_rows[i] for i in chosen]


def lloyd_kmeans(
    vectors: DataFrame,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "lowest_id",
    assign: str = "expr",
) -> DataFrame:
    """k-means centroids (cid, cemb array<double>) after ``n_iter``
    Lloyd iterations from a deterministic init (``lowest_id`` or
    ``parallel`` — see module docstring).

    The corpus is persisted across iterations (each reads it once);
    centroids stay distributed — nothing corpus-sized touches the
    driver.

    ``assign``: ``expr`` (codegen-adjacent zip_with folds — the
    fold-order-deterministic default) or ``numpy``
    (``assign_cells_np``: one Arrow-batched matmul per partition —
    pick when n·k·dim is large; agreement pinned in
    tests/test_kmeans.py).
    """
    if assign not in ("expr", "numpy"):
        raise ValueError(f"unknown assign backend {assign!r}")
    emb = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("emb"),
    ).persist()
    if init == "parallel":
        seeds = kmeans_parallel_init(emb, k)
        cents = emb.sparkSession.createDataFrame(
            [(i + 1, c) for i, c in enumerate(seeds)],
            "cid int, cemb array<double>",
        )
    elif init == "lowest_id":
        cents = (
            emb.orderBy("id")
            .limit(k)
            .select(
                F.row_number().over(Window.orderBy("id")).alias("cid"),
                F.col("emb").alias("cemb"),
            )
        )
    else:
        raise ValueError(f"unknown init {init!r}")
    for _ in range(n_iter):
        # materialize current centroids driver-side: k rows, tiny —
        # this is the loop-carried state, not corpus data
        cent_rows = cents.collect()
        if assign == "numpy":
            assigned = assign_cells_np(
                emb, [(r["cid"], r["cemb"]) for r in cent_rows]
            )
        else:
            lit_cents = emb.sparkSession.createDataFrame(
                [(r["cid"], r["cemb"]) for r in cent_rows],
                "cid int, cemb array<double>",
            )
            assigned = assign_cells(emb, lit_cents)
        cents = recenter(assigned)
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
