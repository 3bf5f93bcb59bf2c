"""Distributed PageRank (Brin & Page 1998; the Pregel/GraphX power
iteration) over a weighted edge frame.

Scale shape, per iteration: the rank vector joins onto the edge
frame keyed by source (BROADCAST when the vertex set is small — the
registered trade network has 25 nations; a web-scale vertex set
flips the same join to a key-shuffled hash join with identical
semantics), contributions aggregate per destination (map-side
partials), and dangling-node mass redistributes via one scalar
aggregate — nothing but the V-sized rank table leaves the plan.
Deterministic: uniform init, fixed damping and iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = "w",
) -> DataFrame:
    """Weighted PageRank over ``edges`` (src, dst[, w]); returns
    (node, pagerank) for every node appearing as source or
    destination. Dangling nodes (no out-edges) spread their mass
    uniformly — the standard correction, applied as a scalar each
    round so ranks sum to 1 throughout."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"),
        w_col.alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pagerank", F.lit(0.0))
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # edge transition probabilities are iteration-invariant
    trans = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .localCheckpoint(eager=False)
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("r"))
    for _ in range(n_iter):
        ranks = ranks.localCheckpoint(eager=False)
        contrib = (
            trans.join(
                F.broadcast(ranks.withColumnRenamed("node", "src")), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("p") * F.col("r")).alias("in_r"))
        )
        # dangling mass: rank held by nodes with no out-edges
        dangling = (
            ranks.join(
                out_w.withColumnRenamed("src", "node"), "node", "left_anti"
            )
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_r"), F.lit(0.0))
                        + F.col("dm") / n
                    )
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("pagerank"))
