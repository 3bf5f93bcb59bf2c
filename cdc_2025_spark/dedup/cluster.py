"""Connected components over near-duplicate pair edges — the
post-processing that turns pairwise dedup output into duplicate
CLUSTERS with one canonical survivor each (min id).

Algorithm: iterative min-label propagation. Every vertex starts
labeled with its own id; each round it takes the min of its label and
its neighbors' labels; convergence (no label changes) is reached in
O(component diameter) rounds. Per round: one join edges->labels + one
grouped min — both shuffle on vertex id, both partially aggregated
map-side.

Scale notes: label propagation's round count is the component
diameter, which for near-dup clusters (dense, star-ish) is small; the
loop carries only (id, comp) pairs, and lineage is truncated with
localCheckpoint each round so the plan does not grow with iterations.
For adversarial long-chain graphs the literature's alternating
large-star/small-star contraction (Kiveris et al., "Connected
Components in MapReduce", public) halves diameter per round — same
join/agg primitives, drop-in replacement if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, comp) for every vertex appearing in ``edges``; ``comp`` is
    the min vertex id of the component. Deterministic."""
    und = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .union(
            edges.select(
                F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
            )
        )
        .distinct()
        .persist()
    )
    labels = (
        und.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    n_changed = 0
    for _ in range(max_iter):
        nbr_min = (
            und.join(labels, und.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", "comp")
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        n_changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if n_changed == 0:
            break
    und.unpersist()
    if n_changed:
        # Exhausting the round budget with labels still moving means
        # some component's diameter exceeds max_iter — silently
        # returning half-merged clusters would be WRONG output, so fail
        # loudly. Long-diameter graphs should raise max_iter or switch
        # to large-star/small-star contraction (O(log d) rounds, see
        # module docstring).
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"rounds ({n_changed} labels still changing); raise "
            "max_iter for long-chain graphs"
        )
    return labels


def dup_clusters(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Cluster summary from pair edges: (comp, n_docs, canonical_id)
    with canonical = min id — the survivor-selection contract shared
    with exact dedup (dedup/exact.py)."""
    cc = connected_components(pairs, src_col, dst_col)
    return cc.groupBy("comp").agg(
        F.count("*").alias("n_docs"),
        F.min("id").alias("canonical_id"),
    )
