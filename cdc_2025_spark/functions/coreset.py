"""k-center greedy coreset selection (Sener & Savarese, "Active
Learning for Convolutional Neural Networks: A Core-Set Approach",
ICLR 2018 — public): iteratively pick the point FARTHEST from the
already-selected set (max-min euclidean distance), producing a
diversity-maximizing subset with the classic 2-approximation
guarantee for the k-center objective.

Where dedup removes redundancy pair by pair, coreset selection picks
a budgeted subset that COVERS the embedding space — the
data-selection step of "train on less, lose less" pipelines.

Distributed shape (the SemDeDup/IVF posture): the selected centers
live driver-side (k·dim floats — never corpus-sized); each round is
ONE aggregate over the corpus:

- round state: per-vector min squared distance to the selected set,
  maintained INCREMENTALLY — each round only measures against the
  single newly-added center (min with the running value), so round
  cost is one scan + one max_by aggregate, not |selected|·n work;
- the running min-distance column is carried in a lazily
  checkpointed frame per round (lineage would otherwise grow
  linearly with k);
- argmax ties break to the lowest id, so selection is fully
  deterministic (pinned against a pure-python model in tests).

Cost: k rounds x one corpus scan. For k beyond ~hundreds, the
literature batches selections per round (gaining speed, losing the
greedy guarantee) — documented here, not implemented: the registered
query's k is small by contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcenter_greedy(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, float]]:
    """[(selected_id, min_sq_dist_at_selection)] in selection order
    (the first row's distance is infinity by convention, returned as
    NaN-free 0.0 for the seed). Seed = lowest id (deterministic, the
    lowest_id k-means convention)."""
    from cdc_2025_spark.functions.kmeans import _sq_dist

    n = emb.count()
    if k < 1 or n == 0:
        return []
    cur = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("emb"),
    )
    seed = cur.orderBy("id").select("id", "emb").first()
    picked = [(seed["id"], 0.0)]
    state = cur.withColumn("d2", F.lit(float("inf")))
    last_emb = seed["emb"]
    for _ in range(min(k, n) - 1):
        state = state.withColumn(
            "d2",
            F.least(
                "d2",
                _sq_dist(
                    "emb",
                    F.array(*[F.lit(float(x)) for x in last_emb]),
                ),
            ),
        ).localCheckpoint(eager=False)
        far = (
            state.filter(~F.col("id").isin([p for p, _ in picked]))
            .select(
                F.max_by(
                    F.struct("id", "emb", "d2"),
                    F.struct(F.col("d2").alias("d"), (-F.col("id")).alias("i")),
                ).alias("s")
            )
            .select("s.id", "s.emb", "s.d2")
            .first()
        )
        picked.append((far["id"], float(far["d2"])))
        last_emb = far["emb"]
    return picked
