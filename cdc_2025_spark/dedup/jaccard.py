"""Exact n-gram Jaccard near-duplicate pairs via an inverted shingle
index — the ground-truth oracle the approximate families (MinHash,
SimHash) are measured against.

Algorithm: distinct k-shingles per doc -> explode to (shingle, doc) ->
self-join on shingle -> pair intersection counts -> Jaccard =
|A∩B| / (|A| + |B| - |A∩B|) -> threshold.

Scale: the self-join on shingle is quadratic in document frequency per
shingle, so ``max_doc_freq`` drops stop-shingles (df > threshold)
before pairing — standard for all-pairs similarity (cf. prefix
filtering in the ANN literature). Exact for the shingle set it keeps;
at true 100 TB scale this operator is the verification stage behind
MinHash-LSH candidate generation, not the primary pairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_2025_spark.functions.text import shingles


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) with shingle-Jaccard >= threshold.

    Two deliberate physical choices:
    - repartition by id before shingling: document corpora often
      arrive as few large files, and the shingle expressions are the
      dominant per-row cost — spread them across the cluster instead
      of inheriting the file layout.
    - join on xxhash64(shingle), not the shingle string: the shuffle
      carries 8-byte keys instead of ~5-word strings (a 64-bit
      collision among corpus shingles is ~|shingles|^2 / 2^64 —
      negligible against float tolerance).
    """
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    sets = (
        docs.repartition(n_part, id_col)
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(shingles(text_col, k)).alias("sh"),
        )
        .withColumn("set_size", F.size("sh"))
        # persist: the shingle construction is the dominant per-row
        # cost and this subplan feeds both sides of the self-join —
        # without it Catalyst re-evaluates it per consumer
        .persist()
    )

    inv = sets.select(
        "id", "set_size", F.explode("sh").alias("shingle_str")
    ).select("id", "set_size", F.xxhash64("shingle_str").alias("shingle"))
    if max_doc_freq is not None:
        df_counts = inv.groupBy("shingle").agg(F.count("*").alias("df"))
        inv = inv.join(
            F.broadcast(df_counts.filter(F.col("df") <= max_doc_freq)),
            "shingle",
        )

    a = inv.select(
        F.col("shingle"),
        F.col("id").alias("id_a"),
        F.col("set_size").alias("size_a"),
    )
    b = inv.select(
        F.col("shingle"),
        F.col("id").alias("id_b"),
        F.col("set_size").alias("size_b"),
    )
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (
        F.col("size_a") + F.col("size_b") - F.col("inter")
    )
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
