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

from cdc_2025_spark.dedup.minhash import shingle_sets


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) with shingle-Jaccard >= threshold.

    Shingle sets come pre-hashed to longs from dedup.minhash
    (shared construction): the inverted-index shuffle carries 8-byte
    keys, and set sizes/intersections are over long arrays. The
    repartition inside shingle_sets spreads the shingle expressions —
    the dominant per-row cost — across the cluster regardless of
    source file layout.
    """
    pairs = _pair_intersections(docs, id_col, text_col, k, max_doc_freq)
    jac = F.col("inter") / (
        F.col("size_a") + F.col("size_b") - F.col("inter")
    )
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _pair_intersections(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    max_doc_freq: int | None,
) -> DataFrame:
    """Candidate pairs (id_a < id_b, size_a, size_b, inter) from the
    inverted shingle index — the shared engine under both set-overlap
    measures (Jaccard and containment): any pair with a nonzero
    intersection appears exactly once, with exact set sizes and exact
    intersection counts over the kept (df-capped) shingles."""
    sets = (
        shingle_sets(docs, id_col, text_col, k)
        .withColumn("set_size", F.size("sh"))
        # persist: the shingle construction is the dominant per-row
        # cost and this subplan feeds both sides of the self-join —
        # without it Catalyst re-evaluates it per consumer
        .persist()
    )

    inv = sets.select("id", "set_size", F.explode("sh").alias("shingle"))
    if max_doc_freq is not None:
        # Broadcast the STOP-shingle set (df > cap), not the keep-set:
        # the cap exists to drop a handful of ubiquitous shingles, so
        # the stop-set is tiny by construction while the keep-set is
        # ~every distinct shingle in the corpus — broadcasting the
        # latter would itself be the OOM at corpus scale. A broadcast
        # left-anti join gives the identical filtered index with a
        # bounded build side.
        stop = (
            inv.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        inv = inv.join(F.broadcast(stop), "shingle", "left_anti")

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
    return (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count("*").alias("inter"))
    )


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b, containment) where the SMALLER shingle set
    is >= threshold contained in the pair's union:
    C = |A∩B| / min(|A|, |B|).

    This is the asymmetric complement of Jaccard: a short document
    quoted wholesale inside a much longer one has high containment but
    low Jaccard (the union is dominated by the long side), so a
    Jaccard-only dedup pass keeps both copies. Containment-based
    detection of such near-supersets is standard in the set-similarity
    literature (Broder's resemblance vs containment distinction,
    SEQUENCES'97).

    Scale: identical inverted-index shape to ngram_jaccard_pairs —
    8-byte hashed shingle keys, df-capped stop-shingles, candidate
    fan-out bounded by per-shingle document frequency. Only the final
    scalar measure differs.
    """
    pairs = _pair_intersections(docs, id_col, text_col, k, max_doc_freq)
    cont = F.col("inter") / F.least(F.col("size_a"), F.col("size_b"))
    return (
        pairs.withColumn("containment", cont)
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )
