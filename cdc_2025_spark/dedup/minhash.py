"""MinHash + LSH banding near-dup detection — the 100 TB dedup path.

Signatures are computed entirely as array expressions (no explode, no
Python): for each of ``n_hashes`` permutations,
``min over shingles of pmod(a_i * xxhash64(shingle) + b_i, P)``.
The hash family is deterministic (fixed seeds), so results are stable
across runs and cluster layouts.

LSH: the signature splits into ``n_bands`` bands of ``r`` rows; two
docs are candidates iff some band hashes identically. With J the true
Jaccard, P[candidate] = 1 - (1 - J^r)^b — the (b, r) choice below
(16 bands x 8 rows, 128 hashes) puts the S-curve threshold at
(1/16)^(1/8) ~ 0.71.

Scale: cost is |docs| x n_hashes map-side work + one shuffle of
(band_hash -> id) pairs; bucket sizes are bounded by real duplicate
clusters, and candidate verification (exact Jaccard via
dedup.jaccard) touches only candidate ids, not the corpus cross
product. This is the textbook MMDS ch.3 construction (public
knowledge), re-expressed in Spark array expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_2025_spark.functions.text import shingles

MERSENNE_P = (1 << 61) - 1


def _hash_params(n_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via a splitmix64-style mix of the
    seed — library-free and reproducible."""
    params = []
    state = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(n_hashes * 2):
        state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        params.append((z ^ (z >> 31)) % MERSENNE_P)
    return [
        (params[2 * i] | 1, params[2 * i + 1]) for i in range(n_hashes)
    ]


def shingle_sets(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, sh) distinct-shingle sets, spread across the cluster."""
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(n_part, id_col).select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(text_col, k)).alias("sh"),
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 128,
    seed: int = 42,
    sets: DataFrame | None = None,
) -> DataFrame:
    """(id, signature array<long>[n_hashes]) per document."""
    if sets is None:
        sets = shingle_sets(docs, id_col, text_col, k)
    # closure factory, not lambda default args: pyspark dispatches
    # higher-order lambdas on arity
    def perm(a: int, b: int):
        return lambda s: F.pmod(
            F.lit(a) * F.xxhash64(s) + F.lit(b), F.lit(MERSENNE_P)
        )

    sig_cols = [
        F.array_min(F.transform("sh", perm(a, b)))
        for a, b in _hash_params(n_hashes, seed)
    ]
    return sets.select("id", F.array(*sig_cols).alias("signature"))


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 128,
    n_bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, jaccard) whose EXACT shingle
    Jaccard >= threshold, found via LSH candidates then verified.

    Verification joins candidates back to exact Jaccard, so precision
    is 1.0; recall follows the LSH S-curve for the (bands, rows)
    geometry.
    """
    r = n_hashes // n_bands
    # one shingle-set computation, persisted, feeding signatures AND
    # candidate verification — the expression is the dominant map cost
    sets = shingle_sets(docs, id_col, text_col, k).persist()
    sigs = minhash_signatures(
        docs, id_col, text_col, k, n_hashes, seed, sets=sets
    )
    bands = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice("signature", j * r + 1, r),
                                    lambda x: x.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("bucket"),
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bucket")

    left = bands.select("band", "bucket", F.col("id").alias("id_a"))
    right = bands.select("band", "bucket", F.col("id").alias("id_b"))
    candidates = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # Verify ONLY the candidate pairs: join their shingle sets back and
    # compute exact Jaccard per pair — work proportional to
    # |candidates|, not |docs|^2 (that full join is what LSH avoids).
    sa = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )
