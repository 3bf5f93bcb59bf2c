"""Prefix-filtered all-pairs exact Jaccard — the scalable EXACT pairs
path between "exact but quadratic" (inverted index, dedup/jaccard.py)
and "bucketed but approximate" (MinHash-LSH, dedup/minhash.py).

Construction (public: Bayardo, Ma, Srikant, "Scaling Up All Pairs
Similarity Search", WWW'07; Chaudhuri et al.'s SSJoin prefix filter):
impose a global total order on shingles — ascending document
frequency, rarest first, which minimizes candidate fan-out — and for a
set A of size n emit only its first ``n - ceil(t*n) + 1`` shingles
(the PREFIX). Lemma: if Jaccard(A,B) >= t then |A∩B| >= t*max(|A|,|B|),
and two sets whose prefixes are disjoint can overlap in at most
ceil(t*n)-1 < t*n elements — so every qualifying pair shares a prefix
shingle, and joining on prefix shingles alone is candidate-COMPLETE.
Verification on the full hashed sets then makes precision exact.

Scale shape vs the plain inverted index: the self-join touches only
prefix occurrences (a (1-t) fraction of the index, and the rarest
shingles at that), so per-shingle fan-out is bounded by the df of rare
shingles rather than the corpus's most common phrase. Cost is one
extra df aggregation + per-doc sort — partial-aggregable and linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_2025_spark.dedup.minhash import shingle_sets


def prefix_length(n, threshold: float):
    """Prefix length ``n - ceil(t*n) + 1`` as a Column, float-safe:
    when t*n is mathematically integral but the double product rounds
    one ulp high (e.g. 0.35*20 -> 7.000000000000001), a bare ceil
    would overshoot and shorten the prefix by one — violating
    candidate completeness for pairs with overlap exactly
    t*max(|A|,|B|). The epsilon keeps ceil exact for every
    representable integral product; it cannot undershoot, since the
    nearest non-integral values of t*n are ~1e-2 away for real set
    sizes, far above 1e-9."""
    n = F.col(n) if isinstance(n, str) else n
    return (
        n - F.ceil(F.lit(threshold) * n - F.lit(1e-9)) + F.lit(1)
    ).cast("int")


def prefix_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) with EXACT shingle-Jaccard >=
    threshold — same output contract as ngram_jaccard_pairs, different
    candidate generation (prefix filter instead of full inverted
    index)."""
    sets = shingle_sets(docs, id_col, text_col, k).persist()
    tok = sets.select("id", F.size("sh").alias("n"), F.explode("sh").alias("h"))
    df_counts = tok.groupBy("h").agg(F.count("*").alias("df"))

    # global order: (df asc, shingle hash asc); array_sort on structs
    # compares fields left-to-right, giving exactly that order JVM-side
    ordered = (
        tok.join(df_counts, "h")
        .groupBy("id", "n")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("h")))
            ).alias("oh")
        )
    )
    prefix_len = prefix_length("n", threshold)
    pref = ordered.select(
        "id",
        F.explode(
            F.slice(F.col("oh").getField("h"), F.lit(1), prefix_len)
        ).alias("h"),
    )

    left = pref.select(F.col("h"), F.col("id").alias("id_a"))
    right = pref.select(F.col("h"), F.col("id").alias("id_b"))
    candidates = (
        left.join(right, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

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
