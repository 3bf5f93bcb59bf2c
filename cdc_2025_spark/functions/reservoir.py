"""Distributed bottom-k priority sampling (the mergeable reservoir).

Every row draws a deterministic uniform priority from a salted md5
bucket of its key; the sample is the K smallest (priority, key)
pairs. Classic properties, all public (bottom-k / KMV sampling —
e.g. Cohen & Kaplan, "Summarizing data using bottom-k sketches",
PODC 2007):

- it is a uniform random K-sample of the distinct keys (the hash is
  the randomness — reproducible across engines, reruns, layouts);
- it is MERGEABLE: bottomk(A ∪ B) = bottomk(bottomk(A) ∪ bottomk(B)),
  so partitions, shards, or stream microbatches each keep K rows and
  a union + re-take maintains the global sample exactly — the same
  incremental contract as the Bloom/CMS/HLL summaries;
- the K-th smallest priority doubles as a KMV distinct-count signal
  (not registered here; HLL covers that surface).

Scale shape: one scan; the K-smallest take plans as
TakeOrderedAndProject (per-partition partial top-K, K rows to the
driver-side merge) — never a global sort, never a corpus shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PRIORITY_SCALE = 1_000_000


def priority(key) -> F.Column:
    """Deterministic uniform priority in [0, PRIORITY_SCALE): salted
    md5 bucket of the key ('rs:' keeps the draw independent of every
    other sampler's md5 use)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("rs:"), F.col(key).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % PRIORITY_SCALE
    )


def bottomk_sample(
    df: DataFrame, k: int, key_col: str = "doc_id"
) -> DataFrame:
    """The K rows with smallest (priority, key): (key, prio, rk)
    with rk 1..K. The take is a limit (TakeOrderedAndProject); the
    rank window runs on the K-row result only."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # NULL keys are excluded: their md5 priority is NULL, which Spark
    # orders FIRST ascending while DuckDB orders LAST — a silent
    # cross-engine divergence; a sample of identifiable rows is the
    # sane contract anyway.
    small = (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col), priority(key_col).alias("prio"))
        .orderBy("prio", key_col)
        .limit(k)
    )
    w = Window.orderBy("prio", key_col)
    return small.withColumn("rk", F.row_number().over(w).cast("long"))


def merge_samples(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Merge two bottom-k samples (same schema: key, prio, rk) into
    the bottom-k of their union — the mergeability that makes the
    sample maintainable per-shard and per-microbatch. Duplicate keys
    (a row seen by both sides) collapse before the take."""
    key = a.columns[0]
    u = a.select(key, "prio").unionByName(
        b.select(key, "prio")
    ).dropDuplicates([key])
    small = u.orderBy("prio", key).limit(k)
    w = Window.orderBy("prio", key)
    return small.withColumn("rk", F.row_number().over(w).cast("long"))
