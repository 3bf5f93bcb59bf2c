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


def _uniform(salt: str, key) -> F.Column:
    """Deterministic uniform draw in [0, PRIORITY_SCALE): salted md5
    bucket of the key — the engine-wide seed-free randomness pattern
    (the same construction appears inline with salts 'sb:' in the
    trigram split and 'kmv:' in the KMV sketch; those registered
    queries keep their copies because their DuckDB oracles mirror
    the exact expression text)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % PRIORITY_SCALE
    )


def priority(key) -> F.Column:
    """Deterministic uniform priority in [0, PRIORITY_SCALE): salted
    md5 bucket of the key ('rs:' keeps the draw independent of every
    other sampler's md5 use)."""
    return _uniform("rs:", key)


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


def weighted_priority(key, weight) -> F.Column:
    """Efraimidis-Spirakis exponential race key: -ln(u)/w with u the
    deterministic uniform in (0, 1] drawn from a salted md5 of the
    key ('wrs:' keeps the draw independent of the uniform sampler's
    'rs:' stream). Taking the K SMALLEST race keys samples keys with
    probability proportional to weight without replacement
    (Efraimidis & Spirakis, IPL 2006, the u^(1/w) top-k formulated
    as the numerically-stabler -ln(u)/w bottom-k; the exponential
    race: -ln(u)/w ~ Exp(w), and the minimum of exponentials lands
    on each competitor with probability w_i / sum(w))."""
    u = (_uniform("wrs:", key) + 1) / float(PRIORITY_SCALE)
    return -F.log(u) / weight


def weighted_bottomk_sample(
    df: DataFrame, k: int, key_col: str, weight_col: str
) -> DataFrame:
    """Weight-proportional K-sample without replacement: the K rows
    with the smallest (race key, key) — (key, weight, wprio, rk).
    NULL keys and non-positive/NULL weights are excluded (a weight
    <= 0 means "never sample"; -ln(u)/w would flip its sign and
    always-sample instead — the exclusion IS the correct semantics).

    Scale shape: identical to the uniform sampler — one scan, the
    take plans as TakeOrderedAndProject (per-partition partial
    top-K, K rows to the merge), never a global sort. MERGEABLE the
    same way: the race key is a pure function of (key, weight), so
    bottomk(A ∪ B) = bottomk(bottomk(A) ∪ bottomk(B)) for shards
    and stream microbatches."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    small = (
        df.filter(
            F.col(key_col).isNotNull()
            & F.col(weight_col).isNotNull()
            & (F.col(weight_col) > 0)
        )
        .select(
            F.col(key_col),
            F.col(weight_col).cast("double").alias("weight"),
            weighted_priority(key_col, F.col(weight_col).cast("double")).alias(
                "wprio"
            ),
        )
        .orderBy("wprio", key_col)
        .limit(k)
    )
    w = Window.orderBy("wprio", key_col)
    return small.withColumn("rk", F.row_number().over(w).cast("long"))


def merge_weighted_samples(
    a: DataFrame, b: DataFrame, k: int
) -> DataFrame:
    """Merge two weighted bottom-k samples (same schema: key, weight,
    wprio, rk) into the weighted bottom-k of their union; duplicate
    keys (seen by both shards) collapse before the take. When the
    two shards carry the SAME weight for a key the copies agree (the
    race key is a pure function of (key, weight)); when a key's
    weight was updated between shards, the copy with the SMALLEST
    race key wins deterministically — the highest-weight version's
    ticket, the union semantics of an exponential race (an arbitrary
    dropDuplicates pick here would make the merged sample
    nondeterministic)."""
    key = a.columns[0]
    both = a.select(key, "weight", "wprio").unionByName(
        b.select(key, "weight", "wprio")
    )
    u = both.groupBy(key).agg(
        F.min_by("weight", F.struct("wprio", "weight")).alias("weight"),
        F.min("wprio").alias("wprio"),
    )
    small = u.orderBy("wprio", key).limit(k)
    w = Window.orderBy("wprio", key)
    return small.withColumn("rk", F.row_number().over(w).cast("long"))
