"""Distributed Bloom filter as a bucketed-bitmap DataFrame — the
compact membership index for ingest-time dedup and decontamination
prefilters (Bloom, CACM 1970; probe positions via the
Kirsch-Mitzenmacher double-hashing construction, ESA'06 — the same
public family the MinHash signatures cite, dedup/minhash.py).

Representation: ``(bucket long, bits long)`` — bit ``p`` of the
filter lives at ``bucket = p div 64``, ``bit = p mod 64``. That makes
the filter

- **buildable as one aggregate**: explode each key to its k probe
  positions, ``bit_or`` the single-bit masks per bucket — map-side
  partial aggregation does the heavy lifting, the shuffle carries at
  most ``m/64`` longs per partition;
- **mergeable**: the union filter of two key sets is the per-bucket
  ``bit_or`` of their filters (pinned in tests/test_bloom.py) — the
  streaming/incremental story;
- **probeable with a join**: a query key checks its k (bucket, bit)
  pairs against the bitmap; a missing bucket row means those bits are
  zero. No false negatives ever; false positives at the standard
  ``(1 - e^(-kn/m))^k`` rate (envelope pinned in tests).

Scale: the bitmap is ``m/64`` rows. At ingest-dedup sizes (1e9 corpus
keys, 1% FPR) that is ~1.2 GB of longs — broadcastable to executors
as a map-side prefilter; beyond that the probe join runs as a
bucket-keyed shuffle join, which is exactly what this representation
already is. Sizing math in ``bloom_params``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(n_keys: int, target_fpr: float) -> tuple[int, int]:
    """(m_bits, n_hashes) for ``n_keys`` at ``target_fpr`` — the
    textbook optimum m = -n ln p / ln²2, k = (m/n) ln 2, with m
    rounded up to whole 64-bit buckets."""
    if n_keys < 1:
        raise ValueError(f"n_keys must be >= 1, got {n_keys}")
    if not 0.0 < target_fpr < 1.0:
        raise ValueError(f"target_fpr must be in (0, 1), got {target_fpr}")
    m = math.ceil(-n_keys * math.log(target_fpr) / math.log(2) ** 2)
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def _positions(
    df: DataFrame, key: Column, m_bits: int, n_hashes: int, seed: int
) -> DataFrame:
    """One row per (input row, probe i) with the probe's (bucket,
    bit). Double hashing: pos_i = (h1 + i·h2) mod m, both base hashes
    reduced mod m BEFORE the affine combine so the ANSI-mode sum can
    never overflow — guarded for ANY (m_bits, n_hashes) pair by the
    joint check n_hashes·m_bits < 2^63 (max term is
    (n_hashes-1)·(m-1) + (m-1) < n_hashes·m). The h2 step is forced
    nonzero (1 + hash mod (m-1), the standard double-hashing fix) so
    no key collapses its k probes onto a single position — with
    h2 = hash mod m, ~1/m of keys would get h2 = 0 and an effective
    k = 1, inflating their false-positive contribution."""
    if m_bits < 64:
        raise ValueError(f"m_bits must be >= 64, got {m_bits}")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    if n_hashes * m_bits >= 1 << 63:
        raise ValueError(
            f"n_hashes*m_bits = {n_hashes}*{m_bits} overflows int64 "
            "double hashing; shard the filter instead"
        )
    h1 = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits))
    h2 = F.lit(1) + F.pmod(
        F.xxhash64(key, F.lit(seed + 1)), F.lit(m_bits - 1)
    )
    pos = F.pmod(
        h1 + F.col("_i") * h2,
        F.lit(m_bits),
    )
    return (
        df.withColumn(
            "_i", F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1)))
        )
        .withColumn("bucket", F.shiftrightunsigned(pos, 6))
        .withColumn("bit", pos % 64)
    )


def bloom_build(
    keys: DataFrame,
    key_col: str = "key",
    m_bits: int = 1 << 20,
    n_hashes: int = 7,
    seed: int = 42,
) -> DataFrame:
    """(bucket, bits) bitmap over the distinct values of ``key_col``.
    One explode + one bit_or aggregate; partials combine map-side, so
    the shuffle is bounded by m/64 longs per input partition
    regardless of key count."""
    return (
        _positions(
            keys.select(F.col(key_col).alias("_k")),
            F.col("_k"),
            m_bits,
            n_hashes,
            seed,
        )
        .groupBy("bucket")
        .agg(
            F.bit_or(F.expr("shiftleft(1L, CAST(bit AS INT))")).alias(
                "bits"
            )
        )
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union filter of two bitmaps BUILT WITH THE SAME GEOMETRY:
    per-bucket bit_or via a full-outer join (missing buckets are
    all-zero). This is the incremental-maintenance path — stream in a
    new batch, build its small bitmap, OR it into the store; never
    rebuild over the corpus. Equality with the rebuilt-union filter
    is pinned in tests/test_bloom.py."""
    aa = a.select(F.col("bucket"), F.col("bits").alias("_ba"))
    bb = b.select(F.col("bucket"), F.col("bits").alias("_bb"))
    return aa.join(bb, "bucket", "full_outer").select(
        "bucket",
        (
            F.coalesce("_ba", F.lit(0)).bitwiseOR(
                F.coalesce("_bb", F.lit(0))
            )
        ).alias("bits"),
    )


def bloom_probe(
    bitmap: DataFrame,
    queries: DataFrame,
    key_col: str = "key",
    m_bits: int = 1 << 20,
    n_hashes: int = 7,
    seed: int = 42,
    broadcast_bitmap: bool = True,
) -> DataFrame:
    """``queries`` + ``might_contain`` boolean: true iff ALL k probe
    bits are set (no false negatives by construction; false positives
    at the sizing rate). The bitmap side of the join is m/64 rows —
    the default broadcast hint is right whenever it fits executor
    memory (up to ~1e9 keys at 1% FPR); pass
    ``broadcast_bitmap=False`` for filters beyond broadcast size and
    the probe becomes a plain bucket-keyed equi-join (AQE picks the
    strategy). Geometry (m_bits, n_hashes, seed) must match the
    build — a mismatch silently probes the wrong bits, so pass the
    same values, not "close" ones. NULL keys round-trip consistently:
    xxhash64 gives NULL a deterministic (seed-derived) hash on both
    the build and probe sides, and the verdict re-join is null-safe,
    so a NULL-keyed query reports true iff a NULL key was fed to
    ``bloom_build`` (the no-false-negatives claim holds for NULL
    too)."""
    probes = _positions(
        queries.select(F.col(key_col).alias("_k")).distinct(),
        F.col("_k"),
        m_bits,
        n_hashes,
        seed,
    )
    hit = (
        F.col("bits").isNotNull()
        & (
            F.expr("bits & shiftleft(1L, CAST(bit AS INT))")
            != F.lit(0)
        )
    )
    build_side = F.broadcast(bitmap) if broadcast_bitmap else bitmap
    verdicts = (
        probes.join(build_side, "bucket", "left")
        .groupBy("_k")
        .agg(F.min(hit.cast("int")).alias("_all_hit"))
        .select(
            F.col("_k"),
            (F.col("_all_hit") == 1).alias("might_contain"),
        )
    )
    return queries.join(
        verdicts, queries[key_col].eqNullSafe(verdicts._k), "left"
    ).select(
        *[queries[c] for c in queries.columns],
        F.coalesce("might_contain", F.lit(False)).alias(
            "might_contain"
        ),
    )
