"""SimHash near-dup detection: 64-bit locality-sensitive fingerprints
whose Hamming distance tracks cosine similarity of the token bags
(Charikar 2002, public knowledge).

Construction (pure expressions, no UDFs): for each bit position p, sum
+1/-1 over tokens according to bit p of xxhash64(token); bit p of the
fingerprint is 1 iff the sum is positive.

Candidate generation at scale uses the pigeonhole principle: split the
64 bits into ``max_distance + 1`` chunks; any pair within Hamming
distance d must agree exactly on >= 1 chunk, so grouping by (chunk
index, chunk value) finds all such pairs with one shuffle — no
quadratic self-join. Exact Hamming then filters false positives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_2025_spark.functions.text import tokens


def simhash(text: Column | str, n_bits: int = 64) -> Column:
    """64-bit SimHash of the whitespace token multiset."""
    col = F.col(text) if isinstance(text, str) else text
    toks = tokens(F.lower(col))

    # NB: capture the bit position via closure, NOT a lambda default
    # arg — pyspark's higher-order-function wrapper dispatches on
    # lambda arity and would feed a Column into the extra parameter.
    def bit_term(p: int):
        return lambda acc, t: acc + F.when(
            F.shiftright(F.xxhash64(t), p).bitwiseAND(1) == 1, 1
        ).otherwise(-1)

    bit_sums = [F.aggregate(toks, F.lit(0), bit_term(p)) for p in range(n_bits)]
    out = F.lit(0).cast("long")
    for p, s in enumerate(bit_sums):
        # two's complement for the sign bit: 1 << 63 overflows long
        weight = (1 << p) if p < 63 else -(1 << 63)
        out = out + F.when(s > 0, F.lit(weight).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def _token_hash(hash_fn: str):
    """64-bit token hash column for the simhash bit source.

    - ``xxhash64``: Spark's native xxhash64 — cheapest, JVM-codegen'd;
      the default scale path. Not reproducible in other engines.
    - ``md5``: first 16 hex chars of md5(token) packed into a signed
      64-bit value (hi<<32 | lo). ~2x the hash cost of xxhash64 but
      bit-for-bit reproducible in any engine with md5 + hex parsing
      (DuckDB oracle: same two 8-hex-char halves) — Charikar's
      construction only needs a uniform bit source, so LSH quality is
      identical. Used by the registered query so the driver can
      hash-match it end to end.
    """
    if hash_fn == "xxhash64":
        return F.xxhash64("tok")
    if hash_fn == "md5":
        hi = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("long")
        return F.shiftleft(hi, 32).bitwiseOR(lo)
    raise ValueError(f"unknown simhash hash_fn {hash_fn!r}")


def simhash_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, fp) SimHash-64 per doc — same values as ``simhash()`` but
    computed as explode + 64 codegen'd conditional sums: the token is
    hashed ONCE per row (vs once per bit), and grouped sums get
    map-side partial aggregation (higher-order ``aggregate`` lambdas
    are interpreted per element — see dedup/minhash.py)."""
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    ex = (
        docs.repartition(n_part, id_col)
        .select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .select("id", _token_hash(hash_fn).alias("h"))
    )
    bit_aggs = [
        F.expr(
            f"sum(case when (h >> {p}) & 1 = 1 then 1 else -1 end) AS _b{p}"
        )
        for p in range(64)
    ]
    fp_terms = []
    for p in range(64):
        weight = (1 << p) if p < 63 else -(1 << 63)
        fp_terms.append(f"(case when _b{p} > 0 then {weight}L else 0L end)")
    return (
        ex.groupBy("id")
        .agg(*bit_aggs)
        .select("id", F.expr(" + ".join(fp_terms)).alias("fp"))
    )


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Pairs (id_a < id_b, hamming) with Hamming(simhash) <= max_distance.

    Banded by max_distance+1 16-bit chunks (pigeonhole-exact for
    d <= 3 on 64 bits), then exact bit_count(xor) filter.
    """
    fps = simhash_fingerprints(docs, id_col, text_col, hash_fn=hash_fn)
    return hamming_pairs(fps, max_distance=max_distance)


def hamming_pairs(fps: DataFrame, max_distance: int = 3) -> DataFrame:
    """Pairs (id_a < id_b, hamming) with Hamming(fp) <= max_distance
    over ANY (id, fp) 64-bit fingerprint frame — the pigeonhole
    banding shared by text simhash and image perceptual hashes:
    max_distance+1 chunks guarantee two fingerprints within distance
    d agree on at least one chunk (exact, no recall loss), then an
    exact bit_count(xor) filter removes band-collision false
    positives. Candidate volume is bounded by per-(chunk, val) bucket
    sizes — an equi-join, never a cross product."""
    n_chunks = max_distance + 1
    chunk_bits = 64 // n_chunks
    chunks = fps.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned("fp", i * chunk_bits)
                        .bitwiseAND((1 << chunk_bits) - 1)
                        .alias("val"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("ck"),
    ).select("id", "fp", "ck.chunk", "ck.val")
    # persist: both join sides read this subplan; without it the
    # fingerprint aggregation executes twice
    chunks = chunks.persist()

    a = chunks.select(
        "chunk", "val", F.col("id").alias("id_a"), F.col("fp").alias("fp_a")
    )
    b = chunks.select(
        "chunk", "val", F.col("id").alias("id_b"), F.col("fp").alias("fp_b")
    )
    return (
        a.join(b, ["chunk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias(
                "hamming"
            ),
        )
        .distinct()
        .filter(F.col("hamming") <= max_distance)
    )
