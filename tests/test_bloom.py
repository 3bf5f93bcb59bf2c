"""Distributed Bloom filter: sizing math, the no-false-negative
guarantee, the FPR envelope, bitmap mergeability, and the registered
prefilter query's exactness."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cdc_2025_spark.dedup.bloom import (
    bloom_build,
    bloom_params,
    bloom_probe,
)


def _key_df(spark, prefix: str, n: int):
    return spark.createDataFrame(
        [(f"{prefix}{i}",) for i in range(n)], "key string"
    )


def test_params_textbook_optimum():
    m, k = bloom_params(500, 0.01)
    want_m = -500 * math.log(0.01) / math.log(2) ** 2
    assert want_m <= m <= want_m + 64 and m % 64 == 0
    assert k == round(m / 500 * math.log(2))
    with pytest.raises(ValueError, match="n_keys"):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError, match="target_fpr"):
        bloom_params(10, 1.5)


def test_no_false_negatives_and_fpr_envelope(spark):
    """Every inserted key probes positive (structural guarantee);
    disjoint keys probe positive at <= ~2.5x the sized FPR (the
    slack covers binomial noise at n=2000 probes)."""
    keys = _key_df(spark, "key", 500)
    other = _key_df(spark, "other", 2000)
    m, k = bloom_params(500, 0.01)
    bm = bloom_build(keys, "key", m, k)
    probed = bloom_probe(bm, keys, "key", m, k)
    assert probed.filter(~F.col("might_contain")).count() == 0
    fp = (
        bloom_probe(bm, other, "key", m, k)
        .filter("might_contain")
        .count()
    )
    assert fp <= 2.5 * 0.01 * 2000, fp


def test_bitmap_merges_by_bit_or(spark):
    """bloom(A ∪ B) must equal the per-bucket bit_or of bloom(A) and
    bloom(B) EXACTLY — the property that makes the filter
    incrementally maintainable (stream in new batches, OR the
    bitmaps; never rebuild over the corpus)."""
    a = _key_df(spark, "a", 300)
    b = _key_df(spark, "b", 200)
    m, k = bloom_params(500, 0.05)
    combined = {
        r["bucket"]: r["bits"]
        for r in bloom_build(a.union(b), "key", m, k).collect()
    }
    bm_a = {r["bucket"]: r["bits"] for r in bloom_build(a, "key", m, k).collect()}
    bm_b = {r["bucket"]: r["bits"] for r in bloom_build(b, "key", m, k).collect()}
    merged = dict(bm_a)
    for bucket, bits in bm_b.items():
        merged[bucket] = merged.get(bucket, 0) | bits
    assert merged == combined
    # and the DataFrame-native merge (the streaming-maintenance path)
    # produces the identical bitmap
    from cdc_2025_spark.dedup.bloom import bloom_merge

    df_merged = {
        r["bucket"]: r["bits"]
        for r in bloom_merge(
            bloom_build(a, "key", m, k), bloom_build(b, "key", m, k)
        ).collect()
    }
    assert df_merged == combined


def test_null_key_round_trips(spark):
    """A NULL key fed to bloom_build must probe positive (and a NULL
    query against a NULL-free filter may be positive only at FPR
    rates, never spuriously pinned false) — the r7 ADVICE fix: the
    verdict re-join is null-safe, so 'no false negatives' covers the
    NULL key too."""
    keys = spark.createDataFrame(
        [("a",), ("b",), (None,)], "key string"
    )
    m, k = bloom_params(3, 0.01)
    bm = bloom_build(keys, "key", m, k)
    got = {
        r["key"]: r["might_contain"]
        for r in bloom_probe(bm, keys, "key", m, k).collect()
    }
    assert got == {"a": True, "b": True, None: True}


def test_geometry_guard():
    """The overflow guard is joint in (m_bits, n_hashes) — either
    factor alone can push i·h2 past int64 (r7 ADVICE: the old
    m-only 2^56 check left n_hashes unbounded)."""
    from cdc_2025_spark.dedup.bloom import _positions

    with pytest.raises(ValueError, match="overflows int64"):
        _positions(None, F.col("k"), 1 << 62, 7, 42)
    with pytest.raises(ValueError, match="overflows int64"):
        _positions(None, F.col("k"), 1 << 40, 1 << 23, 42)
    with pytest.raises(ValueError, match="n_hashes"):
        _positions(None, F.col("k"), 1 << 20, 0, 42)
    with pytest.raises(ValueError, match="m_bits"):
        _positions(None, F.col("k"), 32, 7, 42)


def test_prefilter_query_is_exact(spark, sf_dir):
    """The registered query's output must equal the brute-force exact
    membership join (Bloom false positives die in verification, no
    false negatives exist) — and actual dups must be present so the
    test is not vacuous."""
    from cdc_2025_spark.dedup.exact import vocab_key
    from cdc_2025_spark.io import read_table
    from cdc_2025_spark.queries.dedup import (
        INCREMENTAL_SPLIT_ID,
        dedup_incremental_bloom_prefilter,
    )

    got = {
        r["doc_id"]: r["is_dup_of_corpus"]
        for r in dedup_incremental_bloom_prefilter(spark, sf_dir).collect()
    }
    keyed = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", vocab_key("text").alias("key"))
        .collect()
    )
    corpus = {r["key"] for r in keyed if r["doc_id"] < INCREMENTAL_SPLIT_ID}
    want = {
        r["doc_id"]: r["key"] in corpus
        for r in keyed
        if r["doc_id"] >= INCREMENTAL_SPLIT_ID
    }
    assert got == want
    assert sum(got.values()) > 0


def test_prefilter_empty_corpus_is_all_new(spark):
    """An EMPTY corpus partition (every doc_id >= the split) must
    yield an all-false batch verdict instead of bloom_params raising
    on n_keys=0 (r7 ADVICE: the live count feeds the geometry)."""
    import os
    import tempfile

    from cdc_2025_spark.queries.dedup import (
        INCREMENTAL_SPLIT_ID,
        dedup_incremental_bloom_prefilter,
    )

    rows = [
        (INCREMENTAL_SPLIT_ID + i, f"doc text {i}", "en", "s", 10)
        for i in range(5)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["doc_id"]: r["is_dup_of_corpus"]
            for r in dedup_incremental_bloom_prefilter(spark, d).collect()
        }
    assert got == {INCREMENTAL_SPLIT_ID + i: False for i in range(5)}
