"""ANSI-mode independence: arithmetic-heavy operators must return
IDENTICAL results with spark.sql.ansi.enabled on and off.

Round 1 shipped a minhash hash family that silently wrapped with ANSI
off and threw with ANSI on — correctness must not depend on session
mode. These queries cover the hash/arithmetic surfaces most exposed
to overflow/coercion divergence.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()

CASES = [
    "dedup_minhash_lsh_pairs",   # xxhash64 signature mins + banding
    "dedup_prefix_jaccard_pairs",  # df-ordered prefix arithmetic
    "sample_weighted_by_tokens",  # md5-bucket integer inequality
    "text_pack_sequences",        # window cumsum + floor division
    "sample_stratified_by_segment",  # conv(md5) % bucketing
    # round 3: integer-arithmetic newcomers
    "sample_domain_mixture_weights",  # ppm floor division (div)
    "text_repetition_scores",         # 5*top > n integer flag
    "sample_train_val_test_split",    # conv(md5) % split buckets
    "text_fingerprints",              # base-31 modular rolling hash
]


@pytest.mark.parametrize("name", CASES)
def test_same_result_both_ansi_modes(spark, sf_dir, name):
    def run():
        df = QUERIES[name](spark, sf_dir)
        cols = sorted(df.columns)
        return sorted(
            tuple(row[c] for c in cols) for row in df.collect()
        )

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    on = run()
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        off = run()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")
    assert on == off, f"{name}: ANSI on/off results diverge"
