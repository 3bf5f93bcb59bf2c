"""Deduplication operators for corpus-scale pipelines.

Four families, trading exactness for scale:

- exact: content-hash groupBy (md5 / normalized-vocabulary key)
- ngram: exact k-shingle Jaccard via shingle-inverted-index self-join
- minhash: MinHash signatures + LSH banding (the 100 TB path),
  candidates verified with exact Jaccard
- simhash: 64-bit SimHash + banded Hamming candidate generation

Everything is pure DataFrame expressions (xxhash64, higher-order array
functions) — no Python UDFs, no MLlib model state.
"""

from cdc_2025_spark.dedup.exact import exact_dedup, exact_dup_groups
from cdc_2025_spark.dedup.jaccard import ngram_jaccard_pairs
from cdc_2025_spark.dedup.minhash import minhash_lsh_pairs, minhash_signatures
from cdc_2025_spark.dedup.simhash import simhash, simhash_pairs

__all__ = [
    "exact_dedup",
    "exact_dup_groups",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_pairs",
]
