"""Deduplication operators for corpus-scale pipelines.

Four pairing families, trading exactness for scale, plus clustering:

- exact: content-hash groupBy (md5 / normalized-vocabulary key)
- ngram: exact k-shingle Jaccard via shingle-inverted-index self-join
- prefix: exact k-shingle Jaccard via df-ordered prefix filtering
  (Bayardo et al. WWW'07) — the exact path that stays sub-quadratic
- minhash: MinHash signatures + LSH banding (the 100 TB path),
  candidates verified with exact Jaccard
- simhash: 64-bit SimHash + banded Hamming candidate generation
- cluster: connected components over pair edges -> duplicate clusters
  with a canonical survivor per cluster

Everything is pure DataFrame expressions (xxhash64, codegen'd
aggregates) — no Python UDFs, no MLlib model state.
"""

from cdc_2025_spark.dedup.cluster import (
    connected_components,
    connected_components_star,
    dup_clusters,
)
from cdc_2025_spark.dedup.exact import exact_dedup, exact_dup_groups
from cdc_2025_spark.dedup.jaccard import (
    containment_pairs,
    ngram_jaccard_pairs,
)
from cdc_2025_spark.dedup.minhash import minhash_lsh_pairs, minhash_signatures
from cdc_2025_spark.dedup.prefix import prefix_jaccard_pairs
from cdc_2025_spark.dedup.simhash import simhash, simhash_pairs

__all__ = [
    "connected_components",
    "containment_pairs",
    "connected_components_star",
    "dup_clusters",
    "exact_dedup",
    "exact_dup_groups",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "prefix_jaccard_pairs",
    "simhash",
    "simhash_pairs",
]
