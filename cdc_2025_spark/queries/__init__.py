"""Query registry: the driver-facing surface of the engine.

Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
extensions) registers here as a named query over the star-schema
testdata, each with a DuckDB oracle SQL equivalent where SQL can
express the semantics.

Determinism rules for oracle hash-parity (driver compares a
column-name-sorted, order-insensitive value hash at sf0.01):

- every LIMIT/top-k query fully orders with a unique tiebreak first;
- floating-point aggregates are rounded (4 decimals) AFTER
  aggregation in BOTH engines, so summation-order noise (~1e-12 rel)
  cannot flip the hash;
- DuckDB's SUM(integer) returns HUGEINT — oracles cast to BIGINT;
  DuckDB's year()/month() return BIGINT — oracles cast to INTEGER.
"""

from __future__ import annotations

from cdc_2025_spark.queries.registry import ORACLES, QUERIES, query

# Importing the modules populates the registry.
from cdc_2025_spark.queries import (  # noqa: E402,F401
    analytics,
    arrays,
    behavior,
    dedup,
    llmdata,
    multimodal,
    relational,
    resilience_star,
    similarity,
    text,
    tpch,
    windows,
    windows2,
)

# Round-4 window (the driver oracle-checks the FIRST 50 registry
# entries per round, insertion order). Composition, per the round-3
# verdict's top ask:
#
#   1. The 9 round-3 newcomers that have NEVER had a driver
#      CORRECTNESS row (their only verification so far is the local
#      tests/test_oracle_parity.py run at sf0.01).
#   2. Queries materially CHANGED in round 4, which must re-check
#      despite a previous green row.
#   3. 38 queries whose most recent green row is round 2 — the
#      oldest-evidence block — in stable registry order.
#
# Everything checked green in round 3 rotates to the back; the 8
# r2-green queries that don't fit (named in _DEFER_TO_R5) plus the
# r3-green block form the natural round-5 window.
_NEVER_CHECKED = [
    "text_repetition_scores",
    "text_doc_entropy",
    "text_pii_scrub",
    "llm_corpus_prep",
    "cdc_scd2_user_state_history",
    "cdc_scd2_state_asof",
    "sample_train_val_test_split",
    "sample_domain_mixture_weights",
    "dedup_repeated_spans",
]

_RECHECK_R4 = [
    "dedup_simhash_pairs",        # rows-only -> DuckDB popcount oracle in r4
    "sim_ivf_topk",               # centroids: first-16 placeholder -> k-means
    "multimodal_feature_rollup",  # gained PNG decode rows in r4
]

# Most recent green row is round 2 (CORRECTNESS_r02.json). 46 such
# queries exist after removing sim_ivf_topk (rechecked above); the
# first 38 in registry order fill the window.
_R2_GREEN = [
    "stats_moments_by_segment", "agg_order_array_per_customer",
    "dedup_prefix_jaccard_pairs", "dedup_incremental_new_docs",
    "dedup_minhash_lsh_pairs", "text_decontamination_overlap",
    "sample_weighted_by_tokens", "text_pack_sequences",
    "sim_pairs_above_threshold", "sim_kmeans_cell_profile",
    "sim_lsh_bucketed_pairs", "text_token_stats", "text_quality_scores",
    "text_lang_id_confusion", "text_punct_and_bpe",
    "q4_order_priority", "q6_forecast_revenue", "q7_nation_volume",
    "q8_market_share", "q14_promo_revenue", "q15_top_supplier",
    "q18_large_orders", "q19_bracketed_revenue", "q9_product_profit",
    "q20_promo_heavy_suppliers", "q21_sole_late_suppliers",
    "q11ish_part_value_share", "q13_customer_order_distribution",
    "q17_small_quantity_revenue", "q22_dormant_rich_customers",
    "range_join_event_windows", "skewjoin_salted_event_types",
    "window_top3_orders_per_customer", "window_event_gaps",
    "window_running_spend", "window_sessionize_events",
    "asof_last_signup_before_purchase", "q12_priority_by_linestatus",
]

_DEFER_TO_R5 = [
    "q16_supplier_count_by_parttype", "window_cumulative_distribution",
    "window_mom_revenue_change", "window_trailing7d_customer_spend",
    "timeseries_gap_fill", "stats_robust_outliers", "text_top_terms",
    "events_user_type_entropy",
]

_VERIFY_FIRST = [
    *_NEVER_CHECKED,
    *_RECHECK_R4,
    *_R2_GREEN,
    *_DEFER_TO_R5,
]


def _rotate(front: list[str]) -> None:
    seen = set(front)
    order = [n for n in front if n in QUERIES] + [
        n for n in QUERIES if n not in seen
    ]
    for d in (QUERIES, ORACLES):
        snapshot = {n: d[n] for n in order if n in d}
        d.clear()
        d.update(snapshot)


_rotate(_VERIFY_FIRST)

__all__ = ["QUERIES", "ORACLES", "query"]
