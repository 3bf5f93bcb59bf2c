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

# Round-7 window (the driver oracle-checks the FIRST 50 registry
# entries per round, insertion order). Composition:
#
#   1. Queries materially CHANGED in round 7, which must (re)check
#      despite a previous green row: the exact near-dup twin (pair
#      source now gated by the budget-derived sample, oracle's e CTE
#      mirrors it), the two new rows-only registrations
#      (auto-geometry LSH, OPH minhash), and the rollup's
#      consolidated container pass.
#   2. The 14 queries whose newest green is round 4 — the r6 window's
#      natural tail of _R4_GREEN.
#   3. The oldest r5-green queries, in their r5 check order, filling
#      the remaining window slots; the cut falls wherever
#      len(_CHANGED_R7) + len(_R4_TAIL) leaves it (deliberately not
#      named here — a previous revision of this comment misnamed the
#      cut entry on the day it claimed the arithmetic could no longer
#      drift). The authoritative statement is mechanical:
#      test_registry_freshness.py reads the REAL first-50 window and
#      asserts every query outside it holds a green row no older
#      than 2 rounds; entries past the cut lead round 8.
_CHANGED_R7 = [
    "dedup_embedding_neardup",       # budget gate + oracle e CTE
    "sim_lsh_auto_pairs",            # NEW in r7: never driver-checked
    "dedup_minhash_oph_pairs",       # NEW in r7: never driver-checked
    "multimodal_feature_rollup",     # container branches consolidated
    "dedup_remove_repeated_spans",   # NEW in r7: never driver-checked
    "dedup_semdedup_decision",       # NEW in r7: never driver-checked
    "text_chunk_documents",          # NEW in r7: never driver-checked
    "dedup_incremental_bloom_prefilter",  # NEW in r7: never checked
    "dedup_embedding_neardup_lsh",   # CC loop changed in r7: recheck
    "sim_ivf_topk",                  # quantizer backend swap: recheck
    "text_bigram_perplexity",        # NEW in r7: never driver-checked
    "sketch_cms_heavy_terms",        # NEW in r7: never driver-checked
    "dedup_pipeline_accounting",     # NEW in r7: never driver-checked
    "sample_topk_weighted_per_source",  # NEW in r7: never checked
]

# newest green is round 4 (CORRECTNESS_r04.json) — front of the line
_R4_TAIL = [
    "q18_large_orders", "q19_bracketed_revenue", "q9_product_profit",
    "q20_promo_heavy_suppliers", "q21_sole_late_suppliers",
    "q11ish_part_value_share", "q13_customer_order_distribution",
    "q17_small_quantity_revenue", "q22_dormant_rich_customers",
    "skewjoin_salted_event_types", "window_top3_orders_per_customer",
    "window_running_spend", "asof_last_signup_before_purchase",
    "q12_priority_by_linestatus",
]

# newest green is round 5, in r5 check order; the leading entries
# fill the window up to the 50 cut, the rest lead round 8
_R5_GREEN = [
    "text_tfidf_top_terms", "sql_api_lateral_explode",
    "window_ntile_spend_quartiles", "dedup_simhash_pairs",
    "dedup_minhash_lsh_pairs", "sim_lsh_bucketed_pairs",
    "interevent_timing_stats", "window_event_gaps",
    "window_sessionize_events", "q16_supplier_count_by_parttype",
    "window_cumulative_distribution", "window_mom_revenue_change",
    "window_trailing7d_customer_spend", "timeseries_gap_fill",
    "stats_robust_outliers", "text_top_terms",
    "events_user_type_entropy", "stats_approx_percentiles",
    "text_fingerprints", "dedup_ngram_jaccard_pairs",
    "dedup_jaccard_clusters", "stats_corr_price_quantity",
    "stats_percentiles_order_value", "sample_stratified_by_segment",
    "sketch_hll_weekly_users", "window_ranking_variants",
    "window_first_last_order", "subquery_correlated_max_order",
    "subquery_in_top_nations", "sample_hash_deterministic",
    "histogram_order_values", "q10_returned_items",
    "q2ish_min_cost_supplier", "sql_api_grouping_sets",
    "array_norm_stats_by_label", "array_dimension_profile",
    "string_close_part_names", "funnel_signup_purchase",
    "cohort_daily_retention", "dedup_exact_vocab_groups",
    "q1_pricing_summary", "q3_shipping_priority",
    "q5_regional_volume", "join_outer_customer_orders",
    "join_semi_customers_with_purchases",
    "join_anti_customers_without_orders", "agg_rollup_nation_segment",
]

_VERIFY_FIRST = [
    *_CHANGED_R7,
    *_R4_TAIL,
    *_R5_GREEN,
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
