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

# Names with no driver CORRECTNESS row in round 1 (the driver checked
# registry positions 1-50 only; these sat at 51-90).
_UNCHECKED_R1 = {
    "sim_pairs_above_threshold", "sim_ivf_topk", "sim_kmeans_cell_profile",
    "sim_lsh_bucketed_pairs",
    "text_token_stats", "text_quality_scores", "text_lang_id_confusion",
    "text_punct_and_bpe", "text_fingerprints",
    "q4_order_priority", "q6_forecast_revenue", "q7_nation_volume",
    "q8_market_share", "q14_promo_revenue", "q15_top_supplier",
    "q18_large_orders", "q19_bracketed_revenue", "q9_product_profit",
    "q20_promo_heavy_suppliers", "q21_sole_late_suppliers",
    "q11ish_part_value_share", "q13_customer_order_distribution",
    "q17_small_quantity_revenue", "q22_dormant_rich_customers",
    "range_join_event_windows", "skewjoin_salted_event_types",
    "window_top3_orders_per_customer", "window_event_gaps",
    "window_running_spend", "window_sessionize_events",
    "asof_last_signup_before_purchase",
    "q12_priority_by_linestatus", "q16_supplier_count_by_parttype",
    "window_cumulative_distribution", "window_mom_revenue_change",
    "window_trailing7d_customer_spend", "timeseries_gap_fill",
    "stats_robust_outliers", "text_top_terms", "events_user_type_entropy",
}

# Registered for the first time in round 2.
_NEW_R2 = {
    "multimodal_feature_rollup",
    "dedup_prefix_jaccard_pairs",
    "text_decontamination_overlap",
    "text_pack_sequences",
    "sample_weighted_by_tokens",
    "dedup_incremental_new_docs",
}

# The verification driver oracle-checks the first 50 registry entries
# per round (insertion order). Round 1's alphabetical-module accident
# left every tpch/windows/text query unverified, so the order is now
# explicit: queries with no driver CORRECTNESS row yet (plus the three
# fixed round-1 errors and anything newly added) rotate to the front;
# the 44 already-green round-1 queries move behind them. Rotate again
# next round if any remain unchecked.
_VERIFY_FIRST = [
    # round-1 errors, now fixed — must re-check
    "dedup_minhash_lsh_pairs",
    "stats_approx_percentiles",
    "agg_order_array_per_customer",
    # driver-unchecked in round 1 (registry positions 51-90)
    *[n for n in QUERIES if n in _UNCHECKED_R1],
    # new this round (never checked)
    *[n for n in QUERIES if n in _NEW_R2],
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
