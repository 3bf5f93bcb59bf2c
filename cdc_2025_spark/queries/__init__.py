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

# Round-5 window (the driver oracle-checks the FIRST 50 registry
# entries per round, insertion order). Composition:
#
#   1. Queries materially CHANGED in round 5, which must re-check
#      despite a previous green row: the three NTZ-timestamp fixes
#      (regenerated testdata reads ts as TIMESTAMP_NTZ), the
#      bin-bucketed range-join rewrite, the md5-simhash variant whose
#      new DuckDB oracle upgrades it from rows-only to hash-matched,
#      and the multimodal rollup's new image_png row (rows-only).
#   2. The 8 r2-green queries round 4 deferred (oldest evidence).
#   3. The round-3-green block (rotated out during round 4), in
#      stable order, to fill the window.
#
# Everything checked green in round 4 rotates to the back; the tail
# of the r3 block that doesn't fit forms the natural round-6 front.
_CHANGED_R5 = [
    "text_tfidf_top_terms",       # NEW in r5: never driver-checked
    "sql_api_lateral_explode",    # NEW in r5: never driver-checked
    "window_ntile_spend_quartiles",  # NEW in r5: never driver-checked
    "decontam_embedding_crosssplit",  # NEW in r5: never driver-checked
    "dedup_simhash_pairs",        # rows-only -> md5 bit source + full oracle
    "dedup_minhash_lsh_pairs",    # rows-only -> md5_km family + full oracle
    "sim_lsh_bucketed_pairs",     # rows-only -> literal-hyperplane oracle
    "range_join_event_windows",   # BNLJ -> bin-bucketed broadcast hash join
    "interevent_timing_stats",    # NTZ fix: ts cast through timestamp_ltz
    "window_event_gaps",          # NTZ fix
    "window_sessionize_events",   # NTZ fix
    "multimodal_feature_rollup",  # gained image_png decode rows in r5
]

_DEFERRED_FROM_R4 = [
    "q16_supplier_count_by_parttype", "window_cumulative_distribution",
    "window_mom_revenue_change", "window_trailing7d_customer_spend",
    "timeseries_gap_fill", "stats_robust_outliers", "text_top_terms",
    "events_user_type_entropy",
]

# Most recent green row is round 3 (CORRECTNESS_r03.json); the first
# 36 fill the 50-slot window, the rest lead round 6.
_R3_GREEN = [
    "stats_approx_percentiles", "text_fingerprints",
    "dedup_ngram_jaccard_pairs", "dedup_jaccard_clusters",
    "stats_corr_price_quantity", "stats_percentiles_order_value",
    "sample_stratified_by_segment", "sketch_hll_weekly_users",
    "window_ranking_variants", "window_first_last_order",
    "subquery_correlated_max_order", "subquery_in_top_nations",
    "sample_hash_deterministic", "histogram_order_values",
    "q10_returned_items", "q2ish_min_cost_supplier",
    "sql_api_grouping_sets", "array_norm_stats_by_label",
    "array_dimension_profile", "string_close_part_names",
    "funnel_signup_purchase", "cohort_daily_retention",
    "dedup_exact_vocab_groups", "q1_pricing_summary",
    "q3_shipping_priority", "q5_regional_volume",
    "join_outer_customer_orders", "join_semi_customers_with_purchases",
    "join_anti_customers_without_orders", "agg_rollup_nation_segment",
    "agg_cube_status_priority", "agg_distinct_users_per_type",
    "agg_approx_distinct_users", "setop_nations_customers_vs_suppliers",
    "setop_except_nations", "setop_union_all_keys",
    "pivot_user_event_matrix", "unpivot_lineitem_measures",
    "scalar_dates_monthly_revenue", "scalar_strings_part_brands",
    "scalar_json_props_extract", "topk_customers_by_spend",
    "resilience_nation_revenue", "shock_sim_nation_revenue",
    "forecast_nation_revenue", "sim_topk_bruteforce",
    "dedup_embedding_neardup",
]

_VERIFY_FIRST = [
    *_CHANGED_R5,
    *_DEFERRED_FROM_R4,
    *_R3_GREEN,
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
