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

# Round-6 window (the driver oracle-checks the FIRST 50 registry
# entries per round, insertion order). Composition:
#
#   1. Queries materially CHANGED in round 6, which must (re)check
#      despite a previous green row: the new LSH-edged near-dup
#      decision table, the budget-derived audit-sample rewrite (same
#      output at sf0.01, new in-plan pct arithmetic + oracle), the
#      decontam oracle's zero-norm guard, the interval join's
#      inverted-interval filter, and the rollup's new image_jpeg row.
#   2. The 17 queries whose newest green is round 3 — the r5 window's
#      natural tail (entries 31-47 of the old r3 block). After these
#      check in r6, no registered query's newest CORRECTNESS row is
#      older than round 4.
#   3. The oldest r4-green queries, in their r4 order, filling the
#      window: 5 + 17 + 28 = 50 (the window cuts inside _R4_GREEN at
#      q15_top_supplier). The remaining 14 r4-green entries plus the
#      r5-green block lead round 7.
_CHANGED_R6 = [
    "dedup_embedding_neardup_lsh",   # NEW in r6: never driver-checked
    "sim_pairs_above_threshold",     # fixed pct -> budget-derived pct
    "decontam_embedding_crosssplit",  # oracle zero-norm guard
    "range_join_event_windows",      # inverted-interval guard in plan
    "multimodal_feature_rollup",     # gained image_jpeg decode row
]

# newest green is round 3 (CORRECTNESS_r03.json) — front of the line
_R3_TAIL = [
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

# newest green is round 4; first 28 (r4 check order) fill the window
_R4_GREEN = [
    "text_repetition_scores", "text_doc_entropy", "text_pii_scrub",
    "llm_corpus_prep", "cdc_scd2_user_state_history",
    "cdc_scd2_state_asof", "sample_train_val_test_split",
    "sample_domain_mixture_weights", "dedup_repeated_spans",
    "sim_ivf_topk", "stats_moments_by_segment",
    "agg_order_array_per_customer", "dedup_prefix_jaccard_pairs",
    "dedup_incremental_new_docs", "text_decontamination_overlap",
    "sample_weighted_by_tokens", "text_pack_sequences",
    "sim_kmeans_cell_profile", "text_token_stats",
    "text_quality_scores", "text_lang_id_confusion",
    "text_punct_and_bpe", "q4_order_priority", "q6_forecast_revenue",
    "q7_nation_volume", "q8_market_share", "q14_promo_revenue",
    "q15_top_supplier", "q18_large_orders", "q19_bracketed_revenue",
    "q9_product_profit", "q20_promo_heavy_suppliers",
    "q21_sole_late_suppliers", "q11ish_part_value_share",
    "q13_customer_order_distribution", "q17_small_quantity_revenue",
    "q22_dormant_rich_customers", "skewjoin_salted_event_types",
    "window_top3_orders_per_customer", "window_running_spend",
    "asof_last_signup_before_purchase", "q12_priority_by_linestatus",
]

_VERIFY_FIRST = [
    *_CHANGED_R6,
    *_R3_TAIL,
    *_R4_GREEN,
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
