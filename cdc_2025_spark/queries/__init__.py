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
    graph,
    llmdata,
    multimodal,
    relational,
    resilience_star,
    similarity,
    text,
    tpch,
    web,
    windows,
    windows2,
)

# Round-9 window (the driver oracle-checks the FIRST 50 registry
# entries per round, insertion order). Round 9 is the owed
# verification-rotation round (VERDICT.md r8 item 1): ZERO new
# registrations; the window repays the re-check backlog that r8's 48
# registrations pushed past the 50-cut.
#
#   1. _STALE_R9: the 25 queries whose newest green row is r5 —
#      copied verbatim from the r7 guard output (they were the
#      _STALE_R8 list; r8's full window of new registrations evicted
#      them). At horizon 4 they MUST re-check this round.
#   2. _CHANGED_R8: plan/oracle changes from round 8 that were only
#      locally re-verified (hash-green at sf0.01, 2026-08-15).
#   3. _CHANGED_R9: graph_bfs_trade_hops gains a full DuckDB
#      recursive-CTE oracle this round (VERDICT r8 item 4) — its row
#      must flip rows-only -> hash-green, so it takes a window slot.
#   4. _R6_FILL: newest-green-r6 queries fill the remaining 21 slots;
#      the last 3 spill past the 50-cut and lead the round-10 window
#      (legal: at r10 the guard needs green >= r6, which they hold).
_STALE_R9 = [
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

_CHANGED_R8 = [
    "text_chunk_documents",          # null-text guard both sides
    "dedup_incremental_bloom_prefilter",  # KM h2 nonzero fix
    "sketch_cms_heavy_terms",        # cms_params cross-reference
]

_CHANGED_R9 = [
    "graph_bfs_trade_hops",          # oracle added: recursive CTE
]

# Plan changes made in r9 to queries already green in r8 — each
# re-verified hash-green against its oracle at the driver's sf0.01
# locally; the r9 window is fully owed to the rotation backlog, so
# they FRONT-LOAD the round-10 window (same posture as r8's
# _CHANGED_R8 trio):
#   sim_knn_label_spread — vote window -> max_by aggregate + corpus
#     pre-partition (4.75 -> 0.75 s steady-state, unchanged hash)
#   merge_into_customer_balances — NULL clause-condition coalesce
#   text_url_canonical_dedup — BOTH sides now split on the FIRST '?'
#     (Spark: substring from instr; oracle: substr from position)
#   dedup_cluster_canonical_docs / sample_leakage_free_split —
#     connected_components integral-dtype gate (long output both paths)
_CHANGED_R10_QUEUE = [
    "sim_knn_label_spread",
    "merge_into_customer_balances",
    "text_url_canonical_dedup",
    "dedup_cluster_canonical_docs",
    "sample_leakage_free_split",
]

# newest green is round 6, oldest-first per CORRECTNESS_r06 order;
# the leading 21 fill the window to the 50 cut, the last 3 lead r10
_R6_FILL = [
    "stats_moments_by_segment", "agg_order_array_per_customer",
    "sample_train_val_test_split", "dedup_prefix_jaccard_pairs",
    "dedup_incremental_new_docs", "sim_topk_bruteforce",
    "sim_pairs_above_threshold", "sim_kmeans_cell_profile",
    "dedup_repeated_spans", "text_decontamination_overlap",
    "sample_weighted_by_tokens", "text_pack_sequences",
    "llm_corpus_prep", "sample_domain_mixture_weights",
    "decontam_embedding_crosssplit", "agg_cube_status_priority",
    "agg_distinct_users_per_type", "agg_approx_distinct_users",
    "setop_nations_customers_vs_suppliers", "setop_except_nations",
    "setop_union_all_keys", "pivot_user_event_matrix",
    "unpivot_lineitem_measures", "scalar_dates_monthly_revenue",
]

_VERIFY_FIRST = [
    *_STALE_R9,
    *_CHANGED_R8,
    *_CHANGED_R9,
    *_R6_FILL,
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
