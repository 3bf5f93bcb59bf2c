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
    pending_r10,
    relational,
    resilience_star,
    similarity,
    text,
    tpch,
    web,
    windows,
    windows2,
)

# Round-10 registrations: the seven kernels staged through r8/r9 with
# oracle-parity tests but no driver surface (entity resolution,
# k-anonymity, weighted reservoir, AUC + threshold sweep, late-data
# audit, graph ANN) — see queries/pending_r10.py.
pending_r10.register_all()

# Round-10 window (the driver oracle-checks the FIRST 50 registry
# entries per round, insertion order):
#
#   1. _NEW_R10: the seven round-10 registrations — never-checked, so
#      the freshness guard requires them to LEAD the window
#      (sim_graph_ann_topk is rows-only by design: iterative graph
#      traversal has no SQL twin; recall/determinism pinned in
#      tests/test_graphann.py).
#   2. _CHANGED_R10: plan changes to already-green queries, each
#      re-verified hash-green locally at sf0.01 — the five r9 plan
#      changes (see r9 notes below) plus the three r10 ones
#      (connected_components filtering reduction feeds
#      dedup_cluster_canonical_docs / sample_leakage_free_split,
#      already in the r9 queue).
#   3. _SPILLED_R9: the last 3 r6-fills that spilled past r9's 50-cut
#      (owed: the r9 window promised them the r10 lead).
#   4. _FILL_R10: the 35 oldest-green ORACLE-BACKED queries (22 r6 +
#      13 r7, file order) — computed mechanically from the
#      CORRECTNESS history. Rows-only-by-design queries with an
#      existing driver row are EXEMPT from the stale horizon as of
#      r10 (r9 verdict item 3 / task 4): a repeat row adds no signal
#      beyond rows-ran, so their slots go to hash-checkable queries
#      (the window holds 49 oracle-backed entries + the one
#      never-checked rows-only registration).
#
# r9 plan-change notes (verified hash-green at sf0.01 locally):
#   sim_knn_label_spread — vote window -> max_by aggregate + corpus
#     pre-partition (4.75 -> 0.75 s steady-state, unchanged hash)
#   merge_into_customer_balances — NULL clause-condition coalesce
#   text_url_canonical_dedup — BOTH sides now split on the FIRST '?'
#   dedup_cluster_canonical_docs / sample_leakage_free_split —
#     connected_components integral-dtype gate (long output both
#     paths); in r10 also the filtering-reduction closure
_NEW_R10 = [
    "er_customer_golden_records",
    "privacy_kanon_events",
    "sample_weighted_reservoir_docs",
    "eval_quality_auc",
    "eval_quality_threshold_sweep",
    "stream_late_data_audit",
    "sim_graph_ann_topk",
]

_CHANGED_R10 = [
    "sim_knn_label_spread",
    "merge_into_customer_balances",
    "text_url_canonical_dedup",
    "dedup_cluster_canonical_docs",
    "sample_leakage_free_split",
]

_SPILLED_R9 = [
    "pivot_user_event_matrix",
    "unpivot_lineitem_measures",
    "scalar_dates_monthly_revenue",
]

_FILL_R10 = [
    # newest green r6, CORRECTNESS_r06 file order
    "range_join_event_windows", "scalar_strings_part_brands",
    "scalar_json_props_extract", "topk_customers_by_spend",
    "resilience_nation_revenue", "shock_sim_nation_revenue",
    "forecast_nation_revenue", "text_repetition_scores",
    "text_doc_entropy", "text_pii_scrub",
    "cdc_scd2_user_state_history", "cdc_scd2_state_asof",
    "text_token_stats", "text_quality_scores",
    "text_lang_id_confusion", "text_punct_and_bpe",
    "q4_order_priority", "q6_forecast_revenue",
    "q7_nation_volume", "q8_market_share",
    "q14_promo_revenue", "q15_top_supplier",
    # newest green r7, CORRECTNESS_r07 file order
    "dedup_embedding_neardup", "dedup_remove_repeated_spans",
    "dedup_embedding_neardup_lsh", "dedup_pipeline_accounting",
    "sample_topk_weighted_per_source", "q18_large_orders",
    "q19_bracketed_revenue", "q9_product_profit",
    "q20_promo_heavy_suppliers", "q21_sole_late_suppliers",
    "q11ish_part_value_share", "q13_customer_order_distribution",
    "q17_small_quantity_revenue",
]

_VERIFY_FIRST = [
    *_NEW_R10,
    *_CHANGED_R10,
    *_SPILLED_R9,
    *_FILL_R10,
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
