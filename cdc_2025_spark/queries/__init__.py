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
    pending_r11,
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

# Round-11 registrations: the twelve drift & corpus-law diagnostics
# staged through r10 with full DuckDB oracles and both-SF parity tests
# (KS, PSI, CUSUM, Zipf, Heaps, calibration, SQ8 audit, JS divergence,
# ACF, Benford, Mann-Kendall, HHI) — see queries/pending_r11.py.
pending_r11.register_all()

# Round-11 window (the driver oracle-checks the FIRST 50 registry
# entries per round, insertion order):
#
#   1. _NEW_R11: the twelve round-11 registrations (all oracle-backed)
#      plus the video near-dup registration (rows-only by design:
#      container decode has no SQL twin; accuracy pinned against a
#      python set model in tests/test_avi.py) — never-checked, so the
#      freshness guard requires them to LEAD the window.
#   2. _CHANGED_R11: plan changes from the r10 post-close perf session,
#      each re-verified parity-green locally at sf0.001 + sf0.01:
#      text_winnowing_fingerprints (zero-shuffle array rewrite),
#      text_ngram_novelty (owner-carrying aggregate, join-back
#      eliminated), sim_lsh_auto_pairs (rows-only; expr-built planes +
#      per-bucket numpy re-rank), graph_pagerank_trade_network
#      (FLIPPED rows-only -> oracle-backed via an unrolled 10-iteration
#      power-iteration CTE — its standing r8 driver row predates the
#      oracle, so this slot makes the flip driver-visible), and
#      llm_prep_full_ledger (shared minhash pair index, fused stages).
#      dedup_minhash_lsh_pairs and sim_lsh_bucketed_pairs also changed
#      (shared index / expr planes) but are r7-green and sit in the
#      fill below anyway.
#   3. _FILL_R11: the oldest-green ORACLE-BACKED queries — all 28
#      r7-greens not refreshed in the r10 window (at 189 registered
#      queries the derived horizon is 4 rounds, so r7 rows expire at
#      r12) plus the 4 oldest r8-greens, CORRECTNESS file order —
#      computed mechanically from the CORRECTNESS history.
_NEW_R11 = [
    *pending_r11.PENDING_ORDER,
    "multimodal_video_neardup",
]

_CHANGED_R11 = [
    "text_winnowing_fingerprints",
    "text_ngram_novelty",
    "sim_lsh_auto_pairs",
    "graph_pagerank_trade_network",
    "llm_prep_full_ledger",
]

_FILL_R11 = [
    # newest green r7, CORRECTNESS_r07 file order (all 28)
    "q22_dormant_rich_customers", "skewjoin_salted_event_types",
    "window_top3_orders_per_customer", "window_running_spend",
    "asof_last_signup_before_purchase", "q12_priority_by_linestatus",
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
    # newest green r8, CORRECTNESS_r08 file order (oldest 4 not in
    # the changed list above)
    "stats_source_length_drift", "sample_language_temperature",
    "text_quality_percentile_filter", "text_perplexity_buckets",
]

_VERIFY_FIRST = [
    *_NEW_R11,
    *_CHANGED_R11,
    *_FILL_R11,
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
