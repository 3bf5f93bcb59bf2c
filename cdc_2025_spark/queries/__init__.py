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
    pending_r12,
    pending_r13,
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

# Round-12 registrations: the twenty temporal-anomaly & structure
# queries staged through r11 with full DuckDB oracles and both-SF
# parity tests (EWMA, STL, binseg, label propagation, JL audit, runs
# test, seasonal-naive backtest, bootstrap CI, Kaplan-Meier, Gini,
# chi2, k-core, BH-FDR, isotonic, Fano, Theil, Spearman,
# Kruskal-Wallis, IVM, conformal) — see queries/pending_r12.py.
pending_r12.register_all()

# Round-13 registrations: the twenty evaluation-depth & robust-
# statistics queries staged through r12 with full DuckDB oracles and
# both-SF parity tests (average precision, Brier/Murphy decomposition,
# lift/gains, Theil-Sen, partial correlation, Welch t, winsorized/
# trimmed means, Brown-Forsythe, periodogram, Brown DES backtest,
# local clustering, link prediction, assortativity, Nelson-Aalen,
# l-diversity, Simpson diversity, sentence stats, effect sizes, PPS
# systematic, MCC/kappa) plus the round-13-built versioned_diff_audit
# (the lakehouse layer's driver surface) — see queries/pending_r13.py.
pending_r13.register_all()

# Round-13 window (the driver oracle-checks the FIRST 50 registry
# entries per round, insertion order), composed mechanically from
# tools/compose_window.py (registry 231 -> derived horizon 5; zero
# rows expire after r13, so the fill is pure oldest-green):
#
#   1. _NEW_R13: survival_km_reorder RE-LEADS — the repo's only red
#      CORRECTNESS row (r12: rows/schema matched, hash did not;
#      locally unreproducible). Both cheap hardenings from the r12
#      verdict are applied (final ORDER BY in KM_ORACLE + survival at
#      the registry's 4dp round-aggregates precision in both
#      engines); with no green row ever, the freshness guard counts
#      it never-checked, and the verdict's instruction is to lead
#      the window with it. Then the twenty-one round-13
#      registrations (20 staged eval/robust-stats queries +
#      versioned_diff_audit, all oracle-backed, parity-green at
#      sf0.001 + sf0.01).
#   2. _CHANGED_R13: five green queries changed plan or output this
#      round and re-enter for fresh driver rows — the KS drift ECDF
#      migrated onto functions/ranks.py bucketed_cumsums (the last
#      unpartitioned corpus-growing cumulative, r12 verdict task 3);
#      spearman (NULLIF zero-variance guard + the midranks-as-
#      cumsums wrapper), Kruskal-Wallis and the equi-depth histogram
#      (same wrapper + the edges auto-switch) — values identical,
#      plans not; and multimodal_audio_neardup's pinned corpus grew
#      the two r13 adversarial controls (5 -> 7 pairs, rows-only).
#   3. _FILL_R13: the oldest-green ORACLE-BACKED queries — 23
#      r9-greens in compose_window.py's emitted order.
_NEW_R13 = [
    "survival_km_reorder",
    *pending_r13.PENDING_ORDER,
]

_CHANGED_R13 = [
    "stats_ks_drift_segments",
    "stats_spearman_price_quantity",
    "stats_kruskal_wallis_segments",
    "stats_equidepth_histogram",
    "multimodal_audio_neardup",
]

_FILL_R13 = [
    # oldest green (r9), compose_window.py order (first 23)
    "stats_moments_by_segment", "stats_percentiles_order_value",
    "agg_order_array_per_customer", "sample_stratified_by_segment",
    "window_ranking_variants", "window_first_last_order",
    "subquery_correlated_max_order", "subquery_in_top_nations",
    "sample_hash_deterministic", "histogram_order_values",
    "q10_returned_items", "q2ish_min_cost_supplier",
    "sql_api_grouping_sets", "sample_train_val_test_split",
    "sketch_cms_heavy_terms", "array_norm_stats_by_label",
    "array_dimension_profile", "string_close_part_names",
    "funnel_signup_purchase", "cohort_daily_retention",
    "dedup_exact_vocab_groups", "dedup_prefix_jaccard_pairs",
    "dedup_incremental_new_docs",
]

_VERIFY_FIRST = [
    *_NEW_R13,
    *_CHANGED_R13,
    *_FILL_R13,
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
