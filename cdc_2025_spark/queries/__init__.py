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
  DuckDB's year()/month() return BIGINT — oracles cast to INTEGER;
  decimal literals (VALUES (0.83)) type as DECIMAL — cast to DOUBLE.
  The driver's value hash is TYPE-SENSITIVE (int128 != int64 even at
  equal values — the survival_km_reorder r12/r13 lesson), so every
  oracle output column must land in the driver-safe type set;
  tests/test_oracle_parity.py::test_oracle_output_types_driver_safe
  guards the whole registry and tools/window_check.py flags it at
  rehearsal time.
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
    pending_r14,
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

# Round-14 registrations: the twenty ranking-quality & long-memory
# diagnostics staged through r13 with full DuckDB oracles and both-SF
# parity tests (NDCG@100, ECE/MCE, KS score separation, Mann-Whitney
# U, Kendall tau-b, OLS trend + t-test, Jarque-Bera, Grubbs ESD,
# Ljung-Box, two-proportion z, Neyman allocation, t-closeness,
# Yule's K, JS term drivers, conditional entropy, rich club, Cronbach
# alpha, Hurst R/S, balanced downsample) plus versioned_skipping_audit
# (the data-skipping layer's driver proof) — see
# queries/pending_r14.py.
pending_r14.register_all()

# Round-14 window (the driver oracle-checks the FIRST 50 registry
# entries per round, insertion order), composed mechanically from
# tools/compose_window.py 27 (registry 251 -> derived horizon 6; the
# one would-be-stale row, multimodal_phash_neardup, sits in _CHANGED):
#
#   1. _NEW_R14: survival_km_reorder RE-LEADS a third time — r13
#      root-caused the two-round hash-red to the ORACLE's typing
#      (DuckDB SUM(BIGINT) widened n_risk to HUGEINT; the driver's
#      value hash is type-sensitive), fixed this round with the same
#      CAST(... AS BIGINT) the green Nelson-Aalen sibling carries,
#      and a registry-wide oracle-type guard test now rejects any
#      driver-unsafe output type at staging time. Then the twenty
#      round-14 registrations (19 staged ranking-quality/long-memory
#      queries + versioned_skipping_audit, all oracle-backed,
#      parity-green at sf0.001 + sf0.01).
#   2. _CHANGED_R14: six green queries changed oracle or plan this
#      round and re-enter for fresh driver rows — the four
#      deterministic multimodal queries graduated from rows-only to
#      literal VALUES-table oracles (feature rollup + phash/video/
#      audio near-dup; outputs unchanged, oracle status not),
#      skewjoin's oracle weight column cast DECIMAL(3,1) -> DOUBLE
#      (the type-guard's one other hit), and versioned_diff_audit
#      now session-memoizes its scratch table (ADVICE r13) while
#      read_versioned pins the manifest schema.
#   3. _FILL_R14: the oldest-green ORACLE-BACKED queries — 23
#      r9-greens in compose_window.py's emitted order (phash, the
#      list's head, already re-enters via _CHANGED).
_NEW_R14 = [
    "survival_km_reorder",
    *pending_r14.PENDING_ORDER,
]

_CHANGED_R14 = [
    "multimodal_feature_rollup",
    "multimodal_phash_neardup",
    "multimodal_video_neardup",
    "multimodal_audio_neardup",
    "skewjoin_salted_event_types",
    "versioned_diff_audit",
]

_FILL_R14 = [
    # oldest green (r9), compose_window.py order (first 23 after
    # skipping the _CHANGED member at the head)
    "dedup_incremental_bloom_prefilter", "sim_topk_bruteforce",
    "sim_pairs_above_threshold", "dedup_repeated_spans",
    "graph_bfs_trade_hops", "text_decontamination_overlap",
    "sample_weighted_by_tokens", "text_pack_sequences",
    "llm_corpus_prep", "sample_domain_mixture_weights",
    "decontam_embedding_crosssplit", "q1_pricing_summary",
    "q3_shipping_priority", "q5_regional_volume",
    "join_outer_customer_orders", "join_semi_customers_with_purchases",
    "join_anti_customers_without_orders", "agg_rollup_nation_segment",
    "agg_cube_status_priority", "agg_distinct_users_per_type",
    "setop_nations_customers_vs_suppliers", "setop_except_nations",
    "setop_union_all_keys",
]

_VERIFY_FIRST = [
    *_NEW_R14,
    *_CHANGED_R14,
    *_FILL_R14,
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
