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
    pending_r15,
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

# Round-15 registrations: the twenty-eight regression-diagnostic,
# rank-agreement, lexical-estimator, link-analysis and lakehouse-
# layer queries staged through r14 with full DuckDB oracles and
# both-SF driver-strength parity tests (Durbin-Watson,
# Breusch-Pagan, Chow, Cox-Stuart, Bartels-von Neumann, Mood's
# median, Kendall's W, Friedman, Cochran's Q, MRR, RBO, Honore/
# Sichel, Good-Turing/Chao1, readability, G2 keyness, Kish design
# effect, Katz centrality, HITS, reciprocity, PACF, Theil's U,
# Page-Hinkley, runs up/down, Markov stationary) plus the four
# lakehouse DML-layer audits (optimize/DML/merge/constraints — the
# r14-built copy-on-write layer's driver proof) — see
# queries/pending_r15.py.
pending_r15.register_all()

# Round-15 window (the driver oracle-checks the FIRST 50 registry
# entries per round, insertion order), composed mechanically from
# tools/compose_window.py 28 (registry 279 -> derived horizon 6;
# the one would-be-stale row, text_chunk_documents, heads the fill):
#
#   1. _NEW_R15: the twenty-eight round-15 registrations, all
#      oracle-backed, parity-green at sf0.001 + sf0.01 under the
#      driver-strength comparator (now hoisted into
#      queries/driver_model.py and shared with the rehearsal tool
#      and the registry-wide type guard — r14 ADVICE).
#   2. _CHANGED_R15: two rows-only queries converted to full-pipeline
#      DuckDB oracles this round and re-enter for their first
#      hash-checked driver rows — sim_lsh_auto_pairs (the oracle
#      re-derives the auto geometry from the corpus count in SQL and
#      dispatches to a literal hyperplane pipeline baked per
#      driver-visible geometry) and dedup_minhash_oph_pairs (new
#      oph_md5 family: OPH binning + optimal densification with every
#      hash derived from md5, the md5_km precedent — xxhash64 stays
#      the library scale default).
#   3. _FILL_R15: the oldest-green ORACLE-BACKED queries — the one
#      r9-green stale-risk row plus 19 r10-greens in
#      compose_window.py's emitted order.
_NEW_R15 = [
    *pending_r15.PENDING_ORDER,
]

_CHANGED_R15 = [
    "sim_lsh_auto_pairs",
    "dedup_minhash_oph_pairs",
]

_FILL_R15 = [
    # compose_window.py 28 emitted order (first 20)
    "text_chunk_documents", "dedup_embedding_neardup",
    "sim_knn_label_spread", "dedup_embedding_neardup_lsh",
    "dedup_remove_repeated_spans", "dedup_pipeline_accounting",
    "dedup_cluster_canonical_docs", "sample_leakage_free_split",
    "sample_topk_weighted_per_source", "pivot_user_event_matrix",
    "unpivot_lineitem_measures", "scalar_dates_monthly_revenue",
    "scalar_strings_part_brands", "scalar_json_props_extract",
    "topk_customers_by_spend", "merge_into_customer_balances",
    "resilience_nation_revenue", "shock_sim_nation_revenue",
    "forecast_nation_revenue", "text_token_stats",
]

_VERIFY_FIRST = [
    *_NEW_R15,
    *_CHANGED_R15,
    *_FILL_R15,
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
