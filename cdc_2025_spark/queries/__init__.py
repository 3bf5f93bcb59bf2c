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

# Round-12 window (the driver oracle-checks the FIRST 50 registry
# entries per round, insertion order), composed mechanically from
# tools/compose_window.py (registry 210 -> derived horizon 5; zero
# r7/r8 rows expire after r12, so the fill is pure oldest-green):
#
#   1. _NEW_R12: the twenty round-12 registrations (all oracle-backed)
#      plus the audio near-dup registration (rows-only by design:
#      audio decode has no SQL twin; accuracy pinned against a python
#      set model in tests/test_afp.py) — never-checked, so the
#      freshness guard requires them to LEAD the window. Three of the
#      twenty changed after staging and were re-verified parity-green
#      at sf0.001 + sf0.01 before registration: stats_spearman (two-
#      level bucketed distributed ranks), forecast_conformal (small-
#      sample types visible with q_hat NULL), stats_chi2 (NULLIF dof
#      guard) — all inside the lead block anyway.
#   2. _CHANGED_R12: two rows-only queries changed output this round
#      and re-enter the window for fresh driver rows —
#      multimodal_feature_rollup grew two kind rows
#      (image_png_lowdepth through the new sub-byte PNG decode path;
#      audio_g711 through the new ITU mu-law/A-law branch of
#      decode_wav), and multimodal_video_neardup grew the
#      cross-family GIF trio (animated GIF + prefix + DIB-AVI of its
#      decoded frames: 7 -> 10 pinned pairs, test_avi.py).
#   3. _FILL_R12: the oldest-green ORACLE-BACKED queries — all 27
#      r8-greens, CORRECTNESS file order — the tool's emitted list
#      with the last two slots ceded to the changed re-checks.
_NEW_R12 = [
    "multimodal_audio_neardup",
    *pending_r12.PENDING_ORDER,
]

_CHANGED_R12 = [
    "multimodal_feature_rollup",
    "multimodal_video_neardup",
]

_FILL_R12 = [
    # newest green r8, compose_window.py order (all 27)
    "stats_analyze_lineitem", "sketch_kmv_distinct_overlap",
    "stats_join_skew_advisor", "stats_equidepth_histogram",
    "stats_join_cardinality_estimate", "mine_frequent_event_sets",
    "mine_association_rules", "events_markov_transitions",
    "dedup_containment_pairs", "sim_hard_negatives",
    "dedup_minhash_bbit_estimates", "dedup_source_overlap_matrix",
    "dedup_snapshot_diff", "graph_triangle_stats",
    "sample_dsir_importance", "sample_reservoir_bottomk",
    "quality_expectations_audit", "text_bm25_search",
    "text_bigram_perplexity", "text_vocab_coverage",
    "text_clean_normalize", "text_pmi_collocations",
    "text_quality_yield_curve", "corpus_datacard",
    "text_trigram_stupid_backoff", "text_blocklist_filter",
    "timeseries_seasonal_decompose",
]

_VERIFY_FIRST = [
    *_NEW_R12,
    *_CHANGED_R12,
    *_FILL_R12,
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
