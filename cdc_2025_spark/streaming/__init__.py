"""Structured-Streaming surface: CDC apply-changes, windowed
aggregation with watermarks, streaming sessionization, and arbitrary
per-key state (applyInPandasWithState).

CDC capture itself is external (Debezium -> Kafka, or file drops from
an upstream extractor); this package consumes the change stream
(BASELINE.json: "Structured Streaming + CDC source").
"""

from cdc_2025_spark.streaming.cdc import (
    _recover_store,
    _swap_store,
    apply_changes_batch,
    apply_changes_scd2,
    cdc_scd2_stream,
    cdc_source,
    cdc_upsert_stream,
    scd2_history,
    scd2_merger,
    snapshot_merger,
)
from cdc_2025_spark.streaming.joins import (
    enrich_stream_with_dim,
    signup_to_purchase_within,
)
from cdc_2025_spark.streaming.stateful import stateful_user_totals
from cdc_2025_spark.streaming.windows import (
    session_window_counts,
    sliding_window_stats,
    stream_dedup,
    tumbling_window_stats,
)

__all__ = [
    "apply_changes_batch",
    "apply_changes_scd2",
    "cdc_scd2_stream",
    "cdc_source",
    "cdc_upsert_stream",
    "scd2_history",
    "scd2_merger",
    "snapshot_merger",
    "enrich_stream_with_dim",
    "session_window_counts",
    "signup_to_purchase_within",
    "sliding_window_stats",
    "stateful_user_totals",
    "stream_dedup",
    "tumbling_window_stats",
]
