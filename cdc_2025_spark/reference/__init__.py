"""Reference-surface pipelines: BEA ETL + resilience metrics.

Spark-first re-expressions of the reference's two pipelines
(CDCPROJECT_(code_for_cleaning_data_set).ipynb and
src/features/resilience.py), verified against the committed golden
CSVs in tests/test_reference_parity.py.
"""

from cdc_2025_spark.reference.bea_ingest import (
    clean_merge,
    ingest_wide,
    melt_wide,
    pivot_wide,
)
from cdc_2025_spark.reference.resilience import (
    resilience_metrics,
    shock_simulation,
    top_k_fastest_recovery,
    top_k_worst_hit,
    trend_forecast,
)

__all__ = [
    "clean_merge",
    "ingest_wide",
    "melt_wide",
    "pivot_wide",
    "resilience_metrics",
    "shock_simulation",
    "top_k_fastest_recovery",
    "top_k_worst_hit",
    "trend_forecast",
]
