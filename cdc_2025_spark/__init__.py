"""cdc_2025_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the capabilities of the
reference repo ``Rajin6767/cdc-2025`` (an eager-pandas pipeline over
BEA Space Economy data: Excel ETL -> tidy fact table -> per-industry
resilience metrics -> top-k dashboard views), extended with the
operator surface a large-scale training-data pipeline needs:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
embedding similarity search, text analysis, multimodal column
plumbing, and a Structured-Streaming CDC slice.

Design stance (SURVEY.md §1.5/§4): declarative DataFrame plans only —
Catalyst/Tungsten pick physical strategies; Python UDFs never on hot
paths; Arrow-batched pandas UDFs where the built-ins genuinely cannot
express the semantics.
"""

from cdc_2025_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
