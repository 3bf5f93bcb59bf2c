"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The registry itself lives in cdc_2025_spark.queries — one entry per
implemented operator from SURVEY.md §2 plus the LLM-data-pipeline
extensions; see that package for per-query scale notes and oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_2025_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    resilience metrics (drawdown + recovery around a shock year)
    computed over the star schema; driver checks rows > 0."""
    return QUERIES["resilience_nation_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed/aggregate column is aliased to match ``oracle_sql``.
    """
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query. The hash-based dedup
    and similarity operators carry FULL oracles via engine-portable
    constructions (md5-simhash, Kirsch-Mitzenmacher minhash, literal
    hyperplane LSH); the intentionally-omitted rest are inherently
    non-SQL (iterative k-means/IVF, approximate sketches, multimodal
    decode) -> rows-only driver check, with recall/determinism pinned
    in tests/ instead."""
    return dict(ORACLES)
