"""Physical-plan introspection helpers — the debugging surface for
the scale properties the engine promises (pushdown, pruning,
broadcast, exchange counts). Used by tests/test_plan_shape.py and
tests/test_partitioning.py; useful interactively when tuning a query.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The plan `df.explain(mode)` would print, as a string.

    ``mode='formatted'`` shows scan details (PushedFilters,
    PartitionFilters, ReadSchema) but prints each node twice (tree +
    detail block); ``mode='simple'`` prints each node once — use it
    when counting nodes (e.g. Exchanges).
    """
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        if mode == "simple":
            df.explain()
        else:
            df.explain(mode)
    return buf.getvalue()


def scan_detail(df: DataFrame, key: str) -> list[str]:
    """All occurrences of a scan-detail line (e.g. 'PushedFilters',
    'ReadSchema', 'PartitionFilters') in the formatted plan."""
    return [
        line.strip()
        for line in plan_string(df).splitlines()
        if key in line
    ]


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle/broadcast) nodes in the plan —
    the first thing to check when a query regresses at scale."""
    return plan_string(df, mode="simple").count("Exchange")
