"""Arbitrary stateful streaming via applyInPandasWithState — the
escape hatch for operators windowed aggregation can't express
(SURVEY.md §2.8: "arbitrary state").

``stateful_user_totals`` keeps one tiny state row per user (count,
value sum, last seen ts) and emits the updated totals whenever a
microbatch touches the user. This is the canonical shape for
running-profile operators (fraud counters, per-entity rate trackers,
online feature stores).

Scale notes: state lives in the executor state store partitioned by
the grouping key — the shuffle per batch moves only that batch's
events, and state size is O(|distinct users|), not O(|events|).
Arrow moves each group's rows JVM->Python once per batch. For pure
windowed aggregates prefer streaming/windows.py (no Python, no
per-key state row); this operator is for logic that genuinely needs
read-modify-write state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

USER_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("last_ts_us", LongType()),  # epoch micros; state
        # rows can't carry timestamps portably across state-store
        # encodings, so the state keeps an integer
    ]
)


def _update_user(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        if len(pdf):
            last_us = max(
                last_us, int(pdf["ts"].max().value // 1000)
            )
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user totals over a streaming events frame; emits
    the updated (user_id, n_events, total_value, last_ts) row for
    every user a microbatch touches. Unstarted — caller picks sink;
    requires outputMode('update')."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=USER_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
