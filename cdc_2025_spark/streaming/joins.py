"""Streaming joins: stream-static enrichment and watermarked
stream-stream interval joins (the two Structured Streaming join
modes; SURVEY.md §2.8 north-star surface).

Scale notes: a stream-static join re-plans the static side per
microbatch (broadcast when small — the dimension-enrichment pattern);
a stream-stream join buffers both sides in state bounded by the
watermark + interval bounds, so the time-range condition is not
optional at 100 TB — it is what makes state finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on: str = "event_type",
) -> DataFrame:
    """Stream-static inner join: each microbatch joins against the
    current static dim (broadcast by Catalyst when small). The dim is
    re-read per batch, so slowly-changing dims pick up updates."""
    return events.join(F.broadcast(dim), on)


def signup_to_purchase_within(
    events: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each signup matched to the same
    user's purchases within ``max_gap`` after it.

    Both sides carry watermarks and the join condition bounds the
    event-time range, so Spark can evict buffered state once the
    watermark passes signup_ts + max_gap — without the bound the
    state store would grow forever."""
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("signup_ts"),
        )
        .withWatermark("signup_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("signup_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("signup_ts") + F.expr(f"INTERVAL {max_gap}")
        ),
    ).select(
        F.col("s_user").alias("user_id"),
        "signup_ts",
        "purchase_ts",
        "purchase_value",
    )
