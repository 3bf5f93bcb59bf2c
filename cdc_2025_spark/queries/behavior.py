"""Behavioral/event analytics: funnel conversion, cohort retention,
and inter-event timing — the event-stream query family a training-data
or product pipeline runs over the events table.

All are single-pass window/aggregate shapes: one shuffle on user_id,
then per-user ordered logic inside the partition — the layout that
scales linearly with event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_2025_spark.io import read_table
from cdc_2025_spark.queries.registry import query


@query(
    "funnel_signup_purchase",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(first_signup) AS BIGINT) AS n_signed_up,
           CAST(SUM(CASE WHEN first_purchase > first_signup
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           ROUND(SUM(CASE WHEN first_purchase > first_signup
                          THEN 1 ELSE 0 END) * 1.0
                 / NULLIF(COUNT(first_signup), 0), 4) AS conversion_rate
    FROM per_user
    """,
)
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel: users whose first purchase follows their first
    signup. One conditional-min aggregate per user (map-side partial),
    one global roll-up — no window sort, no self-join."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    converted = F.when(
        F.col("first_purchase") > F.col("first_signup"), 1
    ).otherwise(0)
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("first_signup").alias("n_signed_up"),
        F.sum(converted).alias("n_converted"),
        F.round(
            F.sum(converted)
            / F.nullif(F.count("first_signup"), F.lit(0)),
            4,
        ).alias("conversion_rate"),
    )


@query(
    "cohort_daily_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_day, CAST(day_offset AS INTEGER) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    """,
)
def cohort_daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted as
    active on each subsequent day offset (first week). The firsts
    aggregate and the activity join share the user_id shuffle key, so
    the join is co-partitioned (no extra exchange of the big side)."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .filter(F.col("day_offset") <= 7)
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count("*").alias("n_active")
    )


@query(
    "interevent_timing_stats",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_type,
             EPOCH(ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               AS gap_s
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
           ROUND(AVG(gap_s), 4) AS mean_gap_s,
           ROUND(quantile_cont(gap_s, 0.5), 4) AS median_gap_s
    FROM gaps
    GROUP BY event_type
    """,
)
def interevent_timing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution per event type: lag over the
    per-user timeline (unique tiebreak on event_id for determinism),
    then mean/median per type."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # cast through timestamp_ltz: parquet timestamps written without
    # UTC adjustment read back as TIMESTAMP_NTZ (Spark 4 inference),
    # which cannot cast straight to double; ltz->double is epoch
    # seconds and the NTZ->LTZ shift cancels in the difference
    epoch = F.col("ts").cast("timestamp_ltz").cast("double")
    lag_epoch = F.lag("ts").over(w).cast("timestamp_ltz").cast("double")
    gaps = ev.withColumn("gap_s", epoch - lag_epoch)
    return gaps.groupBy("event_type").agg(
        F.count("gap_s").alias("n_gaps"),
        F.round(F.avg("gap_s"), 4).alias("mean_gap_s"),
        F.round(F.percentile("gap_s", F.lit(0.5)), 4).alias("median_gap_s"),
    )
