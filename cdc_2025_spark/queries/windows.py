"""Window functions and time-ordered operators (SURVEY.md §2.6 T1-T2
generalized): ranking, lag/lead deltas, running totals, sessionization,
and an as-of join — the operators the reference's per-group loops
foreshadow (resilience.py:30-66) done distributed.

All windows partition by a key, so the shuffle is a single hash
exchange on that key; within partitions Spark sorts once and evaluates
every frame in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_2025_spark.io import read_table
from cdc_2025_spark.queries.registry import query


def _r4(c):
    return F.round(c, 4)


@query(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def window_top3_orders_per_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-group top-k via ROW_NUMBER — the distributed form of the
    reference's sort+head pattern (T2). Unique tiebreak (o_orderkey)
    makes the result deterministic across engines.

    Scale: Spark 3.5+ inserts a WindowGroupLimit (per-partition rank
    pushdown) so each task keeps only 3 rows per key before the
    shuffle."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_event_gaps",
    oracle="""
    SELECT event_type,
           ROUND(AVG(gap_us), 4)              AS avg_gap_us,
           CAST(MAX(gap_us) AS BIGINT)        AS max_gap_us,
           CAST(COUNT(*) AS BIGINT)           AS n
    FROM (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id)
               AS gap_us
      FROM events
    )
    WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def window_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG over event time per user: inter-event gap statistics.

    Gaps are integer MICROSECONDS (unix_micros) — second-truncating
    unix_timestamp would disagree with the oracle's epoch_us on
    sub-second components. The ts column casts through timestamp_ltz
    first: parquet timestamps written without UTC adjustment read back
    as TIMESTAMP_NTZ (Spark 4 inference), which unix_micros rejects;
    the session timezone is pinned UTC (session.py) so the cast is an
    identity clock mapping, and differences cancel any shift anyway."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts").cast("timestamp_ltz")) - F.unix_micros(
        F.lag("ts").over(w).cast("timestamp_ltz")
    )
    return (
        ev.withColumn("gap_us", gap)
        .filter(F.col("gap_us").isNotNull())
        .groupBy("event_type")
        .agg(
            _r4(F.avg("gap_us")).alias("avg_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            F.count("*").alias("n"),
        )
    )


@query(
    "window_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS running_spend
    FROM orders
    """,
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per customer in order-date order (explicit ROWS
    frame + unique tiebreak so both engines accumulate identically)."""
    orders = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _r4(F.sum("o_totalprice").over(w)).alias("running_spend"),
    )


@query(
    "window_sessionize_events",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts)
                       - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                       > 1800000000
                       OR LAG(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def window_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: gap > 30 min starts a new session.

    The classic two-window pattern (mark boundaries with LAG, number
    sessions with a running SUM) — one shuffle on user_id, both
    windows share the same sort. The streaming twin of this operator
    is session_window() in streaming/windows.py.
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts").cast("timestamp_ltz")) - F.unix_micros(
        F.lag("ts").over(w).cast("timestamp_ltz")
    )
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = marked.withColumn(
        "session_id", F.sum("new_session").over(wrun).cast("long")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events")
    )


@query(
    "asof_last_signup_before_purchase",
    oracle="""
    SELECT p.event_id AS purchase_id,
           (SELECT s.event_id FROM events s
            WHERE s.user_id = p.user_id AND s.event_type = 'signup'
              AND s.ts <= p.ts
            ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS signup_id
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def asof_last_signup_before_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """As-of (backward) join: each purchase matched to the user's most
    recent signup at-or-before it — an operator Spark lacks natively,
    composed from a union + windowed last_value carry-forward.

    Scale: this is the shuffle-minimal formulation — ONE exchange on
    user_id over the union, then a single sorted window pass, instead
    of an O(n x m) range self-join. The reference's P7 point-lookup
    ("first row where Year == y") is the degenerate form of this.
    """
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_event")
    )
    unioned = purchases.withColumn("signup_event", F.lit(None).cast("long")).select(
        "user_id", "ts", "purchase_id", "signup_event"
    ).unionByName(
        signups.withColumn("purchase_id", F.lit(None).cast("long")).select(
            "user_id", "ts", "purchase_id", "signup_event"
        )
    )
    # Order signups before purchases at identical ts (s.ts <= p.ts is
    # inclusive); among same-ts signups the larger event_id wins, so
    # sort ascending and take the last non-null.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("signup_event").asc_nulls_last(), "purchase_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "last_signup", F.last("signup_event", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("purchase_id").isNotNull()).select(
        F.col("purchase_id"), F.col("last_signup").alias("signup_id")
    )


@query(
    "cdc_scd2_user_state_history",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, value, ts, event_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM events
    ),
    v AS (
      SELECT user_id, event_type, value, op,
             ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM c
    )
    SELECT user_id, event_type, value, valid_from, valid_to,
           (valid_to IS NULL) AS is_current
    FROM v WHERE op != 'D'
    """,
)
def cdc_scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history of per-user state, driving the streaming
    module's batch kernel (streaming/cdc.scd2_history) through the
    driver's oracle gate: the events log becomes a change stream
    (key = user_id, 'error' events are deletes, everything else
    upserts state), and every version carries its validity interval.

    One keyed window (lead over user_id) — the same plan shape the
    incremental/streaming form applies per microbatch; no global
    sort. The oracle is the identical LEAD formulation in DuckDB.
    """
    from cdc_2025_spark.streaming.cdc import scd2_history

    ev = read_table(spark, sf_dir, "events")
    changes = ev.select(
        "user_id",
        "event_type",
        "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("ts").alias("op_ts"),
        F.col("event_id").alias("_seq"),
    )
    return scd2_history(changes, ["user_id"], "op_ts")


SCD2_ASOF_TS = "2024-01-15 00:00:00"


@query(
    "cdc_scd2_state_asof",
    oracle=f"""
    WITH c AS (
      SELECT user_id, event_type, value, ts, event_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM events
    ),
    v AS (
      SELECT user_id, event_type, value, op,
             ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM c
    )
    SELECT user_id, event_type, value, valid_from, valid_to
    FROM v
    WHERE op != 'D'
      AND valid_from <= TIMESTAMP '{SCD2_ASOF_TS}'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '{SCD2_ASOF_TS}')
    """,
)
def cdc_scd2_state_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL over the SCD2 history: reconstruct every user's
    state as of one instant — one covering-interval filter
    (streaming/cdc.scd2_as_of), no window, no join; on a real
    deployment valid_from/valid_to partition-prune the history scan.
    Users whose last pre-instant event was a delete are absent, as
    they were live."""
    from cdc_2025_spark.streaming.cdc import scd2_as_of, scd2_history

    ev = read_table(spark, sf_dir, "events")
    changes = ev.select(
        "user_id",
        "event_type",
        "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("ts").alias("op_ts"),
        F.col("event_id").alias("_seq"),
    )
    hist = scd2_history(changes, ["user_id"], "op_ts")
    return scd2_as_of(hist, F.to_timestamp(F.lit(SCD2_ASOF_TS)))
