"""Second window/aggregate breadth batch: Q12/Q16 adaptations,
cumulative distribution, month-over-month deltas, corpus vocabulary,
and event-type entropy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_2025_spark.functions.text import tokens
from cdc_2025_spark.io import read_table
from cdc_2025_spark.queries.registry import query


def _r4(c):
    return F.round(c, 4)


@query(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped (l_linestatus standing in for shipmode):
    urgent-vs-other order counts per line status. Conditional sums in
    one pass; the year predicate prunes the fact scan."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q16_supplier_count_by_parttype",
    oracle="""
    SELECT p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13)
    GROUP BY p_type, p_size
    """,
)
def q16_supplier_count_by_parttype(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16-shaped: distinct suppliers per part type/size bucket
    (lineitem standing in for partsupp). Distinct-agg expands to a
    two-phase aggregate — dedup on (type, size, supp) first, then
    count — both phases map-side partial."""
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13)
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "window_cumulative_distribution",
    oracle="""
    SELECT c_mktsegment,
           ROUND(MIN(CASE WHEN cd >= 0.5 THEN c_acctbal END), 4)
             AS median_bal_via_cume
    FROM (
      SELECT c_mktsegment, c_acctbal,
             CUME_DIST() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal) AS cd
      FROM customer
    )
    GROUP BY c_mktsegment
    """,
)
def window_cumulative_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """cume_dist per segment, reduced to the distributional median —
    the window-function route to quantiles (vs the aggregate route in
    stats_percentiles_order_value)."""
    cust = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    cd = cust.select(
        "c_mktsegment",
        "c_acctbal",
        F.cume_dist().over(w).alias("cd"),
    )
    return cd.groupBy("c_mktsegment").agg(
        _r4(
            F.min(F.when(F.col("cd") >= 0.5, F.col("c_acctbal")))
        ).alias("median_bal_via_cume")
    )


@query(
    "window_mom_revenue_change",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    )
    SELECT month, ROUND(rev, 4) AS rev,
           ROUND(rev - LAG(rev) OVER (ORDER BY month), 4) AS delta,
           ROUND((rev - LAG(rev) OVER (ORDER BY month))
                 / LAG(rev) OVER (ORDER BY month), 4) AS pct_change
    FROM monthly
    """,
)
def window_mom_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue deltas: aggregate to ~80 month rows
    first, THEN the global-order lag window — the window sorts the
    aggregate, never the fact table."""
    orders = read_table(spark, sf_dir, "orders")
    # cast to date: DuckDB's date_trunc('month', ts) yields DATE while
    # Spark's yields TIMESTAMP — pin the common type
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = Window.orderBy("month")
    lag = F.lag("rev").over(w)
    return monthly.select(
        "month",
        _r4("rev").alias("rev"),
        _r4(F.col("rev") - lag).alias("delta"),
        _r4((F.col("rev") - lag) / lag).alias("pct_change"),
    )


@query(
    "window_trailing7d_customer_spend",
    oracle="""
    SELECT o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW),
           4) AS trailing_7d
    FROM orders
    """,
)
def window_trailing7d_customer_spend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Value-RANGE window frame: each order's trailing-7-day spend for
    its customer. Spark has no interval RANGE frames, so the date is
    mapped to epoch-days and the frame is rangeBetween(-6, 0) — the
    standard translation; same-day peers aggregate together in both
    engines (that's what distinguishes RANGE from ROWS)."""
    orders = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-6, 0)
    )
    return orders.select(
        "o_orderkey",
        _r4(F.sum("o_totalprice").over(w)).alias("trailing_7d"),
    )


@query(
    "timeseries_gap_fill",
    oracle="""
    WITH spine AS (
      SELECT CAST(d AS DATE) AS day
      FROM generate_series(DATE '2024-01-01', DATE '2024-01-30',
                           INTERVAL 1 DAY) AS t(d)
    ), daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             ROUND(SUM(value), 4) AS v
      FROM events
      WHERE event_type IN ('signup', 'error')
      GROUP BY event_type, CAST(ts AS DATE)
    ), grid AS (
      SELECT et.event_type, s.day, d.v
      FROM spine s
      CROSS JOIN (SELECT DISTINCT event_type FROM daily) et
      LEFT JOIN daily d ON d.day = s.day AND d.event_type = et.event_type
    )
    SELECT event_type, day, v,
           ROUND(COALESCE(v, LAST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), 4)
             AS v_filled
    FROM grid
    """,
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling over a generated date spine: days with no events
    get the last observed value carried forward (last_value with
    ignoreNulls over the preceding frame) — the standard
    time-series densification before resampling/forecasting.

    Scale shape: the spine is generated (sequence+explode, tiny), the
    cross join is spine x |event types| (tiny), and the fill window
    partitions by series — the fact table contributes only its daily
    pre-aggregate."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "error")
    )
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(_r4(F.sum("value")).alias("v"))
    spine = spark.range(0, 30).select(
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias(
            "day"
        )
    )
    types = daily.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types)).join(
        daily, ["event_type", "day"], "left"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return grid.select(
        "event_type",
        "day",
        "v",
        _r4(
            F.coalesce(
                F.col("v"), F.last("v", ignorenulls=True).over(w)
            )
        ).alias("v_filled"),
    )


@query(
    "stats_robust_outliers",
    oracle="""
    WITH med AS (
      SELECT c_mktsegment,
             quantile_cont(c_acctbal, 0.5) AS med_bal
      FROM customer GROUP BY c_mktsegment
    ), mad AS (
      SELECT c.c_mktsegment,
             quantile_cont(abs(c.c_acctbal - m.med_bal), 0.5) AS mad_bal
      FROM customer c JOIN med m ON c.c_mktsegment = m.c_mktsegment
      GROUP BY c.c_mktsegment
    )
    SELECT c.c_mktsegment,
           CAST(SUM(CASE WHEN abs(c.c_acctbal - m.med_bal)
                              > 3 * 1.4826 * d.mad_bal
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer c
      JOIN med m ON c.c_mktsegment = m.c_mktsegment
      JOIN mad d ON c.c_mktsegment = d.c_mktsegment
    GROUP BY c.c_mktsegment
    """,
)
def stats_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier counts per segment — the
    contamination-resistant alternative to mean/stddev z-scores for
    data-quality gates. Two grouped percentile passes + one scoring
    pass, all on the same segment shuffle key."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_acctbal"
    )
    med = cust.groupBy("c_mktsegment").agg(
        F.percentile("c_acctbal", F.lit(0.5)).alias("med_bal")
    )
    dev = cust.join(F.broadcast(med), "c_mktsegment")
    mad = dev.groupBy("c_mktsegment").agg(
        F.percentile(
            F.abs(F.col("c_acctbal") - F.col("med_bal")), F.lit(0.5)
        ).alias("mad_bal")
    )
    scored = dev.join(F.broadcast(mad), "c_mktsegment")
    is_out = (
        F.abs(F.col("c_acctbal") - F.col("med_bal"))
        > 3 * 1.4826 * F.col("mad_bal")
    ).cast("int")
    return scored.groupBy("c_mktsegment").agg(
        F.sum(is_out).alias("n_outliers"),
        F.count("*").alias("n"),
    )


@query(
    "text_top_terms",
    oracle="""
    WITH toks AS (
      SELECT UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    )
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
    FROM toks WHERE tok <> ''
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 50
    """,
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary top-50: explode tokens -> count -> ordered
    top-k (tok tiebreak). The count aggregate is map-side partial, so
    the shuffle carries one row per distinct term per partition — the
    standard corpus-frequency pass before stopword/vocab filtering."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(50)
    )


@query(
    "events_user_type_entropy",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type
    ), probs AS (
      SELECT user_id, c * 1.0 / SUM(c) OVER (PARTITION BY user_id) AS p
      FROM counts
    )
    SELECT user_id,
           ROUND(-SUM(p * LN(p)), 4) AS type_entropy
    FROM probs
    GROUP BY user_id
    ORDER BY type_entropy DESC, user_id
    LIMIT 25
    """,
)
def events_user_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix (behavioral
    diversity score): two aggregates sharing the user_id shuffle key
    plus a per-user window — no joins, no fact-table sort."""
    ev = read_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("c")
    )
    w = Window.partitionBy("user_id")
    probs = counts.withColumn("p", F.col("c") / F.sum("c").over(w))
    return (
        probs.groupBy("user_id")
        .agg(_r4(-F.sum(F.col("p") * F.log("p"))).alias("type_entropy"))
        .orderBy(F.col("type_entropy").desc(), F.col("user_id"))
        .limit(25)
    )


@query(
    "timeseries_seasonal_decompose",
    oracle="""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT month, rev,
             CASE WHEN COUNT(*) OVER wa = 12 AND COUNT(*) OVER wb = 12
                  THEN (AVG(rev) OVER wa + AVG(rev) OVER wb) / 2
             END AS trend
      FROM monthly
      WINDOW wa AS (ORDER BY month
                    ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING),
             wb AS (ORDER BY month
                    ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)
    ),
    s AS (
      SELECT month(month) AS moy, AVG(rev - trend) AS s_raw
      FROM t WHERE trend IS NOT NULL GROUP BY 1
    ),
    c AS (
      SELECT moy, s_raw - (SELECT AVG(s_raw) FROM s) AS seasonal
      FROM s
    )
    SELECT t.month, ROUND(rev, 4) AS revenue,
           ROUND(trend, 4) AS trend,
           ROUND(seasonal, 4) AS seasonal,
           ROUND(rev - trend - seasonal, 4) AS residual
    FROM t LEFT JOIN c ON month(t.month) = c.moy
    """,
)
def timeseries_seasonal_decompose(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classical additive seasonal decomposition of monthly revenue
    (Kendall/Box-Jenkins textbook construction): trend = centered
    2x12 moving average (NULL where the window is incomplete),
    seasonal = month-of-year mean of the detrended series re-centered
    to sum to zero, residual = remainder — the decomposition a
    forecasting pipeline runs before fitting anything.

    Scale shape: the fact table collapses to the ~80-row month frame
    FIRST (one grouped aggregate with map-side partials); every
    window, the 12-row seasonal index, and its centering run on that
    bounded frame — the global-order window never touches fact rows
    (the window_mom_revenue_change posture). Seasonal indices join
    back via a 12-row broadcast."""
    orders = read_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.sum("o_totalprice").alias("rev"))
    wa = Window.orderBy("month").rowsBetween(-6, 5)
    wb = Window.orderBy("month").rowsBetween(-5, 6)
    t = monthly.select(
        "month",
        "rev",
        F.when(
            (F.count("*").over(wa) == 12) & (F.count("*").over(wb) == 12),
            (F.avg("rev").over(wa) + F.avg("rev").over(wb)) / 2,
        ).alias("trend"),
    )
    s = (
        t.filter(F.col("trend").isNotNull())
        .groupBy(F.month("month").alias("moy"))
        .agg(F.avg(F.col("rev") - F.col("trend")).alias("s_raw"))
    )
    c = s.crossJoin(
        F.broadcast(s.agg(F.avg("s_raw").alias("g")))
    ).select("moy", (F.col("s_raw") - F.col("g")).alias("seasonal"))
    return (
        t.join(F.broadcast(c), F.month("month") == F.col("moy"), "left")
        .select(
            "month",
            _r4("rev").alias("revenue"),
            _r4("trend").alias("trend"),
            _r4("seasonal").alias("seasonal"),
            _r4(
                F.col("rev") - F.col("trend") - F.col("seasonal")
            ).alias("residual"),
        )
    )
