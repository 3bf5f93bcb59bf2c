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
