"""Relational operator coverage: scans, filters, projections, joins of
every kind, aggregation, grouping sets, set ops, pivot/unpivot, top-k,
scalar string/date/JSON functions (SURVEY.md §2.1-2.7).

All plans are declarative DataFrame chains — Catalyst handles pushdown,
pruning, join strategy (small dims broadcast automatically under the
64 MB threshold set in session.py), and AQE re-plans at runtime.

Scale notes per query are in the docstrings: the design target is a
1000-executor cluster at 100 TB, where the dominant costs are shuffle
volume and scan width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_2025_spark.io import read_table
from cdc_2025_spark.queries.registry import query


def _r4(c):
    return F.round(c, 4)


# --------------------------------------------------------------------------
# Aggregation over a filtered scan (reference ops P5/P6/A1-A3 writ large)
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4)                                    AS sum_qty,
           ROUND(SUM(l_extendedprice), 4)                               AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)            AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                    AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                               AS avg_price,
           ROUND(AVG(l_discount), 4)                                    AS avg_disc,
           COUNT(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: single wide hash aggregate.

    Scale: the filter + 7-column projection push into the Parquet scan
    (row-group stats prune late ship dates; unused columns unread);
    partial aggregation combines map-side, so the shuffle carries only
    |groups| x partitions rows. At 100 TB this is scan-bound — the
    ideal shape.
    """
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r4(F.sum("l_quantity")).alias("sum_qty"),
            _r4(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r4(F.sum(disc_price)).alias("sum_disc_price"),
            _r4(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            _r4(F.avg("l_quantity")).alias("avg_qty"),
            _r4(F.avg("l_extendedprice")).alias("avg_price"),
            _r4(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Multi-way join + agg + top-k (J1 at scale, T2)
# --------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           CAST(o_orderdate AS DATE)                         AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-01-01'
      AND l_shipdate  > TIMESTAMP '1999-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: selective dim filter -> fact joins -> top-k.

    Scale: customer (filtered to one segment) broadcasts; the
    orders><lineitem join shuffles on orderkey — both sides pre-filter
    before the shuffle (Catalyst pushes the date predicates below the
    join). orderBy().limit() plans as TakeOrderedAndProject: per-
    partition heaps, no global sort.
    """
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            _r4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_regional_volume",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped six-way join with a co-location predicate.

    Scale: the three dim tables (supplier x nation x region, region
    pre-filtered to ASIA) are PRE-JOINED into one small broadcast
    build, so the lineitem stream — the only large side — pays a
    single hash probe instead of three chained ones. Catalyst can't
    make this reordering itself without CBO stats (broadcast joins
    aren't reassociated), so it's expressed structurally; result is
    bit-identical to the flat six-way join (all inner joins on the
    same keys). Only orders><customer/lineitem use further broadcast
    joins; nothing but the final one-row-per-nation agg shuffles. The
    c_nationkey = s_nationkey equi-condition rides along the hash join
    rather than becoming a post-filter.
    """
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(asia_supp),
            (li.l_suppkey == asia_supp.s_suppkey)
            & (cust.c_nationkey == asia_supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            _r4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Outer / semi / anti joins (J2 + the join kinds the reference lacks)
# --------------------------------------------------------------------------
@query(
    "join_outer_customer_orders",
    oracle="""
    SELECT c_custkey,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0), 4) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_outer_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join keeping order-less customers (J2's full-outer
    pattern, resilience.py:76). COUNT of a nullable key counts matches
    only — identical semantics both engines."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            _r4(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias(
                "total_spent"
            ),
        )
    )


@query(
    "join_semi_customers_with_purchases",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def join_semi_customers_with_purchases(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT SEMI join — dedups the probe side inside the join, no fanout
    and no distinct needed. At scale this halves shuffle volume vs
    inner-join + dropDuplicates."""
    cust = read_table(spark, sf_dir, "customer")
    big = read_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti_customers_without_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT ANTI join: set difference without materializing a distinct
    key list."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube (beyond-reference aggregation surface)
# --------------------------------------------------------------------------
@query(
    "agg_rollup_nation_segment",
    oracle="""
    SELECT n_name, c_mktsegment,
           ROUND(SUM(o_totalprice), 4) AS revenue,
           CAST(COUNT(*) AS BIGINT)    AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
)
def agg_rollup_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals: (nation, segment) -> (nation) -> ().

    Spark expands grouping sets in a single Expand + aggregate — one
    shuffle for all three granularities rather than three jobs.
    """
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            _r4(F.sum("o_totalprice")).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "agg_cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           ROUND(AVG(o_totalprice), 4) AS avg_price,
           CAST(COUNT(*) AS BIGINT)    AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dims — all four grouping sets in
    one pass."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        _r4(F.avg("o_totalprice")).alias("avg_price"),
        F.count("*").alias("n"),
    )


@query(
    "agg_distinct_users_per_type",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT)                AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def agg_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate alongside a plain count (two-phase expand
    aggregate in Spark; exact, not approximate)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@query("agg_approx_distinct_users")
def agg_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB path where exact
    distinct would shuffle every key. No SQL oracle (estimator-specific
    results); accuracy pinned in tests/test_queries.py against the
    exact count (rsd 5%).
    """
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx_users")
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------
@query(
    "setop_nations_customers_vs_suppliers",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_nations_customers_vs_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INTERSECT (distinct semantics) — Spark plans a left-semi join
    over pre-aggregated sides."""
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


@query(
    "setop_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT DISTINCT — nations with customers but no suppliers."""
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.subtract(supp)


@query(
    "setop_union_all_keys",
    oracle="""
    SELECT CAST(SUM(k) AS BIGINT) AS key_sum, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT c_nationkey AS k FROM customer
      UNION ALL
      SELECT s_nationkey FROM supplier
    )
    """,
)
def setop_union_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) + global aggregate; union is a no-
    shuffle concatenation of partitions."""
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k")
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k")
    )
    return cust.unionAll(supp).agg(
        F.sum("k").cast("long").alias("key_sum"), F.count("*").alias("n")
    )


# --------------------------------------------------------------------------
# Pivot / unpivot (R1/R2 on the star schema)
# --------------------------------------------------------------------------
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_user_event_matrix",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS error,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS signup,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS "view"
    FROM events
    GROUP BY user_id
    """,
)
def pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 pivot on the star schema: per-user event-type count matrix.

    Pivot values are pinned explicitly — at scale an unpinned pivot
    first runs a distinct scan to discover columns.
    """
    ev = read_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES],
    )


@query(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT metric, ROUND(AVG(value), 4) AS avg_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT 'quantity' AS metric, l_quantity AS value FROM lineitem
      UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'discount', l_discount FROM lineitem
      UNION ALL SELECT 'tax', l_tax FROM lineitem
    )
    GROUP BY metric
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 unpivot (melt) of four measure columns into (metric, value)
    rows — Spark's native unpivot, a narrow op (no shuffle until the
    aggregate)."""
    li = read_table(spark, sf_dir, "lineitem")
    melted = li.select(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    ).unpivot(
        ids=[],
        values=[
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("extendedprice"),
            F.col("l_discount").alias("discount"),
            F.col("l_tax").alias("tax"),
        ],
        variableColumnName="metric",
        valueColumnName="value",
    )
    return melted.groupBy("metric").agg(
        _r4(F.avg("value")).alias("avg_value"), F.count("*").alias("n")
    )


# --------------------------------------------------------------------------
# Scalar functions: string / date / JSON (SURVEY.md §2.7 extensions)
# --------------------------------------------------------------------------
@query(
    "scalar_dates_monthly_revenue",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER)  AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           ROUND(SUM(o_totalprice), 4)         AS revenue,
           CAST(COUNT(*) AS BIGINT)            AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
)
def scalar_dates_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date part extraction + calendar aggregation. At scale the fact
    table would be date-partitioned and this prunes to touched months."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(
            _r4(F.sum("o_totalprice")).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "scalar_strings_part_brands",
    oracle="""
    SELECT UPPER(p_brand)                         AS brand,
           CAST(COUNT(*) AS BIGINT)               AS n_parts,
           ROUND(AVG(LENGTH(p_name)), 4)          AS avg_name_len,
           CAST(SUM(CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_brass
    FROM part
    WHERE p_size BETWEEN 5 AND 40
    GROUP BY UPPER(p_brand)
    """,
)
def scalar_strings_part_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions (upper/length/like) over a pruned scan."""
    part = read_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_size").between(5, 40))
        .groupBy(F.upper("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("n_parts"),
            _r4(F.avg(F.length("p_name"))).alias("avg_name_len"),
            F.sum(
                F.when(F.col("p_type").like("%BRASS%"), 1).otherwise(0)
            ).cast("long").alias("n_brass"),
        )
    )


@query(
    "scalar_json_props_extract",
    oracle="""
    SELECT event_type,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4)
               AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER)
               AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def scalar_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from the events.props string column —
    get_json_object is JVM-side (Jackson), no Python involved."""
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        _r4(F.avg(k)).alias("avg_k"), F.max(k).alias("max_k")
    )


# --------------------------------------------------------------------------
# Top-k / sort surface (T2/T3)
# --------------------------------------------------------------------------
@query(
    "topk_customers_by_spend",
    oracle="""
    SELECT c_custkey, c_name, ROUND(SUM(o_totalprice), 4) AS total_spent
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY total_spent DESC, c_custkey
    LIMIT 25
    """,
)
def topk_customers_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k after aggregation -> TakeOrderedAndProject (heap
    per partition + driver merge of k rows; no global sort)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(_r4(F.sum("o_totalprice")).alias("total_spent"))
        .orderBy(F.col("total_spent").desc(), F.col("c_custkey"))
        .limit(25)
    )


MERGE_DELETE_MIN_ORDERS = 20
MERGE_PROSPECT_N = 20
MERGE_PROSPECT_OFFSET = 1_000_000


@query(
    "merge_into_customer_balances",
    oracle=f"""
    WITH src AS (
      SELECT o_custkey AS c_custkey,
             ROUND(SUM(o_totalprice), 2) AS spend,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(NULL AS VARCHAR) AS name
      FROM orders GROUP BY o_custkey
      UNION ALL
      SELECT c_custkey + {MERGE_PROSPECT_OFFSET}, 0.0, 0,
             'Prospect#' ||
             CAST(c_custkey + {MERGE_PROSPECT_OFFSET} AS VARCHAR)
      FROM customer WHERE c_custkey < {MERGE_PROSPECT_N}
    ),
    m AS (
      SELECT t.c_custkey AS tk, s.c_custkey AS sk,
             t.c_name, t.c_acctbal, t.c_mktsegment,
             s.spend, s.n_orders, s.name
      FROM customer t FULL OUTER JOIN src s
        ON t.c_custkey = s.c_custkey
    )
    SELECT COALESCE(tk, sk) AS c_custkey,
           CASE WHEN tk IS NOT NULL THEN c_name ELSE name END AS c_name,
           CASE WHEN tk IS NOT NULL AND sk IS NOT NULL
                  THEN ROUND(c_acctbal + spend / 1000, 2)
                WHEN tk IS NOT NULL THEN c_acctbal
                ELSE spend END AS c_acctbal,
           CASE WHEN tk IS NOT NULL THEN c_mktsegment
                ELSE 'PROSPECT' END AS c_mktsegment
    FROM m
    WHERE (tk IS NOT NULL AND sk IS NULL)
       OR (tk IS NOT NULL AND sk IS NOT NULL
           AND n_orders < {MERGE_DELETE_MIN_ORDERS})
       OR tk IS NULL
    """,
)
def merge_into_customer_balances(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MERGE INTO — the lakehouse upsert statement (Delta/Iceberg
    MERGE, ANSI SQL:2003) exercised end-to-end on the star schema:
    merge per-customer order aggregates into the customer table —
    matched customers with >= {MERGE_DELETE_MIN_ORDERS} orders are
    DELETED (churn purge), other matches UPDATE the balance with a
    spend-derived cashback, source-only keys ({MERGE_PROSPECT_N}
    synthetic prospects, an in-plan fixture shim like the URL
    query's) INSERT with a PROSPECT segment, and untouched customers
    pass through. All four MERGE paths run in one statement; the
    oracle mirrors the full-outer-join CASE semantics row for row.

    Shape: `merge.merge_into` — one cardinality-check aggregate +
    ONE key-shuffled full-outer join with every clause a codegen'd
    CASE (how engines execute MERGE, minus storage-level file
    pruning — covered by layout.zorder/compact). AQE sizes the
    shuffle; a small source side would broadcast."""
    from cdc_2025_spark.merge import merge_into

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    orders = read_table(spark, sf_dir, "orders")
    agg = orders.groupBy(
        F.col("o_custkey").alias("c_custkey")
    ).agg(
        F.round(F.sum("o_totalprice"), 2).alias("spend"),
        F.count("*").alias("n_orders"),
    ).withColumn("name", F.lit(None).cast("string"))
    prospects = cust.filter(
        F.col("c_custkey") < MERGE_PROSPECT_N
    ).select(
        (F.col("c_custkey") + MERGE_PROSPECT_OFFSET).alias("c_custkey"),
        F.lit(0.0).alias("spend"),
        F.lit(0).cast("long").alias("n_orders"),
        F.concat(
            F.lit("Prospect#"),
            (F.col("c_custkey") + MERGE_PROSPECT_OFFSET).cast("string"),
        ).alias("name"),
    )
    src = agg.unionByName(prospects)
    return merge_into(
        cust,
        src,
        on=["c_custkey"],
        update_set={
            "c_acctbal": F.round(
                F.col("t_c_acctbal") + F.col("s_spend") / 1000, 2
            )
        },
        delete_condition=F.col("s_n_orders") >= MERGE_DELETE_MIN_ORDERS,
        insert_values={
            "c_name": F.col("s_name"),
            "c_acctbal": F.col("s_spend"),
            "c_mktsegment": F.lit("PROSPECT"),
        },
    )


_SEGMENT_DOMAIN = (
    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
)


@query(
    "quality_expectations_audit",
    oracle=f"""
    WITH ri_orders AS (
      SELECT COUNT(*) AS n_checked,
             SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS viol
      FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        ON o.o_custkey = c.c_custkey
    ),
    ri_lineitem AS (
      SELECT COUNT(*) AS n_checked,
             SUM(CASE WHEN k.o_orderkey IS NULL THEN 1 ELSE 0 END) AS viol
      FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) k
        ON l.l_orderkey = k.o_orderkey
    ),
    cust AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(*) - COUNT(DISTINCT c_custkey) AS dup_keys,
             SUM(CASE WHEN c_mktsegment IS NULL OR c_mktsegment NOT IN
                 {_SEGMENT_DOMAIN} THEN 1 ELSE 0 END) AS bad_segment
      FROM customer
    ),
    ord AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_keys,
             SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                 THEN 1 ELSE 0 END) AS neg_price,
             SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                 AS null_date
      FROM orders
    ),
    li AS (
      SELECT COUNT(*) AS n_rows,
             SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1
                       OR l_quantity > 50 THEN 1 ELSE 0 END) AS bad_qty
      FROM lineitem
    ),
    u AS (
      SELECT 'orders_custkey_ri' AS expectation,
             'orders' AS target_table, n_checked, viol FROM ri_orders
      UNION ALL
      SELECT 'lineitem_orderkey_ri', 'lineitem', n_checked, viol
      FROM ri_lineitem
      UNION ALL
      SELECT 'customer_key_unique', 'customer', n_rows, dup_keys FROM cust
      UNION ALL
      SELECT 'customer_segment_domain', 'customer', n_rows, bad_segment
      FROM cust
      UNION ALL
      SELECT 'orders_key_unique', 'orders', n_rows, dup_keys FROM ord
      UNION ALL
      SELECT 'orders_totalprice_nonneg', 'orders', n_rows, neg_price
      FROM ord
      UNION ALL
      SELECT 'orders_orderdate_notnull', 'orders', n_rows, null_date
      FROM ord
      UNION ALL
      SELECT 'lineitem_quantity_range', 'lineitem', n_rows, bad_qty FROM li
    )
    SELECT expectation, target_table,
           CAST(n_checked AS BIGINT) AS n_checked,
           CAST(viol AS BIGINT) AS n_violations,
           CASE WHEN viol = 0 THEN 'pass' ELSE 'fail' END AS status
    FROM u
    """,
)
def quality_expectations_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dbt-test / Great-Expectations-style data-quality audit in ONE
    declarative plan: referential integrity (orders -> customer,
    lineitem -> orders), key uniqueness, domain membership, range and
    not-null checks — one row per expectation with checked/violation
    counts and pass/fail, the contract suite a lakehouse pipeline
    runs on every load.

    Scale shape: per-table checks FUSE into one conditional aggregate
    per table (customer: uniqueness + domain in one scan; orders:
    uniqueness + range + not-null in one scan), so the audit costs
    one pass per fact table plus two key-shuffled left joins for the
    RI checks (the dim key sets are distinct-projected first, so the
    join carries keys, not rows — broadcastable when the dim fits).
    All counts integer-exact; no sampling."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")

    ri_orders = (
        orders.join(
            customer.select("c_custkey").distinct(),
            orders.o_custkey == F.col("c_custkey"),
            "left",
        )
        .agg(
            F.count("*").alias("n_checked"),
            F.sum(
                F.when(F.col("c_custkey").isNull(), 1).otherwise(0)
            ).alias("viol"),
        )
        .select(
            F.lit("orders_custkey_ri").alias("expectation"),
            F.lit("orders").alias("target_table"),
            "n_checked",
            "viol",
        )
    )
    ri_lineitem = (
        lineitem.join(
            orders.select("o_orderkey").distinct(),
            lineitem.l_orderkey == F.col("o_orderkey"),
            "left",
        )
        .agg(
            F.count("*").alias("n_checked"),
            F.sum(
                F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
            ).alias("viol"),
        )
        .select(
            F.lit("lineitem_orderkey_ri").alias("expectation"),
            F.lit("lineitem").alias("target_table"),
            "n_checked",
            "viol",
        )
    )
    cust = customer.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.countDistinct("c_custkey")).alias("dup_keys"),
        F.sum(
            F.when(
                F.col("c_mktsegment").isNull()
                | ~F.col("c_mktsegment").isin(*_SEGMENT_DOMAIN),
                1,
            ).otherwise(0)
        ).alias("bad_segment"),
    ).localCheckpoint(eager=False)
    ordr = orders.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_keys"),
        F.sum(
            F.when(
                F.col("o_totalprice").isNull()
                | (F.col("o_totalprice") < 0),
                1,
            ).otherwise(0)
        ).alias("neg_price"),
        F.sum(
            F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)
        ).alias("null_date"),
    ).localCheckpoint(eager=False)
    li = lineitem.agg(
        F.count("*").alias("n_rows"),
        F.sum(
            F.when(
                F.col("l_quantity").isNull()
                | (F.col("l_quantity") < 1)
                | (F.col("l_quantity") > 50),
                1,
            ).otherwise(0)
        ).alias("bad_qty"),
    )

    def pick(df: DataFrame, exp: str, table: str, viol: str) -> DataFrame:
        return df.select(
            F.lit(exp).alias("expectation"),
            F.lit(table).alias("target_table"),
            F.col("n_rows").alias("n_checked"),
            F.col(viol).alias("viol"),
        )

    u = (
        ri_orders.unionAll(ri_lineitem)
        .unionAll(pick(cust, "customer_key_unique", "customer", "dup_keys"))
        .unionAll(
            pick(cust, "customer_segment_domain", "customer", "bad_segment")
        )
        .unionAll(pick(ordr, "orders_key_unique", "orders", "dup_keys"))
        .unionAll(
            pick(ordr, "orders_totalprice_nonneg", "orders", "neg_price")
        )
        .unionAll(
            pick(ordr, "orders_orderdate_notnull", "orders", "null_date")
        )
        .unionAll(pick(li, "lineitem_quantity_range", "lineitem", "bad_qty"))
    )
    return u.select(
        "expectation",
        "target_table",
        "n_checked",
        F.col("viol").alias("n_violations"),
        F.when(F.col("viol") == 0, "pass").otherwise("fail").alias(
            "status"
        ),
    )
