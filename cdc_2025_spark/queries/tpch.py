"""TPC-H-shaped breadth queries (Q4/Q6/Q7/Q8/Q14/Q15/Q18/Q19
adapted to the testdata columns), plus a time-range join and a salted
skew join — SURVEY.md §7 step 4 ("operator breadth") and step 7
("scale hygiene": every join here is annotated with its 100 TB plan
shape).

Column adaptations vs canonical TPC-H (FIXTURES.md §B): no
l_commitdate/l_receiptdate (Q4 EXISTS uses l_shipdate > o_orderdate),
no partsupp, p_type is a single word ('PROMO', 'ECONOMY', ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_2025_spark.io import read_table
from cdc_2025_spark.queries.registry import query


def _r4(c):
    return F.round(c, 4)


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: priority counts for orders with at least one
    late-shipping line (EXISTS → left-semi join; the orders side is
    date-pruned BEFORE the join, so at 100 TB the semi join probes
    only one quarter of the fact table)."""
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate. All three predicates push
    to the parquet scan (row-group min/max skips whole chunks of a
    date-sorted 100 TB fact table); zero shuffles beyond the final
    1-row reduce."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        _r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
            "revenue"
        ),
        F.count("*").alias("n"),
    )


@query(
    "q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: bilateral trade volume between two nations.

    Scale shape: nation (25 rows) broadcasts into supplier AND
    customer first, shrinking both before they touch the fact tables;
    the only big-big shuffle is lineitem⋈orders on orderkey."""
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk")
    )
    cust = read_table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            _r4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE 0 END) / SUM(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region   ON n1.n_regionkey = r_regionkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                            AND TIMESTAMP '1997-12-31'
        AND p_type = 'ECONOMY'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped: one nation's share of ECONOMY-part revenue in
    a region, by year. Dim chain (region→nation→customer, part,
    supplier→nation) all broadcast; conditional-sum ratio avoids a
    second pass."""
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    nation = read_table(spark, sf_dir, "nation")
    cust_n = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    supp_n = nation.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    supp = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(supp_n), F.col("s_nationkey") == F.col("sn_key")
    ).select("s_suppkey", "supp_nation")
    cust = read_table(spark, sf_dir, "customer").join(
        F.broadcast(cust_n), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    li = read_table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            _r4(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                        0.0
                    )
                )
                / F.sum(vol)
            ).alias("mkt_share")
        )
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.00 * SUM(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4)
           AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo parts' revenue share for one month. Part dim
    broadcasts; month predicate prunes the fact scan."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        _r4(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev)
        ).alias("promo_revenue_pct")
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, ROUND(total_revenue, 4) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the top-revenue supplier for a quarter. The scalar
    max re-joins against the aggregate (two uses of one shuffle —
    Spark reuses the exchange); ties all surface, as in the spec."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    best = rev.agg(F.max("total_revenue").alias("mx"))
    supp = read_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(best), rev.total_revenue == best.mx)
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", _r4("total_revenue").alias("total_revenue")
        )
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           ROUND(sum_qty, 4) AS sum_qty
    FROM (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    ) big JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: customers behind the largest-volume orders.
    The HAVING pre-aggregate shrinks lineitem to a key list BEFORE
    joining orders (semi-join-like reduction — at 100 TB the join
    probes ~1% of orders)."""
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            _r4("sum_qty").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
    )


@query(
    "q19_bracketed_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive brand/size/quantity brackets. The OR of
    per-brand brackets evaluates post-join on the broadcast part dim;
    the p_brand IN (...) residue could push to the part scan."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(bracket).agg(
        _r4(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("revenue"),
        F.count("*").alias("n"),
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name, o_year, ROUND(SUM(amount), 4) AS sum_profit
    FROM (
      SELECT n_name,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.6 * p_retailprice * l_quantity AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders ON o_orderkey = l_orderkey
                JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%5%'
    )
    GROUP BY n_name, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped: profit per supplier nation per year for a part
    subset (0.6 * p_retailprice stands in for ps_supplycost — no
    partsupp table in the fixture). Part/supplier/nation broadcast;
    lineitem ⋈ orders is the only big-big shuffle."""
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%5%")
    ).select("p_partkey", "p_retailprice")
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    nation = read_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("n_name", "o_year")
        .agg(_r4(F.sum(amount)).alias("sum_profit"))
    )


@query(
    "q20_promo_heavy_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 100
    )
    """,
)
def q20_promo_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped: suppliers who moved >100 units of PROMO parts
    in a year (shipped quantity stands in for availqty — no partsupp).
    The HAVING pre-aggregate reduces lineitem to a supplier key list;
    the final IN is a broadcast semi join into the supplier dim."""
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    supp = read_table(spark, sf_dir, "supplier")
    return supp.join(
        heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "q21_sole_late_suppliers",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped: suppliers solely responsible for a late
    multi-supplier order (ship > order date + 60d standing in for
    receipt > commit). EXISTS/NOT EXISTS decorrelate into one
    per-order aggregate — supplier counts and late-supplier counts —
    joined back once, replacing two correlated subquery scans."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "late",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).cast("int"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    # the qualifying rows: late lines of orders with >1 supplier where
    # exactly one supplier (this one) shipped late
    cand = (
        lo.filter(F.col("late") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        cand.join(F.broadcast(supp), cand.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
    )


@query(
    "q11ish_part_value_share",
    oracle="""
    WITH pv AS (
      SELECT l_partkey, SUM(l_extendedprice * l_quantity) AS val
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, ROUND(val, 4) AS val
    FROM pv
    WHERE val > (SELECT SUM(val) * 0.0005 FROM pv)
    """,
)
def q11ish_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped: parts whose traded value exceeds a fraction
    of the global total — a scalar subquery over the SAME aggregate
    feeding the filter (Spark reuses the exchange for both
    consumers; the threshold broadcasts as a 1-row cross join)."""
    li = read_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("val")
    )
    thresh = pv.agg((F.sum("val") * 0.0005).alias("cut"))
    return (
        pv.crossJoin(F.broadcast(thresh))
        .filter(F.col("val") > F.col("cut"))
        .select("l_partkey", _r4("val").alias("val"))
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13: order-count distribution INCLUDING zero-order
    customers (the left outer join is the point — an inner join would
    silently drop the zero bucket)."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from below-one-fifth-of-average-quantity
    orders of one brand. The correlated AVG decorrelates into a
    per-part pre-aggregate joined back — expressed directly in that
    decorrelated form (one lineitem scan for the avg, one for the
    probe; the brand filter shrinks the probe side first)."""
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    ).select("p_partkey")
    li = read_table(spark, sf_dir, "lineitem")
    # per-part avg over ALL lineitems (the subquery is correlated on
    # partkey only, not on the brand filter)
    avg_qty = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cap")
    )
    probe = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return (
        probe.join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(_r4(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "q22_dormant_rich_customers",
    oracle="""
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 4) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                       WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: above-average-balance customers with no
    orders, per nation. Scalar avg broadcasts as a 1-row cross join;
    NOT EXISTS plans as a left-anti join on the orders key set."""
    cust = read_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    orders = read_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            _r4(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )


@query(
    "range_join_event_windows",
    oracle="""
    WITH w AS (
      SELECT ws AS w_start, ws + INTERVAL 90 MINUTE AS w_end
      FROM generate_series(TIMESTAMP '2024-01-01',
                           TIMESTAMP '2024-01-30',
                           INTERVAL 4 HOUR) AS t(ws)
    )
    SELECT w_start, CAST(COUNT(event_id) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM w JOIN events ON ts >= w_start AND ts < w_end
    GROUP BY w_start
    """,
)
def range_join_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: events against 90-minute observation
    windows opening every 4 hours — windows are NOT aligned to any
    truncation, so this is a true range join, not a date_trunc
    groupBy.

    Scale shape: bin-bucketed broadcast HASH join
    (functions/intervals.py): windows explode to their overlapping
    4-hour bins (1 row each here), each event probes its single bin,
    the range predicate re-checks exactly. O(1) per event instead of
    the O(|windows|) BroadcastNestedLoopJoin Spark would otherwise
    plan — the difference between 175 interval tests and one hash
    probe per row, at any scale; the events side still never
    shuffles. Equivalence to the naive nested-loop form is pinned in
    test_plan_shape.py."""
    from cdc_2025_spark.functions.intervals import binned_interval_join

    events = read_table(spark, sf_dir, "events")
    # generate_series is endpoint-INCLUSIVE: 29 days * 6/day + 1 = 175
    windows = spark.range(0, 175).select(
        (
            F.lit("2024-01-01").cast("timestamp")
            + F.make_interval(hours=F.lit(4) * F.col("id"))
        ).alias("w_start")
    ).withColumn(
        "w_end", F.col("w_start") + F.make_interval(mins=F.lit(90))
    ).filter(F.col("w_start") <= F.lit("2024-01-30").cast("timestamp"))
    joined = binned_interval_join(
        events, windows, "ts", "w_start", "w_end", bin_seconds=4 * 3600
    )
    return joined.groupBy("w_start").agg(
        F.count("event_id").alias("n_events"),
        _r4(F.sum("value")).alias("total_value"),
    )


@query(
    "skewjoin_salted_event_types",
    oracle="""
    SELECT event_type, CAST(type_weight AS DOUBLE) AS type_weight,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value * type_weight), 4) AS weighted_value
    FROM events JOIN (
      VALUES ('view', 1.0), ('click', 2.0), ('purchase', 10.0),
             ('signup', 5.0), ('error', 0.0)
    ) AS w(event_type, type_weight) USING (event_type)
    GROUP BY event_type, type_weight
    """,
)
def skewjoin_salted_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join: events keyed by event_type (5 distinct values
    → pathological shuffle skew) joined to a per-type weight dim.

    The salt spreads each hot key over 16 sub-keys: the dim explodes
    16×, events get salt = pmod(hash(event_id), 16), and the join key
    becomes (event_type, salt) — every shuffle partition gets ~1/16 of
    a hot key. Here the dim would broadcast anyway; the query pins the
    salting recipe (and its exact-result property) for the 100 TB case
    where the big side must shuffle, e.g. a skewed big-big join AQE
    can't split because the key is in a groupBy downstream.
    The recipe lives in functions/joins.py salted_join; its
    partition-spread property is pinned in test_partitioning.py."""
    from cdc_2025_spark.functions.joins import salted_join

    events = read_table(spark, sf_dir, "events")
    weights = spark.createDataFrame(
        [
            ("view", 1.0),
            ("click", 2.0),
            ("purchase", 10.0),
            ("signup", 5.0),
            ("error", 0.0),
        ],
        "event_type string, type_weight double",
    )
    return (
        salted_join(
            events, weights, ["event_type"], n_salt=16, salt_on="event_id"
        )
        .groupBy("event_type", "type_weight")
        .agg(
            F.count("*").alias("n"),
            _r4(F.sum(F.col("value") * F.col("type_weight"))).alias(
                "weighted_value"
            ),
        )
    )
