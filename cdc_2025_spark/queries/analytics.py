"""Analytic operator breadth: statistical aggregates, exact
percentiles, ranking variants, correlated subqueries, deterministic
hash sampling, histograms, and additional TPC-H-shaped joins
(SURVEY.md §7 step 4: "operator breadth to pass the DuckDB oracle").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_2025_spark.io import read_table
from cdc_2025_spark.queries.registry import query


def _r4(c):
    return F.round(c, 4)


@query(
    "stats_moments_by_segment",
    oracle="""
    SELECT c_mktsegment,
           ROUND(AVG(c_acctbal), 4)         AS mean_bal,
           ROUND(STDDEV_SAMP(c_acctbal), 4) AS sd_bal,
           ROUND(VAR_SAMP(c_acctbal), 4)    AS var_bal,
           ROUND(MIN(c_acctbal), 4)         AS min_bal,
           ROUND(MAX(c_acctbal), 4)         AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def stats_moments_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev/variance — single partial-aggregable pass."""
    cust = read_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        _r4(F.avg("c_acctbal")).alias("mean_bal"),
        _r4(F.stddev_samp("c_acctbal")).alias("sd_bal"),
        _r4(F.var_samp("c_acctbal")).alias("var_bal"),
        _r4(F.min("c_acctbal")).alias("min_bal"),
        _r4(F.max("c_acctbal")).alias("max_bal"),
    )


@query(
    "stats_corr_price_quantity",
    oracle="""
    SELECT l_returnflag,
           ROUND(CORR(l_quantity, l_extendedprice), 4)      AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           CAST(COUNT(*) AS BIGINT)                          AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def stats_corr_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate aggregates (corr/covar) over the fact table."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _r4(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        _r4(F.covar_samp("l_quantity", "l_extendedprice")).alias(
            "covar_qty_price"
        ),
        F.count("*").alias("n"),
    )


@query(
    "stats_percentiles_order_value",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def stats_percentiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (linear interpolation — Spark `percentile`
    and DuckDB `quantile_cont` share the definition). The approximate
    twin below is the 100 TB path."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        _r4(F.percentile("o_totalprice", F.lit(0.5))).alias("p50"),
        _r4(F.percentile("o_totalprice", F.lit(0.9))).alias("p90"),
        _r4(F.percentile("o_totalprice", F.lit(0.99))).alias("p99"),
    )


@query(
    "stats_approx_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_disc(o_totalprice, 0.5) AS approx_p50,
           quantile_disc(o_totalprice, 0.9) AS approx_p90
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def stats_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-sketch-style, mergeable) — the scale
    path where exact percentile's full sort-per-group is not viable.

    Oracle: at driver scale every group is smaller than the sketch
    accuracy (10000), so Spark's summary stores all samples and its
    rank rule coincides with DuckDB's quantile_disc — verified
    hash-exact at sf0.01 (was rows-only through round 2). At larger
    group sizes the sketch answer is approximate by design; the error
    envelope is pinned in tests/test_analytics_accuracy.py.

    The sketch returns an array; driver-facing output projects it to
    scalar p50/p90 columns (top-level arrays are not sortable by the
    driver's pandas canonicalizer — pinned in test_oracle_parity)."""
    orders = read_table(spark, sf_dir, "orders")
    approx = orders.groupBy("o_orderpriority").agg(
        F.approx_percentile(
            "o_totalprice", F.array(F.lit(0.5), F.lit(0.9)), F.lit(10000)
        ).alias("approx")
    )
    return approx.select(
        "o_orderpriority",
        F.element_at("approx", 1).alias("approx_p50"),
        F.element_at("approx", 2).alias("approx_p90"),
    )


@query(
    "agg_order_array_per_customer",
    oracle="""
    SELECT o_custkey,
           array_to_string(list(o_orderkey ORDER BY o_orderkey), ',')
               AS order_keys,
           CAST(len(list(o_orderkey)) AS INTEGER) AS n_orders
    FROM orders
    WHERE o_custkey < 50
    GROUP BY o_custkey
    """,
)
def agg_order_array_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: each customer's order keys as a SORTED
    array (collect_list has no deterministic order across partitions
    — array_sort after collection is the portable spelling; DuckDB's
    list(... ORDER BY) is its native one). Nested-result queries are
    the denormalization step before feature stores / document
    assembly.

    Driver-facing output serializes the array to a ','-joined string
    (numeric sort first, THEN cast to string — lexical sort would
    misorder) because the driver canonicalizer cannot sort top-level
    array columns; the array-typed variant stays under tests."""
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < 50
    )
    return orders.groupBy("o_custkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("o_orderkey")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("order_keys"),
        F.count("*").cast("int").alias("n_orders"),
    )


@query(
    "sample_stratified_by_segment",
    oracle="""
    WITH b AS (
      SELECT c_mktsegment, c_acctbal,
             CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % 100 AS bucket
      FROM customer
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           ROUND(SUM(c_acctbal), 4) AS bal_sum
    FROM b
    WHERE bucket < CASE WHEN c_mktsegment = 'BUILDING' THEN 30 ELSE 10 END
    GROUP BY c_mktsegment
    """,
)
def sample_stratified_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic STRATIFIED sample: per-stratum rates (30% for
    BUILDING, 10% elsewhere) via the same seed-free md5-bucket as
    sample_hash_deterministic — reproducible across engines and
    reruns, unlike sampleBy(fractions, seed) whose Bernoulli draws
    never match another engine. The rate CASE rides the scan; no
    shuffle before the per-stratum aggregate."""
    cust = read_table(spark, sf_dir, "customer")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 100
    )
    rate = F.when(F.col("c_mktsegment") == "BUILDING", 30).otherwise(10)
    return (
        cust.withColumn("bucket", bucket)
        .filter(F.col("bucket") < rate)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_sampled"),
            _r4(F.sum("c_acctbal")).alias("bal_sum"),
        )
    )


@query("sketch_hll_weekly_users")
def sketch_hll_weekly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: per-day HLL sketches of
    user_id, union-merged into weekly distinct estimates WITHOUT
    re-touching the raw events — the re-aggregation pattern that makes
    rollup marts feasible at 100 TB (store sketches per partition,
    merge for any coarser grain; exact distinct cannot re-aggregate).

    Rows-only driver check (DuckDB's approx sketch differs); estimate
    error vs exact distinct pinned in tests/test_analytics_accuracy.py.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    return (
        daily.groupBy(F.weekofyear("day").alias("wk"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                "approx_users"
            )
        )
        .select("wk", "approx_users")
    )


@query(
    "window_ranking_variants",
    oracle="""
    SELECT n_name,
           CAST(rnk AS INTEGER)  AS rnk,
           CAST(drnk AS INTEGER) AS drnk,
           CAST(tile AS INTEGER) AS tile,
           ROUND(pr, 4)          AS pr,
           ROUND(total_bal, 4)   AS total_bal
    FROM (
      SELECT n_name,
             SUM(c_acctbal) AS total_bal,
             RANK()         OVER (ORDER BY SUM(c_acctbal) DESC) AS rnk,
             DENSE_RANK()   OVER (ORDER BY SUM(c_acctbal) DESC) AS drnk,
             NTILE(4)       OVER (ORDER BY SUM(c_acctbal) DESC) AS tile,
             PERCENT_RANK() OVER (ORDER BY SUM(c_acctbal) DESC) AS pr
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    """,
)
def window_ranking_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank over an aggregate.

    A global (unpartitioned) window is a deliberate single-partition
    sort — fine over |nations| rows; the engine never does this over
    fact-table cardinality."""
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    per_nation = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("c_acctbal").alias("total_bal"))
    )
    w = Window.orderBy(F.col("total_bal").desc())
    return per_nation.select(
        "n_name",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("tile"),
        _r4(F.percent_rank().over(w)).alias("pr"),
        _r4(F.col("total_bal")).alias("total_bal"),
    )


@query(
    "window_first_last_order",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER w AS last_order,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit full frame (the default
    frame would make last_value = current row)."""
    orders = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        F.first_value("o_orderkey").over(w).alias("first_order"),
        F.last_value("o_orderkey").over(w).alias("last_order"),
        F.count("*").over(w).alias("n_orders"),
    ).distinct()


@query(
    "subquery_correlated_max_order",
    oracle="""
    SELECT c_custkey, c_name,
           (SELECT MAX(o_totalprice) FROM orders
            WHERE o_custkey = c_custkey) AS max_order
    FROM customer
    WHERE c_acctbal > 9000
    """,
)
def subquery_correlated_max_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — expressed via spark.sql to
    exercise the SQL front end; Catalyst decorrelates it into a left
    outer aggregate join (same plan the DataFrame form would build)."""
    from cdc_2025_spark.io import load_star_schema

    load_star_schema(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT MAX(o_totalprice) FROM orders
                WHERE o_custkey = c_custkey) AS max_order
        FROM customer
        WHERE c_acctbal > 9000
        """
    )


@query(
    "subquery_in_top_nations",
    oracle="""
    SELECT c_custkey, c_nationkey
    FROM customer
    WHERE c_nationkey IN (
      SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE r_name IN ('ASIA', 'EUROPE')
    )
    """,
)
def subquery_in_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery: customers in Asian/European nations (plans as a
    broadcast left-semi join over the tiny dim chain)."""
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    keys = nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        F.col("n_nationkey").alias("c_nationkey")
    )
    return cust.join(keys, "c_nationkey", "left_semi").select(
        "c_custkey", "c_nationkey"
    )


@query(
    "sample_hash_deterministic",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 4) AS revenue
    FROM orders
    WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
          % 10 = 0
    """,
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample via md5-bucket of the key — the
    engine-portable, seed-free sampling operator (rand()-based samples
    can never be oracle-checked; hash samples are reproducible across
    engines AND across reruns at 100 TB)."""
    orders = read_table(spark, sf_dir, "orders")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    return orders.filter(bucket == 0).agg(
        F.count("*").alias("n"), _r4(F.sum("o_totalprice")).alias("revenue")
    )


@query(
    "histogram_order_values",
    oracle="""
    WITH b AS (
      SELECT CAST(FLOOR(o_totalprice / 50000.0) AS INTEGER) AS bucket
      FROM orders
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY bucket
    """,
)
def histogram_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram — one aggregate over a computed bucket;
    the building block for distribution profiling at scale."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.withColumn(
            "bucket", F.floor(F.col("o_totalprice") / 50000.0).cast("int")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: top customers by returned-item revenue."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = read_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _r4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q2ish_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem WHERE l_quantity > 0
      GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey, l_suppkey, unit_cost,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY unit_cost, l_suppkey) AS rn
      FROM costs
    )
    SELECT b.l_partkey AS partkey, s_name,
           b.unit_cost AS unit_cost
    FROM best b JOIN supplier ON b.l_suppkey = s_suppkey
    WHERE rn = 1
    """,
)
def q2ish_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped: cheapest supplier per part (argmin via
    window over a pre-aggregate, then broadcast-join the dim)."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    supp = read_table(spark, sf_dir, "supplier")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    best = costs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    # unit_cost is NOT rounded: min over identical IEEE quotients is
    # bit-deterministic in both engines, whereas ROUND(x, 4) lands on
    # half-boundaries for decimal-friendly price/qty data and the two
    # engines' rounding implementations disagree there.
    return best.join(supp, best.l_suppkey == supp.s_suppkey).select(
        F.col("l_partkey").alias("partkey"),
        "s_name",
        F.col("unit_cost"),
    )


@query(
    "sql_api_grouping_sets",
    oracle="""
    SELECT n_name, o_orderstatus,
           ROUND(SUM(o_totalprice), 4) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (o_orderstatus), ())
    """,
)
def sql_api_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the engine's SQL front end —
    the registered-view path (io.load_star_schema) is itself part of
    the API surface."""
    from cdc_2025_spark.io import load_star_schema

    load_star_schema(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, o_orderstatus,
               ROUND(SUM(o_totalprice), 4) AS revenue,
               COUNT(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), (o_orderstatus), ())
        """
    )


@query(
    "sample_train_val_test_split",
    oracle="""
    WITH d AS (
      SELECT source,
             CASE WHEN len(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END
               AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 10 AS bucket
      FROM documents
    )
    SELECT source,
           CASE WHEN bucket < 8 THEN 'train'
                WHEN bucket < 9 THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM d GROUP BY 1, 2
    """,
)
def sample_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test corpus split on an
    md5 bucket of doc_id — stable under reruns, engine-portable, and
    independent of row order or partitioning (the properties a
    corpus split must have so training and eval never see membership
    drift). Emits per-(source, split) doc and token totals.

    Rides the scan: the bucket is computed map-side, the only shuffle
    is the final small rollup."""
    from cdc_2025_spark.functions.text import token_count

    docs = read_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 10
    )
    split = (
        F.when(bucket < 8, "train").when(bucket < 9, "val").otherwise("test")
    )
    return (
        docs.select(
            "source",
            split.alias("split"),
            token_count("text").alias("n_tokens"),
        )
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


@query(
    "sql_api_lateral_explode",
    oracle="""
    SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT source,
                 unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
          FROM documents)
    GROUP BY source, tok
    HAVING COUNT(*) >= 20
    """,
)
def sql_api_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode through the SQL front end — the HiveQL
    table-generating-function surface (vs the DataFrame F.explode the
    other text queries use). Per-(source, token) counts with a HAVING
    floor; DuckDB mirrors via unnest."""
    from cdc_2025_spark.io import load_star_schema

    load_star_schema(spark, sf_dir)
    return spark.sql(
        r"""
        SELECT source, tok, COUNT(*) AS n
        FROM documents
        LATERAL VIEW explode(split(trim(lower(text)), '\\s+')) t AS tok
        GROUP BY source, tok
        HAVING COUNT(*) >= 20
        """
    )


# above this per-key frame size the plain unpartitioned NTILE's
# single-task sort loses to the distributed two-level rank; below
# it the fixed costs (checkpoint, extra shuffles) dominate
NTILE_TWO_LEVEL_MIN = 1_000_000


@query(
    "window_ntile_spend_quartiles",
    oracle="""
    WITH spend AS (
      SELECT c_custkey, ROUND(SUM(o_totalprice), 4) AS total_spend
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey
    ), tiled AS (
      SELECT c_custkey, total_spend,
             CAST(NTILE(4) OVER (ORDER BY total_spend DESC, c_custkey)
                  AS INTEGER) AS quartile
      FROM spend
    )
    SELECT quartile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(total_spend), 4) AS quartile_spend,
           ROUND(MIN(total_spend), 4) AS floor_spend
    FROM tiled GROUP BY quartile
    """,
)
def window_ntile_spend_quartiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """NTILE(4) customer spend quartiles (the missing ranking-family
    member next to row_number/rank/dense_rank/percent_rank in
    window_ranking_variants), rolled up per quartile.

    Scale shape (r12 AUTO-SWITCH — the Spearman task's "auto-switch
    or flagged path" rule): below NTILE_TWO_LEVEL_MIN customers the
    plain unpartitioned NTILE runs (a single-task sort of a small
    aggregate is cheaper than any distributed construction — the
    0.25 s bench shape); above it, the exact total-order rank comes
    from the shared two-level bucketed construction
    (functions/ranks.py shape: spend-range buckets, within-bucket
    row_number windows over bounded partitions, bucket offsets from
    the bounded bucket-total frame) and NTILE's exact tile
    arithmetic folds in closed form from that rank (first n%%4
    tiles hold n//4 + 1 rows — the SQL-standard rule both engines
    implement, so the oracle's real NTILE matches bit-for-bit,
    verified exact at both test SFs). Deterministic via the unique
    c_custkey tiebreak; spend is rounded BEFORE tiling so both
    engines order identical doubles. Path equality is pinned in
    tests/test_analytics_accuracy.py."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    from pyspark.sql import Window

    spend = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("total_spend"))
    )
    # switch on the CUSTOMER count (a parquet-metadata aggregate —
    # no join executes), which upper-bounds the spend frame; the
    # fast path then runs the original single-pass plan with no
    # checkpoint and no extra action
    if cust.count() < NTILE_TWO_LEVEL_MIN:
        w = Window.orderBy(F.col("total_spend").desc(), "c_custkey")
        tiled = spend.withColumn("quartile", F.ntile(4).over(w))
        return tiled.groupBy("quartile").agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("total_spend"), 4).alias("quartile_spend"),
            F.round(F.min("total_spend"), 4).alias("floor_spend"),
        )
    spend = spend.localCheckpoint(
        eager=False
    )  # ONE collapse, three readers on the distributed path
    n_total = spend.count()
    # two-level total-order rank over (spend DESC, custkey ASC):
    # negate spend so ascending buckets give the descending order
    key = (-F.col("total_spend")).alias("_k")
    keyed = spend.select("c_custkey", "total_spend", key)
    rng = keyed.agg(
        F.min("_k").alias("_mn"), F.max("_k").alias("_mx")
    )
    nb = F.lit(1024)
    b = F.when(
        F.col("_mx") > F.col("_mn"),
        F.least(
            F.floor(
                (F.col("_k") - F.col("_mn"))
                / ((F.col("_mx") - F.col("_mn")) / nb)
            ),
            nb - 1,
        ),
    ).otherwise(F.lit(0))
    bucketed = keyed.crossJoin(F.broadcast(rng)).select(
        "c_custkey", "total_spend", "_k", b.cast("long").alias("_b")
    )
    w_in = Window.partitionBy("_b").orderBy("_k", "c_custkey")
    w_off = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        bucketed.groupBy("_b")
        .agg(F.count("*").alias("_bc"))
        .select(
            "_b",
            F.coalesce(F.sum("_bc").over(w_off), F.lit(0)).alias(
                "_boff"
            ),
        )
    )
    q, r = n_total // 4, n_total % 4
    rn = F.col("_boff") + F.row_number().over(w_in)
    # SQL-standard NTILE sizes: first r tiles hold q+1 rows
    tile = F.when(
        (F.lit(r) > 0) & (rn <= (q + 1) * r),
        F.ceil(rn / F.lit(float(q + 1))),
    ).otherwise(
        F.lit(r) + F.ceil((rn - (q + 1) * r) / F.lit(float(max(q, 1))))
    )
    tiled = (
        bucketed.join(F.broadcast(offsets), "_b")
        .withColumn("quartile", tile.cast("int"))
    )
    return tiled.groupBy("quartile").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("total_spend"), 4).alias("quartile_spend"),
        F.round(F.min("total_spend"), 4).alias("floor_spend"),
    )


CMS_TOP_K = 20


def _cms_oracle() -> str:
    from cdc_2025_spark.functions.cms import CMS_DEPTH, CMS_WIDTH

    return f"""
    WITH toks AS (
      SELECT ws[i] AS tok
      FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS ws
            FROM documents),
           unnest([i for i in range(1, len(ws) + 1)]) AS r(i)
    ),
    h AS (
      SELECT tok,
             CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS hi,
             CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS lo
      FROM (SELECT DISTINCT tok FROM toks)
    ),
    cells AS (
      SELECT r.i AS row, (h.hi + r.i * h.lo) % {CMS_WIDTH} AS col,
             COUNT(*) AS cnt
      FROM toks t JOIN h ON t.tok = h.tok,
           unnest([i for i in range(0, {CMS_DEPTH})]) AS r(i)
      GROUP BY 1, 2
    ),
    top AS (
      SELECT tok, COUNT(*) AS exact_n FROM toks GROUP BY tok
      ORDER BY exact_n DESC, tok LIMIT {CMS_TOP_K}
    ),
    probes AS (
      SELECT top.tok, top.exact_n, r.i AS row,
             (h.hi + r.i * h.lo) % {CMS_WIDTH} AS col
      FROM top JOIN h USING (tok),
           unnest([i for i in range(0, {CMS_DEPTH})]) AS r(i)
    )
    SELECT p.tok AS term,
           CAST(p.exact_n AS BIGINT) AS exact_n,
           CAST(MIN(c.cnt) AS BIGINT) AS cms_n
    FROM probes p JOIN cells c ON p.row = c.row AND p.col = c.col
    GROUP BY 1, 2
    """


@query("sketch_cms_heavy_terms", oracle=_cms_oracle())
def sketch_cms_heavy_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters with a COUNT-MIN estimate beside the exact count:
    the corpus's top-20 tokens (exact count desc, term asc)
    with the frequency each one reads out of a depth-4 x width-64
    count-min sketch (functions/cms.py — Cormode-Muthukrishnan, md5
    Kirsch-Mitzenmacher probes so the DuckDB oracle rebuilds the
    SAME table cell for cell).

    Why both numbers: cms_n >= exact_n always (one-sided error — the
    structural CMS guarantee, also pinned in tests/test_cms.py), and
    the visible gap on a deliberately narrow 64-column sketch IS the
    collision error the width knob trades against memory — this
    geometry is the COLLISION DEMO; a deployment derives its own
    from an (eps, delta) error budget via ``cms_params``
    (functions/cms.py: width = ceil(e/eps), depth = ceil(ln 1/delta)
    — 4x64 corresponds to eps ~ 4.2%, delta ~ 1.8%), the same
    posture as lsh_auto_geometry's recall target. At corpus
    scale the exact side of this query is the expensive one
    (distinct-term aggregate); the sketch side stays depth·width
    cells with map-side partials no matter how many tokens stream
    through — the operator a 100 TB pipeline keeps when it drops the
    exact pass. The two branches deliberately scan the source twice
    (no checkpoint of the exploded tokens): materializing a
    corpus-sized token explode costs more than a second scan-bound
    pass, and at deploy only the sketch branch runs at all.
    """
    from cdc_2025_spark.functions.cms import cms_estimate, cms_table
    from cdc_2025_spark.functions.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "tok")
        .limit(CMS_TOP_K)
    )
    sketch = cms_table(toks, "tok")
    return cms_estimate(sketch, top, "tok").select(
        F.col("tok").alias("term"),
        F.col("exact_n").cast("long").alias("exact_n"),
        F.col("cms_n").cast("long").alias("cms_n"),
    )


DRIFT_BIN_W = 10
DRIFT_BIN_CAP = 20


@query(
    "stats_source_length_drift",
    oracle=f"""
    WITH d AS (
      SELECT source,
             LEAST(CAST(FLOOR(
               (CASE WHEN len(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                END) / {DRIFT_BIN_W}) AS BIGINT), {DRIFT_BIN_CAP})
                 AS bin
      FROM documents
    ),
    obs AS (
      SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS o
      FROM d GROUP BY source, bin
    ),
    tot_s AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ns FROM obs
              GROUP BY source),
    tot_b AS (SELECT bin, CAST(SUM(o) AS BIGINT) AS nb FROM obs
              GROUP BY bin),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
    grid AS (
      SELECT s.source, b.bin, s.ns, b.nb, n.n,
             COALESCE(o.o, 0) AS o,
             s.ns * b.nb * 1.0 / n.n AS e
      FROM tot_s s CROSS JOIN tot_b b CROSS JOIN n
      LEFT JOIN obs o ON o.source = s.source AND o.bin = b.bin
    )
    SELECT source, MAX(ns) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(SUM((o - e) * (o - e) / e), 4) AS chi2
    FROM grid GROUP BY source
    """,
)
def stats_source_length_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source LENGTH-DISTRIBUTION DRIFT: Pearson chi-square of
    each source's token-length histogram against the corpus-wide
    expectation — the ingestion-monitoring statistic that flags a
    feed whose document shape shifted (truncation bug, boilerplate
    injection, scraper change) before any content-level check would.
    Bins are width-10 token buckets capped at bin 20; missing
    (source, bin) cells count with observed 0 (they carry drift
    signal; dropping them understates chi2).

    Shape: ONE corpus scan into a (sources × bins)-bounded count
    aggregate; every downstream step (margins, expectation grid,
    chi-square sum) runs on that tiny frame — the grid is a cross
    join of two sub-hundred-row sides, never anything corpus-sized.
    At 100 TB this is exactly the profile of a monitoring query:
    scan-bound, output bounded by |sources| regardless of corpus.
    """
    from cdc_2025_spark.functions.text import token_count

    docs = read_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        F.least(
            F.floor(token_count("text") / DRIFT_BIN_W),
            F.lit(DRIFT_BIN_CAP),
        )
        .cast("long")
        .alias("bin"),
    )
    obs = d.groupBy("source", "bin").agg(
        F.count("*").cast("long").alias("o")
    )
    tot_s = obs.groupBy("source").agg(F.sum("o").alias("ns"))
    tot_b = obs.groupBy("bin").agg(F.sum("o").alias("nb"))
    n = obs.agg(F.sum("o").alias("n"))
    grid = (
        tot_s.crossJoin(F.broadcast(tot_b))
        .crossJoin(F.broadcast(n))
        .join(obs, ["source", "bin"], "left")
        .select(
            "source",
            "bin",
            "ns",
            F.coalesce("o", F.lit(0)).alias("o"),
            (F.col("ns") * F.col("nb") / F.col("n")).alias("e"),
        )
    )
    return grid.groupBy("source").agg(
        F.max("ns").alias("n_docs"),
        F.count("*").cast("long").alias("n_bins"),
        F.round(
            F.sum(
                (F.col("o") - F.col("e"))
                * (F.col("o") - F.col("e"))
                / F.col("e")
            ),
            4,
        ).alias("chi2"),
    )


# Sketch-mode knobs shared by the planner-stats family: HLL relative
# standard deviation for ndv, and the rank-sketch accuracy (inverse
# relative rank error; memory is O(accuracy)) for percentiles /
# equi-depth boundaries.
SKETCH_NDV_RSD = 0.05
SKETCH_PCT_ACCURACY = 10_000


@query(
    "stats_analyze_lineitem",
    oracle="""
    WITH long AS MATERIALIZED (
      SELECT * FROM (
        SELECT 'l_quantity' AS col_name,
               CAST(l_quantity AS VARCHAR) AS val_str,
               CAST(l_quantity AS DOUBLE) AS val_num FROM lineitem
        UNION ALL SELECT 'l_extendedprice',
               CAST(l_extendedprice AS VARCHAR), l_extendedprice
          FROM lineitem
        UNION ALL SELECT 'l_returnflag', l_returnflag, NULL
          FROM lineitem
        UNION ALL SELECT 'l_shipdate',
               CAST(CAST(l_shipdate AS DATE) AS VARCHAR), NULL
          FROM lineitem
      )
    ),
    a AS (
      SELECT col_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN val_str IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_null,
             CAST(COUNT(DISTINCT val_str) AS BIGINT) AS n_distinct,
             COALESCE(CAST(MIN(val_num) AS VARCHAR), MIN(val_str))
                 AS min_val,
             COALESCE(CAST(MAX(val_num) AS VARCHAR), MAX(val_str))
                 AS max_val,
             ROUND(quantile_disc(val_num, 0.5), 4) AS p50
      FROM long GROUP BY col_name
    ),
    m AS (
      SELECT col_name, val_str AS mcv_val,
             CAST(c AS BIGINT) AS mcv_count
      FROM (SELECT col_name, val_str, COUNT(*) AS c,
                   row_number() OVER (
                     PARTITION BY col_name
                     ORDER BY COUNT(*) DESC, val_str ASC) AS rn
            FROM long WHERE val_str IS NOT NULL
            GROUP BY col_name, val_str)
      WHERE rn = 1
    )
    SELECT a.col_name, n_rows, n_null, n_distinct, min_val, max_val,
           p50, m.mcv_val, m.mcv_count
    FROM a JOIN m USING (col_name)
    """,
)
def stats_analyze_lineitem(
    spark: SparkSession, sf_dir: str, mode: str = "exact"
) -> DataFrame:
    """ANALYZE-style optimizer statistics for four lineitem columns
    in one fact scan: row/null/ndv counts, typed min/max, disc median
    and the most-common value with its frequency — the per-column
    stats a cost-based optimizer (or a data-quality monitor) collects
    before planning joins and pruning partitions.

    Shape: the scan reads ONLY the four stat'd columns (pushdown
    ReadSchema); stack() unpivots map-side; the moment aggregate is
    one shuffle with partial aggregation, and the MCV pick is a
    min_by(struct(-count, val)) aggregate over the (col, val) count
    frame — map-side partials, NO per-column window, so a high-ndv
    column never funnels through one task. Ties break deterministic:
    highest count, then smallest value string (mirrored by the
    oracle's row_number ordering). l_shipdate is stat'd at DAY
    granularity (the partition-pruning statistic) so the string
    rendering is engine-identical.

    100 TB note — ``mode`` selects the scale path: the default
    ``"exact"`` keeps COUNT(DISTINCT) (an Expand) and the exact disc
    median so the DuckDB oracle pins value-level parity;
    ``mode="sketch"`` swaps ndv for the HLL sketch
    (approx_count_distinct, rsd=``SKETCH_NDV_RSD``) and the median
    for the rank-sketch percentile (percentile_approx at
    ``SKETCH_PCT_ACCURACY``) — both mergeable tree-aggregates with
    NO Expand and no per-column value funnel, the plan that survives
    unique-ish columns (ids, timestamps) at cluster scale.
    Cross-mode agreement on bounded domains is pinned in
    test_analytics_accuracy.py."""
    if mode not in ("exact", "sketch"):
        raise ValueError("stats_analyze_lineitem: mode is 'exact'|'sketch'")
    li = read_table(spark, sf_dir, "lineitem")
    long = li.select(
        F.expr(
            """stack(4,
 'l_quantity', cast(l_quantity as string), cast(l_quantity as double),
 'l_extendedprice', cast(l_extendedprice as string),
     cast(l_extendedprice as double),
 'l_returnflag', l_returnflag, cast(null as double),
 'l_shipdate', cast(cast(l_shipdate as date) as string),
     cast(null as double))
 as (col_name, val_str, val_num)"""
        )
    )
    ndv = (
        F.countDistinct("val_str")
        if mode == "exact"
        else F.approx_count_distinct("val_str", SKETCH_NDV_RSD).cast(
            "long"
        )
    )
    p50 = (
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY val_num)")
        if mode == "exact"
        else F.percentile_approx(
            "val_num", F.lit(0.5), F.lit(SKETCH_PCT_ACCURACY)
        )
    )
    moments = long.groupBy("col_name").agg(
        F.count("*").alias("n_rows"),
        F.sum(
            F.when(F.col("val_str").isNull(), 1).otherwise(0)
        ).alias("n_null"),
        ndv.alias("n_distinct"),
        F.coalesce(
            F.expr("cast(min(val_num) as string)"), F.min("val_str")
        ).alias("min_val"),
        F.coalesce(
            F.expr("cast(max(val_num) as string)"), F.max("val_str")
        ).alias("max_val"),
        F.round(p50, 4).alias("p50"),
    )
    cnt = (
        long.filter(F.col("val_str").isNotNull())
        .groupBy("col_name", "val_str")
        .agg(F.count("*").alias("cnt"))
    )
    mcv = cnt.groupBy("col_name").agg(
        F.min_by(
            F.struct(F.col("val_str"), F.col("cnt")),
            F.struct((-F.col("cnt")).alias("nc"), F.col("val_str")),
        ).alias("pick")
    ).select(
        "col_name",
        F.col("pick.val_str").alias("mcv_val"),
        F.col("pick.cnt").alias("mcv_count"),
    )
    return moments.join(F.broadcast(mcv), "col_name").select(
        "col_name",
        "n_rows",
        "n_null",
        "n_distinct",
        "min_val",
        "max_val",
        "p50",
        "mcv_val",
        "mcv_count",
    )


KMV_K = 128
KMV_SCALE = 1 << 48  # 12 md5 hex chars of priority space


def _kmv_est(k_n, kth):
    """KMV distinct estimate: (K-1)·SCALE / h_(K) when the sketch is
    full, exact size otherwise (integer-only inputs -> bit-identical
    doubles across engines)."""
    return F.when(
        k_n >= KMV_K,
        F.lit(float(KMV_K - 1))
        * F.lit(float(KMV_SCALE))
        / F.greatest(kth, F.lit(1)),
    ).otherwise(k_n.cast("double"))


@query(
    "sketch_kmv_distinct_overlap",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE user_id IS NOT NULL
    ),
    pr AS (
      SELECT event_type, user_id,
             CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)),
                                  1, 12)) AS BIGINT) AS prio
      FROM du
    ),
    sk AS (
      SELECT event_type, user_id, prio FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY event_type ORDER BY prio, user_id) AS rn
        FROM pr) WHERE rn <= {KMV_K}
    ),
    est AS (
      SELECT event_type,
             CASE WHEN COUNT(*) >= {KMV_K}
                  THEN {KMV_K - 1} * {KMV_SCALE} * 1.0
                       / GREATEST(MAX(prio), 1)
                  ELSE COUNT(*) * 1.0 END AS est_d
      FROM sk GROUP BY event_type
    ),
    tp AS (SELECT DISTINCT event_type FROM sk),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM tp a JOIN tp b ON a.event_type < b.event_type
    ),
    mem AS (
      SELECT p.type_a, p.type_b, s.user_id, MIN(s.prio) AS prio,
             MAX(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END)
                 AS has_a,
             MAX(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END)
                 AS has_b
      FROM pairs p JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
      GROUP BY 1, 2, 3
    ),
    us AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY type_a, type_b ORDER BY prio, user_id) AS rn
        FROM mem) WHERE rn <= {KMV_K}
    ),
    pa AS (
      SELECT type_a, type_b, COUNT(*) AS k_u, MAX(prio) AS kth_u,
             SUM(has_a * has_b) AS n_both
      FROM us GROUP BY 1, 2
    ),
    uest AS (
      SELECT type_a, type_b, k_u, n_both,
             CASE WHEN k_u >= {KMV_K}
                  THEN {KMV_K - 1} * {KMV_SCALE} * 1.0
                       / GREATEST(kth_u, 1)
                  ELSE k_u * 1.0 END AS est_union
      FROM pa
    )
    SELECT u.type_a, u.type_b,
           ROUND(ea.est_d, 4) AS est_a,
           ROUND(eb.est_d, 4) AS est_b,
           ROUND(u.est_union, 4) AS est_union,
           ROUND(u.n_both * 1.0 / u.k_u, 4) AS jaccard_kmv,
           ROUND(u.n_both * 1.0 / u.k_u * u.est_union, 4)
               AS est_intersection
    FROM uest u
    JOIN est ea ON ea.event_type = u.type_a
    JOIN est eb ON eb.event_type = u.type_b
    """,
)
def sketch_kmv_distinct_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KMV (k-minimum-values) distinct sketches with SET ALGEBRA:
    per-event-type bottom-K user hashes estimate each type's distinct
    users AND — unlike HLL, which only unions — every pair's union,
    Jaccard, and INTERSECTION (Beyer et al., "On synopses for
    distinct-value estimation under multiset operations", SIGMOD'07;
    bottom-k mergeability per Cohen & Kaplan PODC'07, the same
    primitive functions/reservoir.py registers as a sample). The
    audience-overlap / cross-source-contamination estimator: "how
    many users do purchase and signup share?" from K·|types| stored
    hashes instead of a user-grain COUNT(DISTINCT) self-join.

    Estimators (deterministic — md5 priorities, integer inputs, one
    float expression shape on both engines, so the driver hash is
    exact): per-set D = (K-1)·S/h_(K) when full, exact below K;
    pair Jaccard rho = |L ∩ A ∩ B| / |L| over the union sketch
    L = bottomK(A ∪ B); intersection = rho·D_union.

    Shape, built to scale: the corpus-sized work is ONE distinct
    aggregate on (type, user) — map-side partial dedup, the shuffle
    every exact distinct needs anyway. The bottom-K take is
    TWO-PHASE (per-(type, prio mod 64 bucket) partial top-K, then
    per-type on the <= 64·K survivors), so no single task ever sorts
    a whole type's users — the salted-top-k layout that holds at
    1000 executors. Everything after runs on <= |types|·K sketch
    rows: the pair expansion is a broadcast of 10 pair rows against
    640 sketch rows. Sketches are MERGEABLE (union + re-take), so
    shards and stream microbatches maintain them incrementally —
    same contract as the Bloom/CMS/HLL/reservoir summaries.
    """
    ev = read_table(spark, sf_dir, "events")
    du = (
        ev.filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
    )
    prio = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("kmv:"), F.col("user_id").cast("string")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("prio")
    )
    pr = du.select("event_type", "user_id", prio)
    # two-phase bottom-K: bucketed partial take, then the real take
    # on the bounded survivor frame
    wb = Window.partitionBy(
        "event_type", F.pmod(F.col("prio"), F.lit(64))
    ).orderBy("prio", "user_id")
    part = pr.withColumn("rb", F.row_number().over(wb)).filter(
        F.col("rb") <= KMV_K
    )
    wt = Window.partitionBy("event_type").orderBy("prio", "user_id")
    sk = (
        part.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "user_id", "prio")
        .localCheckpoint(eager=False)
    )
    est = sk.groupBy("event_type").agg(
        _kmv_est(F.count("*"), F.max("prio")).alias("est_d")
    )
    tp = sk.select("event_type").distinct()
    pairs = (
        tp.alias("a")
        .crossJoin(tp.alias("b"))
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
    )
    mem = (
        F.broadcast(pairs)
        .join(
            sk,
            (sk["event_type"] == F.col("type_a"))
            | (sk["event_type"] == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "user_id")
        .agg(
            F.min("prio").alias("prio"),
            F.max(
                (F.col("event_type") == F.col("type_a")).cast("int")
            ).alias("has_a"),
            F.max(
                (F.col("event_type") == F.col("type_b")).cast("int")
            ).alias("has_b"),
        )
    )
    wu = Window.partitionBy("type_a", "type_b").orderBy(
        "prio", "user_id"
    )
    us = mem.withColumn("rn", F.row_number().over(wu)).filter(
        F.col("rn") <= KMV_K
    )
    pa = us.groupBy("type_a", "type_b").agg(
        F.count("*").alias("k_u"),
        F.max("prio").alias("kth_u"),
        F.sum(F.col("has_a") * F.col("has_b")).alias("n_both"),
    )
    uest = pa.select(
        "type_a",
        "type_b",
        "k_u",
        "n_both",
        _kmv_est(F.col("k_u"), F.col("kth_u")).alias("est_union"),
    )
    ea = est.select(
        F.col("event_type").alias("type_a"),
        F.col("est_d").alias("raw_a"),
    )
    eb = est.select(
        F.col("event_type").alias("type_b"),
        F.col("est_d").alias("raw_b"),
    )
    return (
        uest.join(F.broadcast(ea), "type_a")
        .join(F.broadcast(eb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.round("raw_a", 4).alias("est_a"),
            F.round("raw_b", 4).alias("est_b"),
            F.round("est_union", 4).alias("est_union"),
            F.round(F.col("n_both") / F.col("k_u"), 4).alias(
                "jaccard_kmv"
            ),
            F.round(
                F.col("n_both") / F.col("k_u") * F.col("est_union"), 4
            ).alias("est_intersection"),
        )
    )


SKEW_HOT_FACTOR = 2.0  # a key is "hot" above 2x the mean key load
SKEW_MAX_SALT = 64


@query(
    "stats_join_skew_advisor",
    oracle=f"""
    WITH k AS (
      SELECT event_type AS join_key,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM events GROUP BY 1
    ),
    t AS (
      SELECT SUM(n_rows) AS total,
             COUNT(*) AS n_keys
      FROM k
    )
    SELECT k.join_key, k.n_rows,
           ROUND(k.n_rows * 1.0 / t.total, 4) AS frac,
           ROUND(k.n_rows * t.n_keys * 1.0 / t.total, 4)
               AS skew_factor,
           k.n_rows * t.n_keys * 1.0 / t.total > {SKEW_HOT_FACTOR}
               AS is_hot,
           CAST(CASE WHEN k.n_rows * t.n_keys * 1.0 / t.total
                          > {SKEW_HOT_FACTOR}
                     THEN LEAST({SKEW_MAX_SALT},
                          CEIL(k.n_rows * t.n_keys * 1.0 / t.total))
                     ELSE 1 END AS BIGINT) AS recommended_salt
    FROM k CROSS JOIN t
    """,
)
def stats_join_skew_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Join-skew ADVISOR: per-key load profile of a prospective
    shuffle-join key with a derived salting plan — the measurement
    step that turns skewjoin_salted_event_types' hand-pinned
    n_salt=16 into a number the data chose. For each key: row count,
    corpus fraction, skew_factor = load vs the mean key (the
    straggler multiplier a hash-partitioned shuffle would see), and
    recommended_salt = ceil(skew_factor) capped at SKEW_MAX_SALT (64)
    for keys above the SKEW_HOT_FACTOR (2x) hot threshold — the salt
    that flattens the hot key back to ~mean-sized sub-partitions
    (feed it to functions/joins.py salted_join; AQE's
    skewedPartitionFactor=5 rebalance is the runtime fallback when
    the key never reaches a groupBy).

    Deterministic: counts are integers, ratios one double expression
    per engine, ceil/least on exact quotients of integers — the
    driver hash is exact.

    Shape, built to scale: ONE grouped count over the key column
    (map-side partials — each partition emits at most |keys| rows),
    then all ratio/threshold work runs on the |keys|-row frame
    against a 1-row broadcast total. Profiling a 100 TB join key
    costs one column scan; that is the point — measure before you
    shuffle.
    """
    ev = read_table(spark, sf_dir, "events")
    k = ev.groupBy(F.col("event_type").alias("join_key")).agg(
        F.count("*").alias("n_rows")
    )
    t = k.agg(
        F.sum("n_rows").alias("total"), F.count("*").alias("n_keys")
    )
    sf = F.col("n_rows") * F.col("n_keys") / F.col("total")
    return k.crossJoin(F.broadcast(t)).select(
        "join_key",
        "n_rows",
        F.round(F.col("n_rows") / F.col("total"), 4).alias("frac"),
        F.round(sf, 4).alias("skew_factor"),
        (sf > SKEW_HOT_FACTOR).alias("is_hot"),
        F.when(
            sf > SKEW_HOT_FACTOR,
            F.least(F.lit(SKEW_MAX_SALT), F.ceil(sf)),
        )
        .otherwise(F.lit(1))
        .cast("long")
        .alias("recommended_salt"),
    )


EQUIDEPTH_BUCKETS = 8


def _equidepth_case(col: str, pick: str) -> str:
    """CASE expression assigning ``col`` to its equi-depth bucket
    (pick='bucket') or the bucket's upper boundary (pick='hi') —
    identical SQL text on both engines."""
    arms = []
    for i in range(1, EQUIDEPTH_BUCKETS):
        arms.append(
            f"WHEN {col} <= b{i} THEN "
            + (str(i) if pick == "bucket" else f"b{i}")
        )
    tail = (
        str(EQUIDEPTH_BUCKETS)
        if pick == "bucket"
        else f"b{EQUIDEPTH_BUCKETS}"
    )
    return "CASE " + " ".join(arms) + f" ELSE {tail} END"


@query(
    "stats_equidepth_histogram",
    oracle=f"""
    WITH b AS (
      SELECT
        {", ".join(
            f"quantile_disc(l_extendedprice, {i / EQUIDEPTH_BUCKETS})"
            f" AS b{i}"
            for i in range(1, EQUIDEPTH_BUCKETS)
        )},
        MAX(l_extendedprice) AS b{EQUIDEPTH_BUCKETS},
        COUNT(*) AS total
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL
    ),
    a AS (
      SELECT {_equidepth_case("l_extendedprice", "bucket")} AS bucket,
             {_equidepth_case("l_extendedprice", "hi")} AS hi,
             total
      FROM lineitem CROSS JOIN b
      WHERE l_extendedprice IS NOT NULL
    )
    SELECT bucket, hi,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(COUNT(*) * 1.0 / MAX(total), 4) AS frac
    FROM a GROUP BY bucket, hi
    """,
)
def stats_equidepth_histogram(
    spark: SparkSession, sf_dir: str, mode: str = "exact"
) -> DataFrame:
    """Equi-depth (equi-height) histogram of a fact column — THE
    optimizer statistic for range-predicate selectivity (Spark CBO's
    `spark.sql.statistics.histogram.enabled` builds exactly this;
    Selinger'79 assumed uniform, equi-depth is what replaced it).
    Complements the planner-stats family: `stats_analyze_lineitem`
    (per-column moments/ndv/MCV) and `stats_join_skew_advisor`
    (per-key shuffle load) — this adds range selectivity: any
    predicate `lo < x <= hi` estimates as the covered bucket
    fraction, error bounded by 2/n_buckets regardless of the value
    distribution (the equi-depth guarantee equi-WIDTH histograms
    lack under skew, cf. `histogram_order_values`).

    Determinism: boundaries are disc percentiles — actual data
    values, bit-identical across engines (percentile_disc ==
    quantile_disc, verified across a p grid); bucket membership is
    exact double comparison against those values; counts are
    integers. The driver hash is exact.

    Shape, built to scale: ONE corpus scan, collapsed by a grouped
    count onto the DISTINCT-VALUE frame (map-side partials); every
    rank statistic then runs on that frame — rows_below(v) via one
    cumulative window, bucket(v) = 1 + #{i : ceil(i*n/B) <=
    rows_below(v)} (the closed form of "first boundary at or above
    v": boundary b_i is the smallest value whose cumulative count
    reaches rank ceil(i*n/B), so each nonempty bucket's max value IS
    its boundary — hi = max(v) per bucket, no boundary join). The
    single-partition window is over distinct values, NOT rows — the
    frame that plateaus for price/score-like domains while the
    corpus grows (an earlier construction collected and sorted ALL
    rows on one reducer: 2.3x wall at a 10x replica whose distinct
    set was constant; this one is flat there). For genuinely
    unbounded-cardinality domains the exact contract still ceilings
    at |distinct| — ``mode="kll"`` is that 100 TB path: boundaries
    come from ONE rank-sketch aggregate (percentile_approx at
    ``SKETCH_PCT_ACCURACY`` — a mergeable tree-aggregate, no window
    anywhere), ride back as B-1 literal doubles, and bucket counting
    is a plain grouped count — every stage parallel at any
    cardinality, per-bucket depth error bounded by the sketch's rank
    error (n/accuracy rows). Exact mode stays the oracle path;
    cross-mode agreement (exact boundary equality on a
    small-distinct domain, depth-error bound on the price domain) is
    pinned in test_analytics_accuracy.py alongside the
    percentile_disc == quantile_disc equality grid.
    """
    if mode not in ("exact", "kll"):
        raise ValueError(
            "stats_equidepth_histogram: mode is 'exact'|'kll'"
        )
    # NULL prices are excluded identically on both engines (the
    # chunking-parity rule): they carry no range information, and an
    # unfiltered CASE would silently file them under the last bucket
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice").isNotNull())
        .select(F.col("l_extendedprice").alias("v"))
    )
    if mode == "kll":
        return _equidepth_kll(li)
    # ONE corpus collapse, materialized: cnt feeds the rank helper,
    # the total, and the join-back — un-checkpointed, each reference
    # re-scans the corpus (no adaptive exchange reuse, measured)
    cnt = (
        li.groupBy("v")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    # rows_below via the shared two-level bucketed rank
    # (functions/ranks.py): the previous unpartitioned cumulative
    # window held EVERY distinct price in one task — fine on a
    # ties-replica 10x (distinct constant), a ceiling when distinct
    # values grow with the corpus. cum_smaller = midrank - (c+1)/2,
    # an exact integer-backed rational. The 1-row total broadcasts;
    # AQE exchange reuse serves both subtrees from one groupBy
    # shuffle.
    from cdc_2025_spark.functions.ranks import (  # noqa: PLC0415
        bucketed_midranks,
    )

    total = cnt.agg(F.sum("c").alias("total"))
    # carry_cols keeps the per-value count in the kernel output —
    # the r15 shape re-joined cnt onto the ranks just to get "c"
    # back, one full distinct-value exchange join per action (r16)
    ranked = (
        bucketed_midranks(cnt, "v", "c", "r", carry_cols=("c",))
        .crossJoin(F.broadcast(total))
        .select(
            "v",
            "c",
            "total",
            (F.col("r") - (F.col("c") + 1) / 2.0)
            .cast("long")
            .alias("rows_below"),
        )
    ).select(
        "v",
        "c",
        "total",
        (
            1
            + sum(
                (
                    F.ceil(
                        F.lit(i / EQUIDEPTH_BUCKETS) * F.col("total")
                    )
                    <= F.col("rows_below")
                ).cast("int")
                for i in range(1, EQUIDEPTH_BUCKETS)
            )
        ).alias("bucket"),
    )
    return ranked.groupBy("bucket").agg(
        F.max("v").alias("hi"),
        F.sum("c").cast("long").alias("n_rows"),
        F.round(F.sum("c") / F.max("total"), 4).alias("frac"),
    )


def _equidepth_kll(li: DataFrame) -> DataFrame:
    """Sketch-mode equi-depth histogram (same output schema as the
    exact path): B-1 boundaries from one mergeable rank-sketch
    aggregate, collected as literal doubles (a bounded, B-sized
    driver hop), then one grouped count over literal comparisons —
    no window, no distinct-value frame, parallel at any column
    cardinality."""
    stat = li.agg(
        F.percentile_approx(
            "v",
            F.array(
                *[
                    F.lit(i / EQUIDEPTH_BUCKETS)
                    for i in range(1, EQUIDEPTH_BUCKETS)
                ]
            ),
            F.lit(SKETCH_PCT_ACCURACY),
        ).alias("bs"),
        F.count("*").alias("n"),
    ).first()
    bounds, total = stat["bs"], stat["n"]
    if not bounds or not total:
        # empty/all-NULL input: the sketch returns NULL — match the
        # exact path's empty frame instead of crashing on iteration
        return li.sparkSession.createDataFrame(
            [], "bucket int, hi double, n_rows long, frac double"
        )
    bucket = (
        1
        + sum(
            (F.col("v") > F.lit(float(b))).cast("int") for b in bounds
        )
    ).alias("bucket")
    return (
        li.select("v", bucket)
        .groupBy("bucket")
        .agg(
            F.max("v").alias("hi"),
            F.count("*").cast("long").alias("n_rows"),
            F.round(F.count("*") / F.lit(float(total)), 4).alias("frac"),
        )
    )


CARD_MCV_K = 3  # MCV entries kept by the mcv+tail estimator


@query(
    "stats_join_cardinality_estimate",
    oracle=f"""
    WITH r AS (
      SELECT event_type AS k, CAST(COUNT(*) AS BIGINT) AS cr
      FROM events
      WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                 AS BIGINT) % 2 = 0
      GROUP BY 1
    ),
    s AS (
      SELECT event_type AS k, CAST(COUNT(*) AS BIGINT) AS cs
      FROM events
      WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                 AS BIGINT) % 2 = 1
      GROUP BY 1
    ),
    pk AS (
      SELECT COALESCE(r.k, s.k) AS k,
             COALESCE(r.cr, 0) AS cr,
             COALESCE(s.cs, 0) AS cs,
             ROW_NUMBER() OVER (ORDER BY COALESCE(r.cr, 0) DESC,
                                COALESCE(r.k, s.k)) <= {CARD_MCV_K}
                 AS is_mcv
      FROM r FULL OUTER JOIN s ON r.k = s.k
    ),
    agg AS (
      SELECT SUM(cr * cs) AS actual,
             SUM(cr) AS nr, SUM(cs) AS ns,
             SUM(CASE WHEN cr > 0 THEN 1 ELSE 0 END) AS ndvr,
             SUM(CASE WHEN cs > 0 THEN 1 ELSE 0 END) AS ndvs,
             SUM(CASE WHEN is_mcv THEN cr * cs ELSE 0 END) AS mcv_exact,
             SUM(CASE WHEN is_mcv THEN cr ELSE 0 END) AS mcv_nr,
             SUM(CASE WHEN is_mcv THEN cs ELSE 0 END) AS mcv_ns,
             SUM(CASE WHEN is_mcv AND cr > 0 THEN 1 ELSE 0 END)
                 AS mcv_ndvr,
             SUM(CASE WHEN is_mcv AND cs > 0 THEN 1 ELSE 0 END)
                 AS mcv_ndvs
      FROM pk
    ),
    est AS (
      SELECT 'uniform_ndv' AS method,
             CAST(nr * ns AS DOUBLE) / GREATEST(ndvr, ndvs)
                 AS est_rows, actual
      FROM agg
      UNION ALL
      SELECT 'mcv_top{CARD_MCV_K}_uniform_tail',
             mcv_exact
             + CAST((nr - mcv_nr) * (ns - mcv_ns) AS DOUBLE)
               / GREATEST(ndvr - mcv_ndvr, ndvs - mcv_ndvs, 1),
             actual
      FROM agg
      UNION ALL
      SELECT 'perkey_exact', CAST(actual AS DOUBLE), actual FROM agg
    )
    SELECT method,
           ROUND(est_rows, 4) AS est_rows,
           CAST(actual AS BIGINT) AS actual_rows,
           CASE WHEN actual > 0
                THEN ROUND(ABS(est_rows - actual) / actual, 4)
           END AS rel_error
    FROM est
    """,
)
def stats_join_cardinality_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Join-output-size estimation from per-side key statistics —
    the CBO ladder (Selinger et al. SIGMOD'79 uniform-ndv; MCV +
    uniform tail, the System-R refinement PostgreSQL and Spark CBO
    ship; full per-key histogram = exact) demonstrated on a
    prospective self-equi-join of old-half x new-half events on the
    Zipf-skewed event_type key, WITHOUT executing the join. The
    measure-before-you-shuffle planner family:
    `stats_analyze_lineitem` (column stats), `stats_equidepth_
    histogram` (range selectivity), `stats_join_skew_advisor`
    (per-key load) — this one prices the join itself; under skew the
    uniform estimate undershoots (sum of squares vs square of sums)
    and the output quantifies by exactly how much.

    Halves via the seed-free md5-parity split (the
    `sample_hash_deterministic` convention) so both engines and
    every rerun see identical sides.

    Determinism: every statistic is an integer aggregate; each
    estimate is one double expression of integers with identical
    shape in both engines; MCV pick is row_number with a full
    tiebreak (count DESC, key ASC). The driver hash is exact.

    Shape, built to scale: ONE grouped count per side (map-side
    partials, <= |keys| rows each), a full-outer join of the two
    |keys|-row frames, one window + one aggregate over that frame,
    and a 3-row stack — the estimate costs two column scans; the
    join it prices would cost sum(cr*cs) row materializations.
    """
    ev = read_table(spark, sf_dir, "events")
    parity = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
            16,
            10,
        ).cast("long")
        % 2
    )
    sides = ev.select(F.col("event_type").alias("k"), parity.alias("p"))
    cnt = lambda pv, nm: (  # noqa: E731
        sides.filter(F.col("p") == pv)
        .groupBy("k")
        .agg(F.count("*").alias(nm))
    )
    pk = (
        cnt(0, "cr")
        .join(cnt(1, "cs"), "k", "full_outer")
        .select(
            F.coalesce("cr", F.lit(0)).alias("cr"),
            F.coalesce("cs", F.lit(0)).alias("cs"),
            "k",
        )
        .withColumn(
            "is_mcv",
            F.row_number().over(
                Window.orderBy(F.col("cr").desc(), F.col("k"))
            )
            <= CARD_MCV_K,
        )
    )
    mc = lambda c: F.when(F.col("is_mcv"), c).otherwise(F.lit(0))  # noqa: E731
    agg = pk.agg(
        F.sum(F.col("cr") * F.col("cs")).alias("actual"),
        F.sum("cr").alias("nr"),
        F.sum("cs").alias("ns"),
        F.sum((F.col("cr") > 0).cast("long")).alias("ndvr"),
        F.sum((F.col("cs") > 0).cast("long")).alias("ndvs"),
        F.sum(mc(F.col("cr") * F.col("cs"))).alias("mcv_exact"),
        F.sum(mc(F.col("cr"))).alias("mcv_nr"),
        F.sum(mc(F.col("cs"))).alias("mcv_ns"),
        F.sum(mc((F.col("cr") > 0).cast("long"))).alias("mcv_ndvr"),
        F.sum(mc((F.col("cs") > 0).cast("long"))).alias("mcv_ndvs"),
    )
    est = agg.select(
        F.expr(
            f"""stack(3,
            'uniform_ndv',
            CAST(nr * ns AS DOUBLE) / GREATEST(ndvr, ndvs),
            actual,
            'mcv_top{CARD_MCV_K}_uniform_tail',
            mcv_exact + CAST((nr - mcv_nr) * (ns - mcv_ns) AS DOUBLE)
                / GREATEST(ndvr - mcv_ndvr, ndvs - mcv_ndvs, 1),
            actual,
            'perkey_exact', CAST(actual AS DOUBLE), actual
            ) AS (method, est_rows, actual)"""
        )
    )
    return est.select(
        "method",
        F.round("est_rows", 4).alias("est_rows"),
        F.col("actual").cast("long").alias("actual_rows"),
        # actual = 0 (disjoint key sets) leaves rel_error undefined
        # rather than tripping ANSI divide-by-zero
        F.when(
            F.col("actual") > 0,
            F.round(
                F.abs(F.col("est_rows") - F.col("actual"))
                / F.col("actual"),
                4,
            ),
        ).alias("rel_error"),
    )
