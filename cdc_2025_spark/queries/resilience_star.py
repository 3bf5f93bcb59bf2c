"""The reference's flagship metrics (drawdown / years-to-recovery,
src/features/resilience.py:29-76) applied to the star-schema testdata —
the same generalized operator as cdc_2025_spark.reference.resilience,
oracle-checked end to end.

Nations play the role of industries; yearly order revenue plays
Real_Value; 1997 is the base year and 1998 the shock year (the data
spans 1995-2001).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_2025_spark.io import read_table
from cdc_2025_spark.queries.registry import query
from cdc_2025_spark.reference.resilience import resilience_metrics

BASE, SHOCK, HORIZON = 1997, 1998, 3


@query(
    "resilience_nation_revenue",
    oracle=f"""
    WITH yearly AS (
      SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS yr,
             SUM(o_totalprice) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    ), base AS (
      SELECT n_name, rev AS v_base FROM yearly WHERE yr = {BASE}
    )
    SELECT y.n_name AS n_name,
           ROUND((MAX(CASE WHEN y.yr = {SHOCK} THEN y.rev END) - MAX(b.v_base))
                 / MAX(b.v_base), 4) AS drawdown,
           CAST(MIN(CASE WHEN y.yr BETWEEN {BASE + 1} AND {SHOCK + HORIZON}
                          AND y.rev >= b.v_base
                         THEN y.yr - {BASE} END) AS INTEGER) AS recovered_years
    FROM yearly y JOIN base b ON y.n_name = b.n_name
    GROUP BY y.n_name
    """,
)
def resilience_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drawdown/recovery of yearly national revenue around 1998 — the
    reference's A4/A5 aggregates (resilience.py:31-66) as one
    distributed pass over pre-aggregated (nation, year) revenue.

    The oracle's join-on-base form is the SQL spelling of the same
    "groups without a base year are absent" semantics
    (resilience.py:36-37 continue)."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    yearly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    out = resilience_metrics(
        yearly,
        group_col="n_name",
        year_col="yr",
        value_col="rev",
        base_year=BASE,
        shock_year=SHOCK,
        horizon=HORIZON,
    )
    return out.select(
        "n_name",
        F.round("Drawdown_2020", 4).alias("drawdown"),
        F.col("Recovered_Years").cast("int").alias("recovered_years"),
    )


@query(
    "shock_sim_nation_revenue",
    oracle=f"""
    WITH yearly AS (
      SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS yr,
             SUM(o_totalprice) *
               CASE WHEN CAST(year(o_orderdate) AS INTEGER) = {SHOCK}
                    THEN 0.75 ELSE 1.0 END AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    ), base AS (
      SELECT n_name, rev AS v_base FROM yearly WHERE yr = {BASE}
    )
    SELECT y.n_name AS n_name,
           ROUND((MAX(CASE WHEN y.yr = {SHOCK} THEN y.rev END) - MAX(b.v_base))
                 / MAX(b.v_base), 4) AS drawdown,
           CAST(MIN(CASE WHEN y.yr BETWEEN {BASE + 1} AND {SHOCK + HORIZON}
                          AND y.rev >= b.v_base
                         THEN y.yr - {BASE} END) AS INTEGER) AS recovered_years
    FROM yearly y JOIN base b ON y.n_name = b.n_name
    GROUP BY y.n_name
    """,
)
def shock_sim_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README.md:4's parameterized shock simulation, oracle-checked: a
    -25% shock applied to 1998 revenue, then the same metrics."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    yearly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(F.sum("o_totalprice").alias("rev"))
        .withColumn(
            "rev",
            F.when(F.col("yr") == SHOCK, F.col("rev") * 0.75).otherwise(
                F.col("rev")
            ),
        )
    )
    out = resilience_metrics(
        yearly,
        group_col="n_name",
        year_col="yr",
        value_col="rev",
        base_year=BASE,
        shock_year=SHOCK,
        horizon=HORIZON,
    )
    return out.select(
        "n_name",
        F.round("Drawdown_2020", 4).alias("drawdown"),
        F.col("Recovered_Years").cast("int").alias("recovered_years"),
    )


@query(
    "forecast_nation_revenue",
    oracle="""
    WITH yearly AS (
      SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS yr,
             SUM(o_totalprice) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    ), fit AS (
      SELECT n_name,
             regr_slope(rev, yr)     AS slope,
             regr_intercept(rev, yr) AS icept,
             MAX(yr)                 AS last_yr
      FROM yearly GROUP BY n_name
    )
    SELECT n_name, CAST(f.yr AS INTEGER) AS yr,
           ROUND(icept + slope * f.yr, 4) AS forecast_value
    FROM fit, LATERAL (SELECT UNNEST(generate_series(last_yr + 1, 2004)) AS yr) f
    """,
)
def forecast_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README.md:4's trend forecast, oracle-checked: per-nation OLS of
    yearly revenue projected through 2004 via built-in REGR_*
    aggregates (JVM-side, one shuffle)."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    yearly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    from cdc_2025_spark.reference.resilience import trend_forecast

    out = trend_forecast(
        yearly, through_year=2004, group_col="n_name", year_col="yr",
        value_col="rev",
    )
    return out.select(
        "n_name",
        F.col("yr").cast("int").alias("yr"),
        F.round("forecast_value", 4).alias("forecast_value"),
    )
