"""Sketch-accuracy pins: approximate operators (HLL distinct,
approx_percentile) must track their exact twins within the sketch's
error envelope — the correctness contract for the re-aggregatable
100 TB paths.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_2025_spark.io import read_table
from cdc_2025_spark.queries import QUERIES


def test_hll_weekly_estimates_near_exact(spark, sf_dir):
    got = {
        r["wk"]: r["approx_users"]
        for r in QUERIES["sketch_hll_weekly_users"](spark, sf_dir).collect()
    }
    ev = read_table(spark, sf_dir, "events")
    exact = {
        r["wk"]: r["n"]
        for r in ev.groupBy(
            F.weekofyear(F.col("ts").cast("date")).alias("wk")
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for wk, est in got.items():
        # default lgConfigK=12 -> relative error ~1.6%; allow 5%
        assert abs(est - exact[wk]) <= max(2, 0.05 * exact[wk]), (
            wk,
            est,
            exact[wk],
        )


def test_approx_percentile_within_envelope(spark, sf_dir):
    rows = {
        r["o_orderpriority"]: (r["approx_p50"], r["approx_p90"])
        for r in QUERIES["stats_approx_percentiles"](spark, sf_dir).collect()
    }
    orders = read_table(spark, sf_dir, "orders")
    exact = {
        r["o_orderpriority"]: (r["p50"], r["p90"])
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
        )
        .collect()
    }
    for prio, (a50, a90) in rows.items():
        e50, e90 = exact[prio]
        # accuracy=10000 -> rank error <= n/10000; values are smooth
        # enough that 2% relative value error is a generous envelope
        assert abs(a50 - e50) <= 0.02 * e50, prio
        assert abs(a90 - e90) <= 0.02 * e90, prio
