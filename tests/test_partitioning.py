"""Storage-layout hygiene: date-partitioned writes produce partition
pruning on read, and bucketed layout survives round trips — the
physical design the 100 TB deployment depends on (SURVEY.md §7.7).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_2025_spark.io import read_table
from cdc_2025_spark.plans import plan_string


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="cdc_layout_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_date_partitioned_write_prunes_on_read(spark, sf_dir, tmpdir):
    ev = read_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    path = os.path.join(tmpdir, "events_by_date")
    ev.write.partitionBy("event_date").parquet(path)

    n_days = ev.select("event_date").distinct().count()
    back = spark.read.parquet(path)
    one_day = back.filter(F.col("event_date") == "2024-01-05")

    plan = plan_string(one_day)
    # the date predicate must become a partition filter on the scan,
    # not a post-scan row filter
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_date" in pf_line

    # and it must actually read only that day's rows
    want = ev.filter(F.col("event_date") == "2024-01-05").count()
    assert one_day.count() == want
    assert n_days > 1  # the pruning actually skipped something


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmpdir):
    """Bucketing both join sides on the join key 8-ways lets the join
    run exchange-free — the co-located-join layout for repeated
    fact-fact joins at 100 TB (SURVEY.md §7.7)."""
    warehouse = os.path.join(tmpdir, "warehouse")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    try:
        (
            orders.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .option("path", os.path.join(warehouse, "orders_b"))
            .saveAsTable("orders_b")
        )
        (
            li.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .option("path", os.path.join(warehouse, "lineitem_b"))
            .saveAsTable("lineitem_b")
        )
        # disable broadcast: at test scale the small side would
        # broadcast and hide the bucket layout the test asserts (at
        # 100 TB neither side broadcasts — SMJ is the real plan)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob = spark.table("orders_b")
        lb = spark.table("lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy(
            "o_orderpriority"
        ).count()

        plan = plan_string(joined, mode="simple")
        # SortMergeJoin with NO exchange under either side: the scan's
        # bucket layout satisfies the join distribution directly. The
        # single remaining Exchange is the post-join groupBy.
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange") == 1, (
            f"bucketed join should not shuffle its inputs:\n{plan}"
        )
        # and the result matches the unbucketed join
        want = (
            orders.join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_aqe_coalesces_small_shuffle(spark, sf_dir):
    """With AQE on, a small groupBy must not produce hundreds of tiny
    output partitions — runtime coalescing is part of the session
    contract (session.py)."""
    ev = read_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").count()
    parts = agg.rdd.getNumPartitions()
    assert parts <= 8, f"AQE should coalesce tiny shuffles, got {parts}"


def test_salted_join_spreads_hot_key(spark):
    """The salt must actually spread a pathological key: on a corpus
    where 90% of rows share one key, the unsalted shuffle puts ~90% of
    the data in one partition; the salted join's largest partition
    must be bounded near the uniform share. Max-to-median pinned under
    the salted plan. Broadcast + AQE disabled so the real shuffle
    partitioning is observable (at scale the big side must shuffle —
    that is the case salting exists for)."""
    from cdc_2025_spark.functions.joins import salted_join

    n = 40_000
    big = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = big.select("k").distinct().withColumn("w", F.lit(1.0))

    def partition_sizes(df):
        return [
            r["cnt"]
            for r in df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.count("*").alias("cnt"))
            .collect()
        ]

    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        plain = big.join(dim, ["k"])
        salted = salted_join(big, dim, ["k"], n_salt=32, salt_on="v")
        # identical result sets first
        assert salted.count() == plain.count() == n

        plain_sizes = partition_sizes(plain)
        salted_sizes = sorted(partition_sizes(salted))
        # unsalted: the hot key lands in ONE reducer
        assert max(plain_sizes) >= int(0.9 * n)
        # salted: largest partition bounded near the uniform share
        ideal = n / int(spark.conf.get("spark.sql.shuffle.partitions"))
        assert max(salted_sizes) <= 4 * ideal, (max(salted_sizes), ideal)
        median = salted_sizes[len(salted_sizes) // 2]
        assert max(salted_sizes) <= 6 * median, (max(salted_sizes), median)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_auto_salted_join_derives_and_matches(spark):
    """auto_salted_join: on the 90%-hot-key corpus the advisor
    derives a salt > 1 and the salted result equals the plain join
    exactly; on a uniform key distribution it advises 1 and joins
    plain (no salt column machinery)."""
    from cdc_2025_spark.functions.joins import (
        advise_salt,
        auto_salted_join,
    )

    n = 10_000
    big = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        )
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = big.select("k").distinct().withColumn("w", F.lit(1.0))
    n_salt = advise_salt(big.select("k"), ["k"])
    assert n_salt > 1
    plain = {
        (r["k"], r["v"], r["w"])
        for r in big.join(dim, ["k"]).collect()
    }
    auto = {
        (r["k"], r["v"], r["w"])
        for r in auto_salted_join(big, dim, ["k"], salt_on="v").collect()
    }
    assert auto == plain and len(auto) == n

    uniform = spark.range(n).select(
        (F.col("id") % 97).cast("string").alias("k"),
        F.col("id").alias("v"),
    )
    assert advise_salt(uniform.select("k"), ["k"]) == 1
    udim = uniform.select("k").distinct().withColumn("w", F.lit(1.0))
    out = auto_salted_join(uniform, udim, ["k"])
    assert "_salt" not in out.columns
    assert out.count() == n


def test_advise_salt_ignores_null_keys(spark):
    """A NULL-heavy nullable key must not drive salt advice: inner
    equi-joins prune NULL keys below the exchange, so the profile
    excludes them — uniform non-null keys advise 1 even when half
    the rows are NULL."""
    from cdc_2025_spark.functions.joins import advise_salt

    n = 10_000
    df = spark.range(n).select(
        F.when(
            F.col("id") % 2 == 0,
            (F.col("id") % 97).cast("string"),
        ).alias("k")
    )
    assert advise_salt(df, ["k"]) == 1


def test_auto_salted_left_join_preserves_unmatched(spark):
    """how='left' through the auto path: unmatched big-side rows
    survive with NULL dim columns, matched rows equal the plain left
    join exactly — on the hot-key corpus where salting engages."""
    from cdc_2025_spark.functions.joins import auto_salted_join

    n = 5_000
    big = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        )
        .alias("k"),
        F.col("id").alias("v"),
    )
    # dim covers only the hot key -> every cold row is unmatched
    dim = spark.createDataFrame([("hot", 1.0)], "k string, w double")
    plain = {
        (r["k"], r["v"], r["w"])
        for r in big.join(dim, ["k"], "left").collect()
    }
    auto = {
        (r["k"], r["v"], r["w"])
        for r in auto_salted_join(
            big, dim, ["k"], salt_on="v", how="left"
        ).collect()
    }
    assert auto == plain and len(auto) == n


def test_advise_salt_matches_python_model(spark):
    """advise_salt equals the closed form min(cap, ceil(max_count /
    mean_count)) over non-NULL keys, 1 when skew <= hot_factor —
    checked across fixtures with varying hot-key mass."""
    import math
    from collections import Counter

    from cdc_2025_spark.functions.joins import advise_salt

    for hot_share in (0, 30, 60, 95):
        keys = ["hot"] * hot_share + [
            f"k{i % 9}" for i in range(100 - hot_share)
        ]
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        c = Counter(keys)
        mean = sum(c.values()) / len(c)
        skew = max(c.values()) / mean
        want = 1 if skew <= 2.0 else min(64, math.ceil(skew))
        assert advise_salt(df, ["k"]) == want, hot_share


def test_auto_salted_join_validates_how_up_front(spark):
    """r8 ADVICE: how='full' used to succeed on uniform data and
    raise only when skew was detected — data-dependent API behavior.
    Now rejected up front regardless of the key distribution."""
    import pytest

    from cdc_2025_spark.functions.joins import auto_salted_join

    uniform = spark.createDataFrame(
        [(i % 4, i) for i in range(40)], "k int, v int"
    )
    dim = spark.createDataFrame([(i, i * 10) for i in range(4)], "k int, d int")
    with pytest.raises(ValueError, match="inner.*left"):
        auto_salted_join(uniform, dim, ["k"], how="full")
