"""Distributed exact ranks without corpus-sized sorts.

The problem: exact (mid)ranks over a nearly-unique column force a
per-partition total sort — `Window.orderBy(v)` moves EVERYTHING into
one task (Spark warns "No Partition Defined"), the single ceiling
the r11 SCALE audit found in the rank family. The fix is a TWO-LEVEL
cumulative count: collapse to the distinct-value frame, range-bucket
the values (fixed width over min/max), run the within-bucket
cumulative in a (group, bucket) window whose partitions hold
~|distinct|/n_buckets values, and add a bucket offset computed from
a window over the bounded bucket-total frame. Bucket assignment is a
floor of a monotone map, so equal values share a bucket and order is
preserved — ranks are EXACT rationals regardless of bucket geometry
(the knob moves wall time, never answers).

Shared by the registered Spearman (per-segment ranks),
Kruskal-Wallis (global ranks), and available to any future rank
consumer. Skew note: buckets are equal-WIDTH; a column whose distinct
values pile into one bucket re-creates a big window partition —
acceptable for price-like columns, swap in approx-quantile edges if
a column needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_RANK_BUCKETS = 1024


def bucketed_midranks(
    marg: DataFrame,
    value_col: str,
    weight_col: str,
    out_col: str,
    group_cols: tuple[str, ...] = (),
    n_buckets: int = DEFAULT_RANK_BUCKETS,
) -> DataFrame:
    """``marg`` holds one row per (group_cols..., value) with
    ``weight_col`` = how many underlying rows carry that value.
    Returns (group_cols..., value_col, out_col) where out_col is the
    exact midrank of the value within its group:
    cum_smaller + (weight + 1)/2 — identical to
    RANK() + (ties - 1)/2 over the underlying rows.

    CALLER CONTRACT: ``marg`` fans out to three subtrees here (range
    agg, bucket assignment, bucket totals), so the caller must pass
    a frame whose recomputation is cheap — in practice, one derived
    from a lazily localCheckpoint-ed corpus collapse (un-pinned, each
    reference re-expands the collapse lineage into its own corpus
    scan: measured 6 parquet scans in the equi-depth plan, NO
    adaptive exchange reuse). The helper does not checkpoint
    internally so a caller-pinned input is not materialized twice."""
    gc = list(group_cols)
    rng_agg = (
        marg.groupBy(*gc).agg(
            F.min(value_col).cast("double").alias("_mn"),
            F.max(value_col).cast("double").alias("_mx"),
        )
        if gc
        else marg.agg(
            F.min(value_col).cast("double").alias("_mn"),
            F.max(value_col).cast("double").alias("_mx"),
        )
    )
    nb = F.lit(n_buckets)
    b = F.when(
        F.col("_mx") > F.col("_mn"),
        F.least(
            F.floor(
                (F.col(value_col) - F.col("_mn"))
                / ((F.col("_mx") - F.col("_mn")) / nb)
            ),
            nb - 1,
        ),
    ).otherwise(F.lit(0))
    joined = (
        marg.join(F.broadcast(rng_agg), gc)
        if gc
        else marg.crossJoin(F.broadcast(rng_agg))
    )
    bucketed = joined.select(
        *gc, value_col, weight_col, b.cast("long").alias("_b")
    )
    w_in = (
        Window.partitionBy(*gc, "_b")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_in = F.coalesce(F.sum(weight_col).over(w_in), F.lit(0))
    w_off = (
        Window.partitionBy(*gc)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bucketed.groupBy(*gc, "_b")
        .agg(F.sum(weight_col).alias("_bw"))
        .select(
            *gc,
            "_b",
            F.coalesce(F.sum("_bw").over(w_off), F.lit(0)).alias(
                "_boff"
            ),
        )
    )
    return (
        bucketed.withColumn("_cum_in", cum_in)
        .join(F.broadcast(offsets), [*gc, "_b"])
        .select(
            *gc,
            value_col,
            (
                F.col("_boff")
                + F.col("_cum_in")
                + (F.col(weight_col) + 1) / 2.0
            ).alias(out_col),
        )
    )
