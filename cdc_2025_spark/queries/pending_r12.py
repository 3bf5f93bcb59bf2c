"""Round-12 registration queue: the TEMPORAL ANOMALY & STRUCTURE
family — the monitoring layer that sits one level above round 11's
drift statistics: smoothed-deviation anomaly flags (EWMA), robust
seasonal decomposition outliers (the STL idea in its windowed
integer-deterministic form), recursive changepoint segmentation
(binary segmentation over the CUSUM family's single-split form),
community structure of the trade graph (weighted label propagation),
the Johnson-Lindenstrauss projection-distortion audit the embedding
family's compression rung calls for, the Wald-Wolfowitz runs
test for residual randomness, the seasonal-naive forecast backtest
(the floor every forecaster must beat), and a deterministic POISSON
bootstrap CI for the mean (the distributed bootstrap — per-row
md5-derived Poisson(1) weights, no resample shuffle). Eight
queries, every one with a full DuckDB oracle.

NOT imported by queries/__init__.py on purpose (the pending_r10/r11
posture): the freshness guard requires never-checked queries to LEAD
a verification window, and the round-11 window is already composed.
Registering is one call — add ``pending_r12`` to the import list,
call :func:`register_all`, and front-load :data:`PENDING_ORDER` in
the round-12 ``_VERIFY_FIRST``.

Until then tests/test_pending_r12.py runs each query against its
oracle with the same normalization the driver applies, at
sf0.001 + sf0.01.

Pre-registration sf0.1 wall times (min-of-2, idle local[32], for the
round-12 bench.py HEADLINE additions): EWMA 0.47 s, STL outliers
1.09 s, binseg 0.81 s, label propagation 1.93 s (4 unrolled rounds
over the 25-node trade graph — the star join dominates, the rounds
are broadcast joins), JL audit 0.62 s, runs test 0.35 s, seasonal-naive backtest 0.68 s, Poisson bootstrap (B=100) 0.40 s.

Engine-parity rules inherited from the registry docstring: integer
frames exact; disc percentiles over 4dp-rounded values for medians;
float aggregates rounded 4-6dp AFTER the final aggregate; boolean
flags compared on 4dp-rounded operands so summation-order noise
cannot flip them; md5-hash determinism via the shared
``conv(substr(md5(..),1,8),16,10)`` <-> ``('0x'||substr(md5(..),1,8))``
pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_2025_spark.io import read_table

# ---------------------------------------------------------------------------
# EWMA anomaly flags over per-type daily means
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.3
EWMA_K = 2.5


def events_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type EWMA anomaly audit over the daily mean value
    series: ewma_t = alpha*x_t + (1-alpha)*ewma_{t-1} (ewma_1 = x_1,
    the standard recursive init), a day is anomalous when its value
    deviates from YESTERDAY's smoothed level by more than K sample
    standard deviations of the full series (the EWMA control chart's
    one-sided-lag form — the forecast never sees the point it
    judges).

    The recurrence is evaluated in CLOSED FORM so both engines
    compute it as one ordered cumulative window, no iteration:
    with beta = 1-alpha and day index i (1-based),
    ewma_t = alpha * beta^t * sum_{i=2..t}(x_i * beta^-i)
             + beta^(t-1) * x_1.
    beta^-i stays < 5e4 over a 31-day month — no overflow regime.

    Scale shape: the corpus collapses to (event_type, day) daily
    means in one grouped aggregate (map-side partials); everything
    after runs on the ~31-row-per-type calendar frame — the bounded
    whole-frame window the r11 drift family documents."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("value").isNotNull())
        .groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(F.avg("value").alias("x"))
    )
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("event_type")
    beta = 1.0 - EWMA_ALPHA
    d = daily.select(
        "event_type",
        "day",
        "x",
        F.row_number().over(w_ord).alias("i"),
        F.first("x").over(w_ord).alias("x1"),
        F.stddev_samp("x").over(w_all).alias("sd"),
    )
    d = d.withColumn(
        "s",
        F.sum(
            F.when(F.col("i") >= 2, F.col("x") * F.pow(F.lit(beta), -F.col("i")))
            .otherwise(F.lit(0.0))
        ).over(
            Window.partitionBy("event_type")
            .orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn(
        "ewma",
        F.lit(EWMA_ALPHA) * F.pow(F.lit(beta), F.col("i")) * F.col("s")
        + F.pow(F.lit(beta), F.col("i") - 1) * F.col("x1"),
    )
    flagged = d.select(
        "event_type",
        "sd",
        F.col("ewma"),
        # deviation vs the PREVIOUS day's smoothed level; day 1 has
        # no forecast and is never flagged
        F.when(
            F.col("i") >= 2,
            (
                F.round(
                    F.abs(F.col("x") - F.lag("ewma").over(w_ord)), 4
                )
                > F.round(F.lit(EWMA_K) * F.col("sd"), 4)
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("is_anom"),
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(F.col("day").desc())
        )
        .alias("rn_desc"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum("is_anom").cast("long").alias("n_anomalies"),
            F.round(
                F.max(F.when(F.col("rn_desc") == 1, F.col("ewma"))), 4
            ).alias("final_ewma"),
            F.round(F.max("sd"), 4).alias("series_sd"),
        )
        .orderBy("event_type")
    )


EWMA_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, AVG(value) AS x
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
idx AS (
  SELECT event_type, day, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i,
         FIRST_VALUE(x) OVER (PARTITION BY event_type ORDER BY day) AS x1,
         STDDEV_SAMP(x) OVER (PARTITION BY event_type) AS sd
  FROM daily
),
ew AS (
  SELECT event_type, day, x, i, x1, sd,
         {EWMA_ALPHA} * POW({1.0 - EWMA_ALPHA}, i)
           * SUM(CASE WHEN i >= 2
                      THEN x * POW({1.0 - EWMA_ALPHA}, -i)
                      ELSE 0 END)
             OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         + POW({1.0 - EWMA_ALPHA}, i - 1) * x1 AS ewma
  FROM idx
),
fl AS (
  SELECT event_type, sd, ewma,
         CASE WHEN i >= 2 AND
                   ROUND(ABS(x - LAG(ewma) OVER
                     (PARTITION BY event_type ORDER BY day)), 4)
                   > ROUND({EWMA_K} * sd, 4)
              THEN 1 ELSE 0 END AS is_anom,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY day DESC) AS rn_desc
  FROM ew
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(is_anom) AS BIGINT) AS n_anomalies,
       ROUND(MAX(CASE WHEN rn_desc = 1 THEN ewma END), 4) AS final_ewma,
       ROUND(MAX(sd), 4) AS series_sd
FROM fl
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# STL-lite: seasonal (day-of-week) + trend (centered MA) + MAD outliers
# ---------------------------------------------------------------------------

STL_MAD_K = 3.0
STL_MAD_CONSISTENCY = 1.4826  # normal-consistency constant


def events_stl_residual_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Robust seasonal-trend decomposition audit per event type (the
    STL idea restated in windowed deterministic form): seasonal
    component = day-of-week disc-median of the 4dp-rounded daily
    means (disc medians are the verified engine-parity construction);
    trend = centered 7-day moving average of the deseasonalized
    series (partial windows at the edges average what exists — same
    rule both engines); residual outliers by the MAD rule
    (|r - med(r)| > K * 1.4826 * MAD, disc medians again); seasonal
    strength = max(0, 1 - var(residual)/var(deseasonalized))
    (Hyndman's FPP definition against the detrended-only series).

    Scale shape: one grouped collapse to the (type, day) calendar
    frame; the seasonal medians are a 7-rows-per-type aggregate
    broadcast back by join; all windows run on the bounded calendar
    frame."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.round(F.avg("value"), 4).alias("x"))
        .withColumn("dow", F.dayofweek("day"))
    )
    seas = daily.groupBy("event_type", "dow").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY x)"
        ).alias("s")
    )
    d = daily.join(F.broadcast(seas), ["event_type", "dow"]).withColumn(
        "deseas", F.col("x") - F.col("s")
    )
    w_ma = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    d = d.withColumn("trend", F.avg("deseas").over(w_ma)).withColumn(
        "resid", F.round(F.col("deseas") - F.col("trend"), 4)
    )
    med = d.groupBy("event_type").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY resid)"
        ).alias("med_r")
    )
    d2 = d.join(F.broadcast(med), "event_type").withColumn(
        "absdev", F.round(F.abs(F.col("resid") - F.col("med_r")), 4)
    )
    mad = d2.groupBy("event_type").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY absdev)"
        ).alias("mad")
    )
    d3 = d2.join(F.broadcast(mad), "event_type").withColumn(
        "is_out",
        (
            (F.col("mad") > 0)
            & (
                F.col("absdev")
                > F.round(
                    F.lit(STL_MAD_K * STL_MAD_CONSISTENCY) * F.col("mad"),
                    4,
                )
            )
        ).cast("long"),
    )
    return (
        d3.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum("is_out").cast("long").alias("n_outliers"),
            F.round(F.max("mad"), 4).alias("resid_mad"),
            F.round(
                F.greatest(
                    F.lit(0.0),
                    F.lit(1.0)
                    - F.var_samp("resid") / F.var_samp("deseas"),
                ),
                4,
            ).alias("seasonal_strength"),
        )
        .orderBy("event_type")
    )


STL_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         ROUND(AVG(value), 4) AS x,
         dayofweek(CAST(ts AS DATE)) + 1 AS dow
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
seas AS (
  SELECT event_type, dow, quantile_disc(x, 0.5) AS s
  FROM daily GROUP BY 1, 2
),
d AS (
  SELECT daily.event_type, day, x, daily.dow, x - s AS deseas
  FROM daily JOIN seas
    ON daily.event_type = seas.event_type AND daily.dow = seas.dow
),
t AS (
  SELECT *,
         AVG(deseas) OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS trend
  FROM d
),
r AS (
  SELECT *, ROUND(deseas - trend, 4) AS resid FROM t
),
med AS (
  SELECT event_type, quantile_disc(resid, 0.5) AS med_r
  FROM r GROUP BY 1
),
ad AS (
  SELECT r.*, ROUND(ABS(resid - med_r), 4) AS absdev
  FROM r JOIN med ON r.event_type = med.event_type
),
md AS (
  SELECT event_type, quantile_disc(absdev, 0.5) AS mad
  FROM ad GROUP BY 1
),
fl AS (
  SELECT ad.*, md.mad,
         CASE WHEN md.mad > 0 AND
                   absdev > ROUND({STL_MAD_K * STL_MAD_CONSISTENCY}
                                  * md.mad, 4)
              THEN 1 ELSE 0 END AS is_out
  FROM ad JOIN md ON ad.event_type = md.event_type
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(is_out) AS BIGINT) AS n_outliers,
       ROUND(MAX(mad), 4) AS resid_mad,
       ROUND(GREATEST(0.0,
             1.0 - VAR_SAMP(resid) / VAR_SAMP(deseas)), 4)
         AS seasonal_strength
FROM fl
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Depth-2 binary segmentation over the daily event-count series
# ---------------------------------------------------------------------------


def events_binseg_changepoints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Depth-2 binary segmentation (Scott & Knott / the classic
    changepoint recursion) over the GLOBAL daily event-count series:
    the best split minimizes within-segment SSE — equivalently
    maximizes gain(k) = S_k^2/k + (S_n-S_k)^2/(n-k) - S_n^2/n on
    prefix sums — then each side is split again the same way. The
    single-split complement of events_cusum_changepoint (which finds
    ONE global-mean shift); depth 2 yields up to 3 changepoints.

    Integer-exact determinism: the input is a COUNT series, prefix
    sums are exact BIGINTs, and the gain arithmetic applies identical
    float expressions to identical exact integers in both engines —
    ties break by the earlier day. Splits with a degenerate side
    (fewer than 2 days) are excluded by construction (k in [1, n-1]
    within each segment).

    Scale shape: one grouped count to the calendar frame; both
    recursion levels are windows over that bounded frame (the r11
    CUSUM posture), never the corpus."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )

    def gains(df: DataFrame, part_cols: list[str]) -> DataFrame:
        part = (
            Window.partitionBy(*part_cols)
            if part_cols
            else Window.partitionBy()
        )
        w_ord = part.orderBy("day")
        w_cum = w_ord.rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        w_all = part.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        return (
            df.withColumn("k", F.row_number().over(w_ord))
            .withColumn("sk", F.sum("c").over(w_cum))
            .withColumn("n", F.count("*").over(w_all))
            .withColumn("sn", F.sum("c").over(w_all))
            .withColumn(
                "gain",
                F.when(
                    F.col("k") < F.col("n"),
                    F.col("sk") * F.col("sk") / F.col("k")
                    + (F.col("sn") - F.col("sk"))
                    * (F.col("sn") - F.col("sk"))
                    / (F.col("n") - F.col("k"))
                    - F.col("sn") * F.col("sn") / F.col("n"),
                ),
            )
        )

    g1 = gains(daily, [])
    w_pick = Window.orderBy(
        F.round(F.col("gain"), 6).desc(), F.col("day")
    )
    b1 = (
        g1.filter(F.col("gain").isNotNull())
        .withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            F.col("day").alias("split_day"),
            F.round("gain", 4).alias("gain"),
            F.round(F.col("sk") / F.col("k"), 4).alias("mean_left"),
            F.round(
                (F.col("sn") - F.col("sk")) / (F.col("n") - F.col("k")),
                4,
            ).alias("mean_right"),
        )
        .withColumn("level", F.lit(1).cast("long"))
        .withColumn("segment", F.lit("all"))
    )
    sides = daily.join(
        F.broadcast(b1.select("split_day")), how="cross"
    ).withColumn(
        "segment",
        F.when(F.col("day") <= F.col("split_day"), F.lit("left"))
        .otherwise(F.lit("right")),
    ).drop("split_day")
    g2 = gains(sides, ["segment"])
    w_pick2 = Window.partitionBy("segment").orderBy(
        F.round(F.col("gain"), 6).desc(), F.col("day")
    )
    b2 = (
        g2.filter(F.col("gain").isNotNull())
        .withColumn("rn", F.row_number().over(w_pick2))
        .filter(F.col("rn") == 1)
        .select(
            "segment",
            F.col("day").alias("split_day"),
            F.round("gain", 4).alias("gain"),
            F.round(F.col("sk") / F.col("k"), 4).alias("mean_left"),
            F.round(
                (F.col("sn") - F.col("sk")) / (F.col("n") - F.col("k")),
                4,
            ).alias("mean_right"),
        )
        .withColumn("level", F.lit(2).cast("long"))
    )
    return b1.select(
        "level", "segment", "split_day", "gain", "mean_left", "mean_right"
    ).unionByName(
        b2.select(
            "level",
            "segment",
            "split_day",
            "gain",
            "mean_left",
            "mean_right",
        )
    ).orderBy("level", "segment")


BINSEG_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
g1 AS (
  SELECT day,
         ROW_NUMBER() OVER (ORDER BY day) AS k,
         SUM(c) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sk,
         COUNT(*) OVER () AS n,
         SUM(c) OVER () AS sn
  FROM daily
),
g1g AS (
  SELECT *,
         CASE WHEN k < n THEN
           sk * sk * 1.0 / k
           + (sn - sk) * (sn - sk) * 1.0 / (n - k)
           - sn * sn * 1.0 / n END AS gain
  FROM g1
),
b1 AS (
  SELECT day AS split_day, ROUND(gain, 4) AS gain,
         ROUND(sk * 1.0 / k, 4) AS mean_left,
         ROUND((sn - sk) * 1.0 / (n - k), 4) AS mean_right,
         CAST(1 AS BIGINT) AS level, 'all' AS segment
  FROM g1g WHERE gain IS NOT NULL
  ORDER BY ROUND(gain, 6) DESC, day LIMIT 1
),
sides AS (
  SELECT d.day, d.c,
         CASE WHEN d.day <= b1.split_day THEN 'left'
              ELSE 'right' END AS segment
  FROM daily d CROSS JOIN b1
),
g2 AS (
  SELECT segment, day,
         ROW_NUMBER() OVER (PARTITION BY segment ORDER BY day) AS k,
         SUM(c) OVER (PARTITION BY segment ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sk,
         COUNT(*) OVER (PARTITION BY segment) AS n,
         SUM(c) OVER (PARTITION BY segment) AS sn
  FROM sides
),
g2g AS (
  SELECT *,
         CASE WHEN k < n THEN
           sk * sk * 1.0 / k
           + (sn - sk) * (sn - sk) * 1.0 / (n - k)
           - sn * sn * 1.0 / n END AS gain
  FROM g2
),
b2 AS (
  SELECT CAST(2 AS BIGINT) AS level, segment, day AS split_day,
         ROUND(gain, 4) AS gain,
         ROUND(sk * 1.0 / k, 4) AS mean_left,
         ROUND((sn - sk) * 1.0 / (n - k), 4) AS mean_right
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY segment
               ORDER BY ROUND(gain, 6) DESC, day) AS rn
    FROM g2g WHERE gain IS NOT NULL
  ) WHERE rn = 1
)
SELECT level, segment, split_day, gain, mean_left, mean_right FROM b1
UNION ALL
SELECT level, segment, split_day, gain, mean_left, mean_right FROM b2
"""


# ---------------------------------------------------------------------------
# Weighted label propagation communities over the trade graph
# ---------------------------------------------------------------------------

LP_ITERS = 4


def graph_label_propagation_communities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Community detection on the UNDIRECTED trade network via
    synchronous weighted label propagation (Raghavan et al. 2007 in
    its deterministic synchronous form): labels start as the node's
    own name; each of the LP_ITERS rounds every node adopts the label
    with the greatest incident edge weight among its neighbors
    (ties -> lexicographically smallest label). Deterministic end to
    end — weights are exact integer counts and the argmax tie-break
    is total.

    Oracle: the iteration count is a constant of the query, so the
    oracle unrolls the rounds into chained CTEs applying the exact
    update rule (the graph_pagerank posture).

    Scale shape: edges build once (the trade_edges star join),
    symmetrize into an adjacency frame; each round is ONE join of
    the V-sized label table against the edge frame + one
    destination-keyed weighted argmax — label tables broadcast at
    this V, swap to key-shuffled joins at web scale (semantics
    unchanged)."""
    from cdc_2025_spark.queries.graph import trade_edges

    e = trade_edges(spark, sf_dir)
    und = (
        e.select("src", "dst", "w")
        .unionByName(
            e.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                "w",
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .filter(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=False)
    )
    labels = und.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(LP_ITERS):
        votes = (
            und.join(
                F.broadcast(
                    labels.select(
                        F.col("node").alias("dst"),
                        F.col("label").alias("nl"),
                    )
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"), F.col("nl"))
            .agg(F.sum("w").alias("vw"))
        )
        w_pick = Window.partitionBy("node").orderBy(
            F.col("vw").desc(), F.col("nl")
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w_pick))
            .filter(F.col("rn") == 1)
            .select("node", F.col("nl").alias("label"))
        )
    sizes = labels.groupBy("label").agg(
        F.count("*").cast("long").alias("community_size")
    )
    return (
        labels.join(F.broadcast(sizes), "label")
        .select(
            F.col("node").alias("n_name"),
            F.col("label").alias("community"),
            "community_size",
        )
        .orderBy("n_name")
    )


def _lp_oracle() -> str:
    it = """
edges0 AS MATERIALIZED (
  SELECT cn.src, sn.dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN (SELECT c_custkey, n_name AS src
        FROM customer JOIN nation ON c_nationkey = n_nationkey) cn
    ON o.o_custkey = cn.c_custkey
  JOIN (SELECT s_suppkey, n_name AS dst
        FROM supplier JOIN nation ON s_nationkey = n_nationkey) sn
    ON l.l_suppkey = sn.s_suppkey
  GROUP BY 1, 2
),
und AS MATERIALIZED (
  SELECT src, dst, SUM(w) AS w FROM (
    SELECT src, dst, w FROM edges0
    UNION ALL
    SELECT dst AS src, src AS dst, w FROM edges0
  ) WHERE src <> dst GROUP BY 1, 2
),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM und)"""
    for k in range(1, LP_ITERS + 1):
        it += f""",
l{k} AS MATERIALIZED (
  SELECT node, nl AS label FROM (
    SELECT u.src AS node, p.label AS nl, SUM(u.w) AS vw,
           ROW_NUMBER() OVER (PARTITION BY u.src
                              ORDER BY SUM(u.w) DESC, p.label) AS rn
    FROM und u JOIN l{k - 1} p ON u.dst = p.node
    GROUP BY u.src, p.label
  ) WHERE rn = 1
)"""
    return f"""
WITH {it},
sizes AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS community_size
  FROM l{LP_ITERS} GROUP BY label
)
SELECT l.node AS n_name, l.label AS community, s.community_size
FROM l{LP_ITERS} l JOIN sizes s ON l.label = s.label
"""


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss projection distortion audit
# ---------------------------------------------------------------------------

JL_D_OUT = 16
JL_SAMPLE_IDS = 40  # vec_id < 40: fixed bounded sample, both SFs


def embed_jl_distortion_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Johnson-Lindenstrauss distortion audit of a dense sign random
    projection (Achlioptas 2003: entries +-1/sqrt(d_out), here
    derived from md5 of the (dim, out-dim) pair so both engines build
    the IDENTICAL matrix): project the fixed 40-vector sample to
    JL_D_OUT dims and report the distribution of pairwise
    squared-distance ratios ||Px - Py||^2 / ||x - y||^2 — the check
    run before committing to a projection as a cheap pre-filter
    (ratios concentrated near 1 = the pre-filter preserves
    neighborhoods).

    Scale shape: the audit SAMPLE is fixed-size by contract (the
    N_QUERY_VECS posture) — 780 pairs regardless of corpus; the
    projection itself is the scalable op (one explode + grouped sum,
    linear in rows x d_out) and is what this audit green-lights."""
    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < JL_SAMPLE_IDS
    )
    x = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "j", "xj"
        ),
    )
    # sign(j, k) = +-1 from md5 — identical construction both engines
    proj = x.join(
        F.broadcast(
            spark.range(JL_D_OUT).select(F.col("id").cast("int").alias("k"))
        ),
        how="cross",
    ).select(
        "vec_id",
        "k",
        (
            F.col("xj")
            * F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("jl:"),
                                F.col("j").cast("string"),
                                F.lit(":"),
                                F.col("k").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
                == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
        ).alias("term"),
    )
    y = proj.groupBy("vec_id", "k").agg(
        (F.sum("term") / F.lit(float(JL_D_OUT) ** 0.5)).alias("yk")
    )
    # pairwise squared distances, original and projected
    xa = x.select(F.col("vec_id").alias("a"), "j", F.col("xj").alias("xa"))
    xb = x.select(F.col("vec_id").alias("b"), "j", F.col("xj").alias("xb"))
    d_orig = (
        xa.join(xb, "j")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.sum(
                (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
            ).alias("d2")
        )
    )
    ya = y.select(F.col("vec_id").alias("a"), "k", F.col("yk").alias("ya"))
    yb = y.select(F.col("vec_id").alias("b"), "k", F.col("yk").alias("yb"))
    d_proj = (
        ya.join(yb, "k")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.sum(
                (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
            ).alias("p2")
        )
    )
    ratios = (
        d_orig.join(d_proj, ["a", "b"])
        .filter(F.col("d2") > 0)
        .select((F.col("p2") / F.col("d2")).alias("ratio"))
    )
    return ratios.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(F.avg("ratio"), 4).alias("avg_ratio"),
        F.round(F.min("ratio"), 4).alias("min_ratio"),
        F.round(F.max("ratio"), 4).alias("max_ratio"),
        F.round(F.stddev_samp("ratio"), 4).alias("sd_ratio"),
    )


JL_ORACLE = f"""
WITH x AS (
  SELECT vec_id, CAST(dim - 1 AS INTEGER) AS j,
         CAST(embedding[dim] AS DOUBLE) AS xj
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(dim)
  WHERE vec_id < {JL_SAMPLE_IDS}
),
ks AS (SELECT CAST(UNNEST(range({JL_D_OUT})) AS INTEGER) AS k),
proj AS (
  SELECT vec_id, k,
         SUM(xj * CASE WHEN CAST(('0x' || substr(md5(
                  'jl:' || CAST(j AS VARCHAR) || ':'
                        || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT)
                  % 2 = 0 THEN 1.0 ELSE -1.0 END)
           / SQRT({JL_D_OUT}) AS yk
  FROM x CROSS JOIN ks
  GROUP BY vec_id, k
),
d_orig AS (
  SELECT xa.vec_id AS a, xb.vec_id AS b,
         SUM((xa.xj - xb.xj) * (xa.xj - xb.xj)) AS d2
  FROM x xa JOIN x xb ON xa.j = xb.j AND xa.vec_id < xb.vec_id
  GROUP BY 1, 2
),
d_proj AS (
  SELECT ya.vec_id AS a, yb.vec_id AS b,
         SUM((ya.yk - yb.yk) * (ya.yk - yb.yk)) AS p2
  FROM proj ya JOIN proj yb
    ON ya.k = yb.k AND ya.vec_id < yb.vec_id
  GROUP BY 1, 2
),
ratios AS (
  SELECT p2 / d2 AS ratio
  FROM d_orig JOIN d_proj USING (a, b)
  WHERE d2 > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(ratio), 4) AS avg_ratio,
       ROUND(MIN(ratio), 4) AS min_ratio,
       ROUND(MAX(ratio), 4) AS max_ratio,
       ROUND(STDDEV_SAMP(ratio), 4) AS sd_ratio
FROM ratios
"""


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on daily revenue changes
# ---------------------------------------------------------------------------


def stats_runs_test_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily order
    revenue's direction-of-change sequence: day-over-day deltas
    collapse to +/- signs (exact zeros drop, the standard treatment),
    R = number of sign runs, compared against the null expectation
    E[R] = 1 + 2 n1 n2 / n with variance
    2 n1 n2 (2 n1 n2 - n) / (n^2 (n-1)) — the residual-randomness
    check run after a forecast or decomposition claims to have
    captured the structure.

    Integer-exact core: signs, run starts, R, n1, n2 are all integer
    frames; only the final z-score is float (rounded 4dp).

    Scale shape: one grouped sum to the calendar frame; signs and
    run boundaries are one ordered window over that bounded frame;
    the test statistic is a single aggregate."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(F.round(F.sum("o_totalprice"), 4).alias("rev"))
    w_ord = Window.orderBy("day")
    signs = (
        daily.withColumn("prev", F.lag("rev").over(w_ord))
        .filter(F.col("prev").isNotNull())
        .withColumn(
            "sgn",
            F.when(F.col("rev") > F.col("prev"), F.lit(1))
            .when(F.col("rev") < F.col("prev"), F.lit(-1)),
        )
        .filter(F.col("sgn").isNotNull())
    )
    runs = signs.withColumn(
        "new_run",
        (
            F.coalesce(
                F.lag("sgn").over(Window.orderBy("day")) != F.col("sgn"),
                F.lit(True),
            )
        ).cast("long"),
    )
    agg = runs.agg(
        F.sum("new_run").cast("long").alias("n_runs"),
        F.sum((F.col("sgn") == 1).cast("long")).alias("n_up"),
        F.sum((F.col("sgn") == -1).cast("long")).alias("n_down"),
    )
    n1, n2 = F.col("n_up"), F.col("n_down")
    n = n1 + n2
    e_r = F.lit(1.0) + 2.0 * n1 * n2 / n
    var_r = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1))
    )
    return agg.select(
        "n_runs",
        "n_up",
        "n_down",
        F.round(e_r, 4).alias("expected_runs"),
        F.round(
            (F.col("n_runs") - e_r) / F.sqrt(var_r), 4
        ).alias("z_score"),
    )


RUNS_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         ROUND(SUM(o_totalprice), 4) AS rev
  FROM orders GROUP BY 1
),
signs AS (
  SELECT day,
         CASE WHEN rev > prev THEN 1
              WHEN rev < prev THEN -1 END AS sgn
  FROM (SELECT day, rev,
               LAG(rev) OVER (ORDER BY day) AS prev FROM daily)
  WHERE prev IS NOT NULL
    AND rev <> prev
),
runs AS (
  SELECT sgn,
         CASE WHEN LAG(sgn) OVER (ORDER BY day) IS DISTINCT FROM sgn
              THEN 1 ELSE 0 END AS new_run
  FROM signs
),
agg AS (
  SELECT CAST(SUM(new_run) AS BIGINT) AS n_runs,
         CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_up,
         CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_down
  FROM runs
)
SELECT n_runs, n_up, n_down,
       ROUND(1.0 + 2.0 * n_up * n_down / (n_up + n_down), 4)
         AS expected_runs,
       ROUND((n_runs - (1.0 + 2.0 * n_up * n_down / (n_up + n_down)))
             / SQRT(2.0 * n_up * n_down
                    * (2.0 * n_up * n_down - (n_up + n_down))
                    / ((n_up + n_down) * (n_up + n_down)
                       * (n_up + n_down - 1))), 4) AS z_score
FROM agg
"""


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest (the forecasting family's floor)
# ---------------------------------------------------------------------------


def forecast_seasonal_naive_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (f_d = x_{d-7}, the
    floor every forecasting pipeline must beat before shipping
    anything fancier) over the per-type daily mean series: MAE,
    sMAPE, and signed bias per event type, evaluated on every day
    with a calendar ancestor exactly 7 days back (a DATE-keyed
    self-join, never lag(7) rows — row offsets silently shift on
    calendar gaps).

    Scale shape: one grouped collapse to the (type, day) frame; the
    ancestor join and the error aggregates run on that bounded
    calendar frame."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.round(F.avg("value"), 4).alias("x"))
    )
    anc = daily.select(
        "event_type",
        F.date_add("day", 7).alias("day"),
        F.col("x").alias("f"),
    )
    j = daily.join(anc, ["event_type", "day"])
    ae = F.abs(F.col("x") - F.col("f"))
    denom = F.abs(F.col("x")) + F.abs(F.col("f"))
    return (
        j.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_eval"),
            F.round(F.avg(ae), 4).alias("mae"),
            # standard sMAPE; |x|+|f| = 0 days contribute 0 error by
            # convention (both engines via the same NULLIF->0 rule)
            F.round(
                F.avg(
                    F.coalesce(
                        F.lit(2.0) * ae / F.nullif(denom, F.lit(0.0)),
                        F.lit(0.0),
                    )
                ),
                4,
            ).alias("smape"),
            F.round(F.avg(F.col("x") - F.col("f")), 4).alias("bias"),
        )
        .orderBy("event_type")
    )


SEASONAL_NAIVE_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         ROUND(AVG(value), 4) AS x
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
j AS (
  SELECT c.event_type, c.x, a.x AS f
  FROM daily c
  JOIN daily a ON a.event_type = c.event_type
             AND c.day = a.day + 7
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       ROUND(AVG(ABS(x - f)), 4) AS mae,
       ROUND(AVG(COALESCE(2.0 * ABS(x - f)
                          / NULLIF(ABS(x) + ABS(f), 0.0), 0.0)), 4)
         AS smape,
       ROUND(AVG(x - f), 4) AS bias
FROM j
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Poisson bootstrap CI for the mean — THE distributed bootstrap
# ---------------------------------------------------------------------------

BOOT_B = 100
# Poisson(1) CDF ladder (literal to 10dp so both engines compare the
# identical constants): w = #{k : u > cdf_k}, capped at 7
_POIS1_CDF = [
    0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
    0.9963401532, 0.9994058152, 0.9999167589, 0.9999897508,
]


def stats_bootstrap_ci_mean(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """95% bootstrap confidence interval for the mean event value via
    the POISSON bootstrap (Chamandy et al., 'Estimating Uncertainty
    for Massive Data Streams', Google 2012; Kleiner et al.'s BLB is
    the subsampled cousin): classical resampling draws n indices WITH
    replacement per resample — a corpus-sized shuffle per replicate —
    but for large n the multinomial factorizes into independent
    Poisson(1) weights per (row, replicate), so every row computes
    its B weights LOCALLY from a deterministic md5 hash and the whole
    bootstrap is one explode + one grouped weighted mean. The CI is
    the 2.5%/97.5% disc percentiles of the B replicate means (4dp-
    rounded first — the engine-parity construction).

    Scale shape: O(n x B) map-side rows, no resample shuffle, one
    aggregate to the B-row replicate frame; at 100 TB the explode
    stays inside the scan stage and B bounds everything downstream."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    b = F.col("b")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot:"),
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        b.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    w = sum((u > F.lit(c)).cast("int") for c in _POIS1_CDF)
    rep = (
        ev.select("event_id", "value")
        .join(
            F.broadcast(
                spark.range(BOOT_B).select(F.col("id").cast("int").alias("b"))
            ),
            how="cross",
        )
        .select(b.alias("b"), F.col("value"), w.alias("w"))
        .groupBy("b")
        .agg(
            F.round(
                F.sum(F.col("w") * F.col("value")) / F.sum("w"), 4
            ).alias("m")
        )
    )
    return rep.agg(
        F.lit(BOOT_B).cast("long").alias("n_replicates"),
        F.round(F.avg("m"), 4).alias("boot_mean"),
        F.expr(
            "round(percentile_disc(0.025) WITHIN GROUP (ORDER BY m), 4)"
        ).alias("ci_lo"),
        F.expr(
            "round(percentile_disc(0.975) WITHIN GROUP (ORDER BY m), 4)"
        ).alias("ci_hi"),
        F.round(F.stddev_samp("m"), 4).alias("boot_se"),
    )


def _bootstrap_oracle() -> str:
    ladder = " + ".join(
        f"CASE WHEN u > {c} THEN 1 ELSE 0 END" for c in _POIS1_CDF
    )
    return f"""
WITH reps AS (
  SELECT b,
         ROUND(SUM(w * value) / SUM(w), 4) AS m
  FROM (
    SELECT b.b, e.value,
           ({ladder}) AS w
    FROM (SELECT event_id, value FROM events
          WHERE value IS NOT NULL) e
    CROSS JOIN (SELECT CAST(UNNEST(range({BOOT_B})) AS INTEGER) AS b) b,
    LATERAL (SELECT CAST(('0x' || substr(md5(
               'boot:' || CAST(e.event_id AS VARCHAR) || ':'
                       || CAST(b.b AS VARCHAR)), 1, 8)) AS BIGINT)
             / 4294967296.0 AS u) h
  )
  GROUP BY b
)
SELECT CAST({BOOT_B} AS BIGINT) AS n_replicates,
       ROUND(AVG(m), 4) AS boot_mean,
       ROUND(quantile_disc(m, 0.025), 4) AS ci_lo,
       ROUND(quantile_disc(m, 0.975), 4) AS ci_hi,
       ROUND(STDDEV_SAMP(m), 4) AS boot_se
FROM reps
"""


# ---------------------------------------------------------------------------
# Registration hook for round 12
# ---------------------------------------------------------------------------

PENDING_ORDER = [
    "events_ewma_anomaly",
    "events_stl_residual_outliers",
    "events_binseg_changepoints",
    "graph_label_propagation_communities",
    "embed_jl_distortion_audit",
    "stats_runs_test_daily_revenue",
    "forecast_seasonal_naive_backtest",
    "stats_bootstrap_ci_mean",
]

_PENDING = {
    "events_ewma_anomaly": (events_ewma_anomaly, EWMA_ORACLE),
    "events_stl_residual_outliers": (
        events_stl_residual_outliers,
        STL_ORACLE,
    ),
    "events_binseg_changepoints": (
        events_binseg_changepoints,
        BINSEG_ORACLE,
    ),
    "graph_label_propagation_communities": (
        graph_label_propagation_communities,
        _lp_oracle(),
    ),
    "embed_jl_distortion_audit": (embed_jl_distortion_audit, JL_ORACLE),
    "stats_runs_test_daily_revenue": (
        stats_runs_test_daily_revenue,
        RUNS_ORACLE,
    ),
    "forecast_seasonal_naive_backtest": (
        forecast_seasonal_naive_backtest,
        SEASONAL_NAIVE_ORACLE,
    ),
    "stats_bootstrap_ci_mean": (
        stats_bootstrap_ci_mean,
        _bootstrap_oracle(),
    ),
}


def register_all() -> None:
    """Register every pending query (round-12 hook). One-shot: the
    registry's duplicate check fires on a second call."""
    from cdc_2025_spark.queries.registry import query

    for name in PENDING_ORDER:
        fn, oracle = _PENDING[name]
        query(name, oracle=oracle)(fn)
