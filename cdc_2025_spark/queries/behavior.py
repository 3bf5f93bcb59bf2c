"""Behavioral/event analytics: funnel conversion, cohort retention,
and inter-event timing — the event-stream query family a training-data
or product pipeline runs over the events table.

All are single-pass window/aggregate shapes: one shuffle on user_id,
then per-user ordered logic inside the partition — the layout that
scales linearly with event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_2025_spark.io import read_table
from cdc_2025_spark.queries.registry import query


@query(
    "funnel_signup_purchase",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(first_signup) AS BIGINT) AS n_signed_up,
           CAST(SUM(CASE WHEN first_purchase > first_signup
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           ROUND(SUM(CASE WHEN first_purchase > first_signup
                          THEN 1 ELSE 0 END) * 1.0
                 / NULLIF(COUNT(first_signup), 0), 4) AS conversion_rate
    FROM per_user
    """,
)
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel: users whose first purchase follows their first
    signup. One conditional-min aggregate per user (map-side partial),
    one global roll-up — no window sort, no self-join."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    converted = F.when(
        F.col("first_purchase") > F.col("first_signup"), 1
    ).otherwise(0)
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("first_signup").alias("n_signed_up"),
        F.sum(converted).alias("n_converted"),
        F.round(
            F.sum(converted)
            / F.nullif(F.count("first_signup"), F.lit(0)),
            4,
        ).alias("conversion_rate"),
    )


@query(
    "cohort_daily_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_day, CAST(day_offset AS INTEGER) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    """,
)
def cohort_daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted as
    active on each subsequent day offset (first week). The firsts
    aggregate and the activity join share the user_id shuffle key, so
    the join is co-partitioned (no extra exchange of the big side)."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .filter(F.col("day_offset") <= 7)
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count("*").alias("n_active")
    )


@query(
    "interevent_timing_stats",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_type,
             EPOCH(ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               AS gap_s
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
           ROUND(AVG(gap_s), 4) AS mean_gap_s,
           ROUND(quantile_cont(gap_s, 0.5), 4) AS median_gap_s
    FROM gaps
    GROUP BY event_type
    """,
)
def interevent_timing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution per event type: lag over the
    per-user timeline (unique tiebreak on event_id for determinism),
    then mean/median per type."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # cast through timestamp_ltz: parquet timestamps written without
    # UTC adjustment read back as TIMESTAMP_NTZ (Spark 4 inference),
    # which cannot cast straight to double; ltz->double is epoch
    # seconds and the NTZ->LTZ shift cancels in the difference
    epoch = F.col("ts").cast("timestamp_ltz").cast("double")
    lag_epoch = F.lag("ts").over(w).cast("timestamp_ltz").cast("double")
    gaps = ev.withColumn("gap_s", epoch - lag_epoch)
    return gaps.groupBy("event_type").agg(
        F.count("gap_s").alias("n_gaps"),
        F.round(F.avg("gap_s"), 4).alias("mean_gap_s"),
        F.round(F.percentile("gap_s", F.lit(0.5)), 4).alias("median_gap_s"),
    )


# Frequent-itemset mining (Agrawal & Srikant VLDB'94 Apriori) over
# (user, day) baskets of event types, plus association rules derived
# from the same levels. Support and confidence thresholds are exact
# rationals compared in INTEGER arithmetic (cnt * DEN >= NUM * base)
# so the frequent/confident boundaries can never diverge between
# engines on a float. Depth is fixed at 3 (pairs feed the triple
# candidates) — the classic market-basket report shape; deeper
# levels iterate the same join + prune step.
MINSUP_NUM = 1
MINSUP_DEN = 20
MINCONF_NUM = 7
MINCONF_DEN = 20
_FREQ = f"cnt * {MINSUP_DEN} >= {MINSUP_NUM} * n_baskets"
_NB = "(SELECT n_baskets FROM nb)"

# Shared CTE stack for the itemset + rule oracles — the DuckDB mirror
# of _frequent_levels below.
_APRIORI_CTES = f"""
    WITH it AS MATERIALIZED (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
      FROM events
    ),
    nb AS (SELECT COUNT(*) AS n_baskets
           FROM (SELECT DISTINCT user_id, day FROM it)),
    l1 AS MATERIALIZED (
      SELECT event_type, COUNT(*) AS cnt
      FROM it GROUP BY event_type
      HAVING {_FREQ.replace('n_baskets', _NB)}
    ),
    it1 AS MATERIALIZED (
      SELECT it.* FROM it SEMI JOIN l1 USING (event_type)
    ),
    p AS MATERIALIZED (
      SELECT a.user_id, a.day,
             a.event_type AS t1, b.event_type AS t2
      FROM it1 a JOIN it1 b
        ON a.user_id = b.user_id AND a.day = b.day
       AND a.event_type < b.event_type
    ),
    l2 AS MATERIALIZED (
      SELECT t1, t2, COUNT(*) AS cnt FROM p GROUP BY t1, t2
      HAVING {_FREQ.replace('n_baskets', _NB)}
    ),
    c3 AS (
      SELECT p.user_id, p.day, p.t1, p.t2, c.event_type AS t3
      FROM p
      SEMI JOIN l2 ON p.t1 = l2.t1 AND p.t2 = l2.t2
      JOIN it1 c
        ON p.user_id = c.user_id AND p.day = c.day
       AND c.event_type > p.t2
      SEMI JOIN l2 x ON p.t1 = x.t1 AND c.event_type = x.t2
      SEMI JOIN l2 y ON p.t2 = y.t1 AND c.event_type = y.t2
    ),
    l3 AS MATERIALIZED (
      SELECT t1, t2, t3, COUNT(*) AS cnt FROM c3 GROUP BY t1, t2, t3
      HAVING {_FREQ.replace('n_baskets', _NB)}
    )
"""

from weakref import WeakKeyDictionary as _WeakKeyDictionary  # noqa: E402

_LEVELS_CACHE: _WeakKeyDictionary = _WeakKeyDictionary()


def _frequent_levels(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(l1, l2, l3, nb) frequent-itemset level frames — cached per
    (session, corpus) because TWO registered queries (itemsets,
    association rules) consume the same levels (the _PAIR_CACHE
    posture from queries/dedup.py).

    The basket item frame feeds six subtrees of one action and the
    pair-occurrence frame two — both lazily localCheckpoint'd so the
    corpus-sized distinct shuffle and the basket self-join each
    execute once; the level frames themselves (≤ |vocab|^k rows) stay
    plain aggregates over those checkpoints so plan audits can see
    the broadcast-join shape. Blocks release when the frames are
    GC'd (the cache is weakly keyed on the session)."""
    per_session = _LEVELS_CACHE.setdefault(spark, {})
    key = (sf_dir, MINSUP_NUM, MINSUP_DEN)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    ev = read_table(spark, sf_dir, "events")
    items = (
        ev.select(
            "user_id",
            F.to_date("ts").alias("day"),
            "event_type",
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nb = items.select("user_id", "day").distinct().agg(
        F.count("*").alias("n_baskets")
    )

    # NOTE: the level frames themselves are NOT checkpointed — a
    # localCheckpoint rewrites the logical plan to an ExistingRDD
    # scan immediately, which would hide the broadcast-join shape
    # from plan audits, and each level is a tiny aggregate over the
    # checkpointed items/p frames anyway (re-running it per consumer
    # costs one small stage, not a corpus scan).
    def freq(grouped: DataFrame) -> DataFrame:
        return grouped.crossJoin(F.broadcast(nb)).filter(
            F.col("cnt") * MINSUP_DEN
            >= F.lit(MINSUP_NUM) * F.col("n_baskets")
        )

    l1 = freq(
        items.groupBy("event_type").agg(F.count("*").alias("cnt"))
    )
    it1 = items.join(
        F.broadcast(l1.select("event_type")), "event_type", "semi"
    )
    a = it1.select("user_id", "day", F.col("event_type").alias("t1"))
    b = it1.select("user_id", "day", F.col("event_type").alias("t2"))
    p = (
        a.join(b, ["user_id", "day"])
        .filter(F.col("t1") < F.col("t2"))
        .localCheckpoint(eager=False)
    )
    l2 = freq(p.groupBy("t1", "t2").agg(F.count("*").alias("cnt")))
    l2keys = l2.select("t1", "t2")
    c = it1.select("user_id", "day", F.col("event_type").alias("t3"))
    c3 = (
        p.join(F.broadcast(l2keys), ["t1", "t2"], "semi")
        .join(c, ["user_id", "day"])
        .filter(F.col("t3") > F.col("t2"))
        .join(
            F.broadcast(
                l2keys.select(
                    F.col("t1").alias("x1"), F.col("t2").alias("t3")
                )
            ).withColumnRenamed("x1", "t1"),
            ["t1", "t3"],
            "semi",
        )
        .join(
            F.broadcast(
                l2keys.select(
                    F.col("t1").alias("t2"), F.col("t2").alias("t3")
                )
            ),
            ["t2", "t3"],
            "semi",
        )
    )
    l3 = freq(c3.groupBy("t1", "t2", "t3").agg(F.count("*").alias("cnt")))
    out = (l1, l2, l3, nb)
    per_session[key] = out
    return out


@query(
    "mine_frequent_event_sets",
    oracle=_APRIORI_CTES
    + f"""
    SELECT itemset, CAST(sz AS INTEGER) AS itemset_size,
           CAST(cnt AS BIGINT) AS support_count,
           ROUND(cnt * 1.0 / {_NB}, 4) AS support
    FROM (
      SELECT event_type AS itemset, 1 AS sz, cnt FROM l1
      UNION ALL
      SELECT t1 || ',' || t2, 2, cnt FROM l2
      UNION ALL
      SELECT t1 || ',' || t2 || ',' || t3, 3, cnt FROM l3
    )
    """,
)
def mine_frequent_event_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent event-type itemsets (sizes 1-3) over (user, day)
    baskets — Apriori with level-wise candidate generation and
    subset pruning (Agrawal & Srikant VLDB'94), the market-basket /
    co-occurrence miner a behavioral pipeline runs before building
    association rules.

    Scale shape (see _frequent_levels): baskets never leave their
    partition between levels — L(k) candidates are built by a
    basket-keyed equi-self-join of the L(k-1) occurrence frame (no
    cross product), and every prune table (the frequent sets
    themselves, at most |items|^k rows, items = event-type
    vocabulary) BROADCASTS into semi-joins. The support threshold
    comparison is integer-exact (cnt·DEN >= NUM·n_baskets), and
    n_baskets rides a 1-row broadcast — no driver-side count.
    Distinct-ification of raw events is the only corpus-sized
    shuffle."""
    l1, l2, l3, _ = _frequent_levels(spark, sf_dir)
    out = (
        l1.select(
            F.col("event_type").alias("itemset"),
            F.lit(1).alias("itemset_size"),
            "cnt",
            "n_baskets",
        )
        .unionAll(
            l2.select(
                F.concat_ws(",", "t1", "t2").alias("itemset"),
                F.lit(2).alias("itemset_size"),
                "cnt",
                "n_baskets",
            )
        )
        .unionAll(
            l3.select(
                F.concat_ws(",", "t1", "t2", "t3").alias("itemset"),
                F.lit(3).alias("itemset_size"),
                "cnt",
                "n_baskets",
            )
        )
    )
    return out.select(
        "itemset",
        "itemset_size",
        F.col("cnt").alias("support_count"),
        F.round(F.col("cnt") / F.col("n_baskets"), 4).alias("support"),
    )


@query(
    "mine_association_rules",
    oracle=_APRIORI_CTES
    + f"""
    , r AS (
      SELECT l2.t1 AS antecedent, l2.t2 AS consequent,
             l2.cnt AS c_set, a1.cnt AS c_ante, c1.cnt AS c_cons
      FROM l2 JOIN l1 a1 ON l2.t1 = a1.event_type
              JOIN l1 c1 ON l2.t2 = c1.event_type
      UNION ALL
      SELECT l2.t2, l2.t1, l2.cnt, a1.cnt, c1.cnt
      FROM l2 JOIN l1 a1 ON l2.t2 = a1.event_type
              JOIN l1 c1 ON l2.t1 = c1.event_type
      UNION ALL
      SELECT l3.t1 || ',' || l3.t2, l3.t3, l3.cnt, p2.cnt, c1.cnt
      FROM l3 JOIN l2 p2 ON l3.t1 = p2.t1 AND l3.t2 = p2.t2
              JOIN l1 c1 ON l3.t3 = c1.event_type
      UNION ALL
      SELECT l3.t1 || ',' || l3.t3, l3.t2, l3.cnt, p2.cnt, c1.cnt
      FROM l3 JOIN l2 p2 ON l3.t1 = p2.t1 AND l3.t3 = p2.t2
              JOIN l1 c1 ON l3.t2 = c1.event_type
      UNION ALL
      SELECT l3.t2 || ',' || l3.t3, l3.t1, l3.cnt, p2.cnt, c1.cnt
      FROM l3 JOIN l2 p2 ON l3.t2 = p2.t1 AND l3.t3 = p2.t2
              JOIN l1 c1 ON l3.t1 = c1.event_type
    )
    SELECT antecedent, consequent,
           CAST(c_set AS BIGINT) AS rule_support_count,
           ROUND(c_set * 1.0 / c_ante, 4) AS confidence,
           ROUND(c_set * 1.0 * {_NB} / (c_ante * c_cons), 4) AS lift
    FROM r
    WHERE c_set * {MINCONF_DEN} >= {MINCONF_NUM} * c_ante
    """,
)
def mine_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules X -> y from the frequent itemsets (Agrawal &
    Srikant VLDB'94 §3): every 1->1 split of a frequent pair and
    every 2->1 split of a frequent triple, kept when confidence =
    supp(X∪y)/supp(X) clears MINCONF (integer-exact comparison), with
    lift = conf/supp(y) as the correlation signal (< 1 means y is
    anti-correlated with X — buying-pattern analytics over event
    streams).

    Scale shape: rides the SESSION-CACHED level frames
    (_frequent_levels — the mining cost is paid once across both
    registered consumers); rule construction itself joins only
    frequent-set tables, each ≤ |event-type vocab|^k rows and
    broadcast — no basket-sized frame is touched. Antecedent pair
    counts come from L2 directly (downward closure guarantees every
    sub-pair of a frequent triple is frequent, so the join never
    drops a rule)."""
    l1, l2, l3, nb = _frequent_levels(spark, sf_dir)
    item_c = l1.select(
        F.col("event_type").alias("item"), F.col("cnt").alias("c_item")
    )
    pair_c = l2.select("t1", "t2", F.col("cnt").alias("c_pair"))
    tri_c = l3.select("t1", "t2", "t3", F.col("cnt").alias("c_tri"))

    def ic(alias_to: str, out: str) -> DataFrame:
        return F.broadcast(
            item_c.select(
                F.col("item").alias(alias_to), F.col("c_item").alias(out)
            )
        )

    r_pairs = (
        pair_c.join(ic("t1", "c_t1"), "t1")
        .join(ic("t2", "c_t2"), "t2")
    )
    r12 = r_pairs.select(
        F.col("t1").alias("antecedent"),
        F.col("t2").alias("consequent"),
        F.col("c_pair").alias("c_set"),
        F.col("c_t1").alias("c_ante"),
        F.col("c_t2").alias("c_cons"),
    )
    r21 = r_pairs.select(
        F.col("t2").alias("antecedent"),
        F.col("t1").alias("consequent"),
        F.col("c_pair").alias("c_set"),
        F.col("c_t2").alias("c_ante"),
        F.col("c_t1").alias("c_cons"),
    )

    def pc(k1: str, k2: str) -> DataFrame:
        return F.broadcast(
            pair_c.select(
                F.col("t1").alias(k1),
                F.col("t2").alias(k2),
                F.col("c_pair").alias("c_ante"),
            )
        )

    r3a = (
        tri_c.join(pc("t1", "t2"), ["t1", "t2"])
        .join(ic("t3", "c_cons"), "t3")
        .select(
            F.concat_ws(",", "t1", "t2").alias("antecedent"),
            F.col("t3").alias("consequent"),
            F.col("c_tri").alias("c_set"),
            "c_ante",
            "c_cons",
        )
    )
    r3b = (
        tri_c.join(pc("t1", "t3"), ["t1", "t3"])
        .join(ic("t2", "c_cons"), "t2")
        .select(
            F.concat_ws(",", "t1", "t3").alias("antecedent"),
            F.col("t2").alias("consequent"),
            F.col("c_tri").alias("c_set"),
            "c_ante",
            "c_cons",
        )
    )
    r3c = (
        tri_c.join(pc("t2", "t3"), ["t2", "t3"])
        .join(ic("t1", "c_cons"), "t1")
        .select(
            F.concat_ws(",", "t2", "t3").alias("antecedent"),
            F.col("t1").alias("consequent"),
            F.col("c_tri").alias("c_set"),
            "c_ante",
            "c_cons",
        )
    )
    rules = r12.unionAll(r21).unionAll(r3a).unionAll(r3b).unionAll(r3c)
    return (
        rules.filter(
            F.col("c_set") * MINCONF_DEN
            >= F.lit(MINCONF_NUM) * F.col("c_ante")
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "antecedent",
            "consequent",
            F.col("c_set").alias("rule_support_count"),
            F.round(F.col("c_set") / F.col("c_ante"), 4).alias(
                "confidence"
            ),
            F.round(
                F.col("c_set")
                * F.col("n_baskets")
                / (F.col("c_ante") * F.col("c_cons")),
                4,
            ).alias("lift"),
        )
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ),
    tr AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n_transitions
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_transitions,
           ROUND(n_transitions * 1.0 /
                 SUM(n_transitions) OVER (PARTITION BY from_type),
                 4) AS p_transition
    FROM tr
    """,
)
def events_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type) — the
    behavioral-sequence model behind next-action prediction,
    anomaly scoring (improbable transitions), and session
    simulation. The reference's event surface stops at counts and
    timing; this adds the sequence-structure view.

    Determinism: each user's sequence is ordered by (ts, event_id) —
    the event_id tiebreak pins simultaneous events to one order in
    both engines (same convention as window_sessionize_events).

    Shape, built to scale: ONE shuffle on user_id for the lead
    window (per-user state stays inside its partition — the same
    layout every per-user window query here uses), then a grouped
    aggregate onto |types|² keys — map-side partials collapse each
    partition to at most |types|² rows, so the second exchange moves
    kilobytes at any corpus size. The probability normalization is a
    window over the |types|²-row result, not the event stream. At
    100 TB nothing but the first user_id exchange touches event
    volume; AQE coalesces the tail.
    """
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    wt = Window.partitionBy("from_type")
    return tr.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wt), 4
        ).alias("p_transition"),
    )
