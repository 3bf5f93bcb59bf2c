"""Round-11 registration queue: the DRIFT & CORPUS-LAW diagnostics
family — the statistical monitoring a training-data pipeline runs
between ingests (distribution drift, changepoints) and the corpus
sanity laws it checks after curation (Zipf rank-frequency, Heaps
vocabulary growth), plus the eval family's calibration leg, the
embedding-compression audit, and pairwise source JS divergence.
Eight queries, every one with a full DuckDB
oracle (hash-green-able: integer-exact where possible, disc
percentiles over 4dp-rounded values for bin edges — the verified
engine-parity construction — and 4-6dp rounding on float
aggregates only).

NOT imported by queries/__init__.py on purpose (the pending_r10
posture): the freshness guard requires never-checked queries to LEAD
a verification window, and the round-10 window is already composed.
Registering is one call — add ``pending_r11`` to the import list,
call :func:`register_all`, and front-load :data:`PENDING_ORDER` in
the round-11 ``_VERIFY_FIRST``.

Until then tests/test_pending_r11.py runs each query against its
oracle with the same normalization the driver applies, at
sf0.001 + sf0.01.

Pre-registration sf0.1 wall times (min-of-2, idle local[32], for the
round-11 bench.py HEADLINE additions): KS 0.64 s, PSI 0.73 s, CUSUM
0.34 s, Zipf 0.25 s, Heaps 0.31 s, calibration 0.20 s, SQ8 audit
0.32 s, JS divergence 0.71 s, daily ACF 0.66 s, Benford 0.45 s,
Mann-Kendall 0.70 s, HHI 0.34 s.
The single-partition WindowExec warnings these emit are the
documented bounded-frame windows (CUSUM over calendar days, totals
over n_bins rows, the rank kernel's bucket-total offsets) — never
the corpus. The KS ECDF moved onto functions/ranks.py
bucketed_cumsums in r13, so its distinct-value frame no longer
sorts in one task either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_2025_spark.io import read_table

# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov: order-value drift between segments
# ---------------------------------------------------------------------------

KS_SEG_A = "BUILDING"
KS_SEG_B = "MACHINERY"


def stats_ks_drift_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the order-value
    distributions of two customer segments: D = max_x |F_A(x) -
    F_B(x)| evaluated on the pooled distinct-value grid (the exact
    two-sample statistic), plus the asymptotic p-value (first five
    terms of the Kolmogorov series 2*sum (-1)^(k-1) exp(-2 k^2
    lambda^2), the standard large-sample approximation).

    Scale shape (r13 — the LAST rank-family residual closed): ONE
    grouped count collapses both samples to the pooled distinct-value
    frame (per-value counts per side, integer-exact), lazily
    localCheckpoint-ed; BOTH sides' inclusive ECDF cumulatives come
    from one pass of the shared two-level bucketed kernel
    (functions/ranks.py bucketed_cumsums — no window partition
    exceeds ~|distinct|/1024 values, where the previous unpartitioned
    cumulative held EVERY distinct price in one task, the single
    ceiling the r12 scale audit left open); sample totals are one
    cheap aggregate on the checkpointed distinct frame and the max a
    single aggregate — the corpus never sorts, and neither do its
    distinct values."""
    from cdc_2025_spark.functions.ranks import bucketed_cumsums

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    seg = (
        orders.join(
            cust.select("c_custkey", "c_mktsegment"),
            orders.o_custkey == cust.c_custkey,
        )
        .filter(F.col("c_mktsegment").isin(KS_SEG_A, KS_SEG_B))
        .select(
            F.round("o_totalprice", 4).alias("v"),
            (F.col("c_mktsegment") == KS_SEG_A)
            .cast("long")
            .alias("is_a"),
        )
    )
    # ONE corpus collapse, materialized: feeds the cumsum kernel's
    # three subtrees and the totals without re-running the join
    per_v = (
        seg.groupBy("v")
        .agg(
            F.sum("is_a").alias("ca"),
            F.sum(1 - F.col("is_a")).alias("cb"),
        )
        .localCheckpoint(eager=False)
    )
    cums = bucketed_cumsums(per_v, "v", ("ca", "cb"))
    totals = per_v.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    tot = (
        cums.crossJoin(F.broadcast(totals))
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max(
                F.abs(
                    F.col("cum_ca") / F.col("n_a")
                    - F.col("cum_cb") / F.col("n_b")
                )
            ).alias("d"),
        )
    )
    lam = F.sqrt(
        F.col("n_a") * F.col("n_b") / (F.col("n_a") + F.col("n_b"))
    ) * F.col("d")
    p = sum(
        (
            F.lit(2.0 * (1 if k % 2 == 1 else -1))
            * F.exp(F.lit(-2.0 * k * k) * lam * lam)
        )
        for k in range(1, 6)
    )
    return tot.select(
        "n_a",
        "n_b",
        F.round("d", 6).alias("ks_d"),
        F.round(F.greatest(F.least(p, F.lit(1.0)), F.lit(0.0)), 6).alias(
            "p_value"
        ),
    )


KS_ORACLE = f"""
WITH seg AS (
  SELECT ROUND(o_totalprice, 4) AS v,
         CASE WHEN c_mktsegment = '{KS_SEG_A}' THEN 1 ELSE 0 END AS is_a
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('{KS_SEG_A}', '{KS_SEG_B}')
),
per_v AS (
  SELECT v, SUM(is_a) AS ca, SUM(1 - is_a) AS cb FROM seg GROUP BY v
),
ecdf AS (
  SELECT SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
         SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_b
  FROM per_v
),
tot AS (
  SELECT CAST(MAX(cum_a) AS BIGINT) AS n_a,
         CAST(MAX(cum_b) AS BIGINT) AS n_b,
         MAX(ABS(cum_a * 1.0 / (SELECT MAX(cum_a) FROM ecdf)
                 - cum_b * 1.0 / (SELECT MAX(cum_b) FROM ecdf))) AS d
  FROM ecdf
),
lamt AS (
  SELECT n_a, n_b, d,
         SQRT(n_a * n_b * 1.0 / (n_a + n_b)) * d AS lam
  FROM tot
)
SELECT n_a, n_b, ROUND(d, 6) AS ks_d,
       ROUND(GREATEST(LEAST(
         2.0 * exp(-2.0 * lam * lam)
         - 2.0 * exp(-8.0 * lam * lam)
         + 2.0 * exp(-18.0 * lam * lam)
         - 2.0 * exp(-32.0 * lam * lam)
         + 2.0 * exp(-50.0 * lam * lam), 1.0), 0.0), 6) AS p_value
FROM lamt
"""


# ---------------------------------------------------------------------------
# Population Stability Index: intra-month value drift over events
# ---------------------------------------------------------------------------

PSI_N_BINS = 10
PSI_FLOOR = 1e-4  # standard zero-proportion floor


def stats_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the REFERENCE events
    (day-of-month <= 15) and the CURRENT events (day > 15), binned by
    the reference distribution's deciles — the standard model-
    monitoring drift score (PSI < 0.1 stable, > 0.25 shifted), with
    one row per bin (p_ref, p_cur, contribution) so the drifted mass
    is attributable, not just scored.

    Engine parity: bin edges are percentile_disc over 4dp-rounded
    values (disc percentiles of rounded values are verified identical
    across engines — never interpolate); bin assignment counts edges
    strictly below the value (integer-exact); proportions are floored
    at 1e-4 before the log (the standard zero guard, exact in both
    engines).

    Scale shape: the reference deciles are one grouped aggregate; the
    bin assignment broadcasts 9 edges; per-bin counts are map-side
    partials. Nothing bigger than (n_bins) rows shuffles."""
    ev = read_table(spark, sf_dir, "events").select(
        F.round("value", 4).alias("v"),
        (F.dayofmonth("ts") <= 15).alias("is_ref"),
    )
    qs = [i / PSI_N_BINS for i in range(1, PSI_N_BINS)]
    edges = (
        ev.filter("is_ref")
        .agg(
            *[
                F.expr(
                    f"percentile_disc({q}) WITHIN GROUP (ORDER BY v)"
                ).alias(f"e{i}")
                for i, q in enumerate(qs)
            ]
        )
        .first()
    )
    cuts = [edges[i] for i in range(len(qs))]
    bin_expr = sum(
        (F.col("v") > F.lit(c)).cast("int") for c in cuts
    ) + F.lit(1)
    binned = ev.select("is_ref", bin_expr.alias("bin"))
    counts = binned.groupBy("bin").agg(
        F.sum(F.col("is_ref").cast("long")).alias("n_ref"),
        F.sum((~F.col("is_ref")).cast("long")).alias("n_cur"),
    )
    tot_w = Window.partitionBy()
    pr = F.greatest(
        F.col("n_ref") / F.sum("n_ref").over(tot_w), F.lit(PSI_FLOOR)
    )
    pc = F.greatest(
        F.col("n_cur") / F.sum("n_cur").over(tot_w), F.lit(PSI_FLOOR)
    )
    return counts.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(pr, 6).alias("p_ref"),
        F.round(pc, 6).alias("p_cur"),
        F.round((pc - pr) * F.log(pc / pr), 6).alias("psi_contrib"),
    )


PSI_ORACLE = f"""
WITH ev AS (
  SELECT ROUND(value, 4) AS v,
         (EXTRACT(day FROM ts) <= 15) AS is_ref
  FROM events
),
edges AS (
  SELECT {", ".join(
      f"quantile_disc(v, {(i + 1) / PSI_N_BINS}) AS e{i}"
      for i in range(PSI_N_BINS - 1)
  )}
  FROM ev WHERE is_ref
),
binned AS (
  SELECT is_ref,
         1 + {" + ".join(
             f"CASE WHEN v > (SELECT e{i} FROM edges) THEN 1 ELSE 0 END"
             for i in range(PSI_N_BINS - 1)
         )} AS bin
  FROM ev
),
counts AS (
  SELECT bin,
         CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
  FROM binned GROUP BY bin
),
props AS (
  SELECT bin, n_ref, n_cur,
         GREATEST(n_ref * 1.0 / SUM(n_ref) OVER (), {PSI_FLOOR}) AS pr,
         GREATEST(n_cur * 1.0 / SUM(n_cur) OVER (), {PSI_FLOOR}) AS pc
  FROM counts
)
SELECT bin, n_ref, n_cur,
       ROUND(pr, 6) AS p_ref, ROUND(pc, 6) AS p_cur,
       ROUND((pc - pr) * ln(pc / pr), 6) AS psi_contrib
FROM props
"""


# ---------------------------------------------------------------------------
# CUSUM changepoint over the daily event-count series
# ---------------------------------------------------------------------------


def events_cusum_changepoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CUSUM changepoint detection on the daily event-count series:
    S_d = cumulative sum of (count_d - mean), the most likely single
    changepoint is argmax |S_d| (Page's classic statistic in its
    offline scan form; tie broken by earliest day). One row: the
    located day, its |S| and signed S, the series length, and the
    mean — what a data-freshness monitor alerts on.

    Scale shape: ONE grouped count collapses events to the day frame
    (bounded by the calendar); the mean join is a broadcast of one
    row and the cumulative window runs over days, never events."""
    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("c"))
    )
    stats = daily.agg(
        F.avg("c").alias("mu"), F.count("*").alias("n_days")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "n_days",
        "mu",
        F.sum(F.col("c") - F.col("mu")).over(w).alias("s"),
    )
    pick = Window.orderBy(F.abs(F.col("s")).desc(), F.col("day"))
    return (
        s.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            F.col("day").alias("changepoint_day"),
            F.round(F.abs(F.col("s")), 4).alias("max_abs_s"),
            F.round("s", 4).alias("s_signed"),
            "n_days",
            F.round("mu", 4).alias("daily_mean"),
        )
    )


CUSUM_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY 1
),
stats AS (
  SELECT AVG(c) AS mu, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily
),
s AS (
  SELECT day, n_days, mu,
         SUM(c - mu) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS s
  FROM daily CROSS JOIN stats
),
pick AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY ABS(s) DESC, day) AS rn FROM s
)
SELECT day AS changepoint_day, ROUND(ABS(s), 4) AS max_abs_s,
       ROUND(s, 4) AS s_signed, n_days, ROUND(mu, 4) AS daily_mean
FROM pick WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit over the corpus term table
# ---------------------------------------------------------------------------

ZIPF_TOP_RANKS = 1000


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus: OLS regression of ln(freq) on
    ln(rank) for the top ZIPF_TOP_RANKS terms (rank by count desc,
    term asc) — slope ~ -1 is the law on natural text; a curated
    corpus drifting far from its baseline (deduplication removing
    too much tail, boilerplate inflating the head) shows up as
    slope/r2 movement. (The synthetic fixture corpus draws from a
    small near-uniform vocabulary, so ITS slope is shallow — the
    registered pair pins the computation, the thresholds live with
    the data.) One row: n_ranks, slope, intercept, r2 (regr_*
    aggregates, identical definitions in both engines).

    Scale shape: the term table is one grouped count (vocab-bounded,
    map-side partials); the top-K take is a TakeOrderedAndProject
    partial; the regression is one aggregate over K rows."""
    docs = read_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            F.explode(
                F.split(F.trim(F.lower("text")), r"\s+")
            ).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    ranked = tf.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), F.col("tok")))
        .alias("rank"),
    ).filter(F.col("rank") <= ZIPF_TOP_RANKS)
    pts = ranked.select(
        F.log(F.col("c").cast("double")).alias("y"),
        F.log(F.col("rank").cast("double")).alias("x"),
    )
    return pts.agg(
        F.count("*").alias("n_ranks"),
        F.round(F.expr("regr_slope(y, x)"), 4).alias("slope"),
        F.round(F.expr("regr_intercept(y, x)"), 4).alias("intercept"),
        F.round(F.expr("regr_r2(y, x)"), 4).alias("r2"),
    )


ZIPF_ORACLE = f"""
WITH toks AS (
  SELECT tok FROM documents,
       unnest(string_split_regex(trim(lower(text)), '\\s+')) AS u(tok)
  WHERE tok <> ''
),
tf AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rank FROM tf
),
pts AS (
  SELECT ln(CAST(c AS DOUBLE)) AS y, ln(CAST(rank AS DOUBLE)) AS x
  FROM ranked WHERE rank <= {ZIPF_TOP_RANKS}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_ranks,
       ROUND(regr_slope(y, x), 4) AS slope,
       ROUND(regr_intercept(y, x), 4) AS intercept,
       ROUND(regr_r2(y, x), 4) AS r2
FROM pts
"""


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth curve
# ---------------------------------------------------------------------------

HEAPS_DOC_STEP = 250


def text_heaps_vocab_growth(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Heaps'-law vocabulary growth: distinct-vocabulary size versus
    cumulative token count at every HEAPS_DOC_STEP-document
    checkpoint of the doc_id order — V(n) ~ K * n^beta; a corpus
    whose curve flattens abnormally was over-deduplicated, one whose
    curve stays linear is full of noise. All-integer output (exact
    driver hash): (checkpoint, cum_tokens, vocab).

    Scale shape: vocabulary growth needs each term's FIRST document,
    which is one grouped min over the exploded term stream (vocab-
    bounded, map-side partials) — never a cumulative distinct; both
    curves then cumulate over the bounded checkpoint frame."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    ck = (F.floor(F.col("doc_id") / HEAPS_DOC_STEP) + 1).alias("ckpt")
    # tokens per checkpoint
    tok_ck = toks.groupBy(ck).agg(F.count("*").alias("toks"))
    # new-vocab per checkpoint: each term counts at its FIRST doc
    first = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    voc_ck = first.groupBy(
        (F.floor(F.col("first_doc") / HEAPS_DOC_STEP) + 1).alias("ckpt")
    ).agg(F.count("*").alias("new_vocab"))
    w = Window.orderBy("ckpt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        tok_ck.join(voc_ck, "ckpt", "left")
        .select(
            "ckpt",
            F.sum("toks").over(w).alias("cum_tokens"),
            F.sum(F.coalesce("new_vocab", F.lit(0)))
            .over(w)
            .alias("vocab"),
        )
        .select(
            F.col("ckpt").cast("long").alias("checkpoint"),
            "cum_tokens",
            "vocab",
        )
    )


HEAPS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, tok FROM documents,
       unnest(string_split_regex(trim(lower(text)), '\\s+')) AS u(tok)
  WHERE tok <> ''
),
tok_ck AS (
  SELECT CAST(floor(doc_id / {HEAPS_DOC_STEP}) + 1 AS BIGINT) AS ckpt,
         COUNT(*) AS toks
  FROM toks GROUP BY 1
),
first AS (SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY tok),
voc_ck AS (
  SELECT CAST(floor(first_doc / {HEAPS_DOC_STEP}) + 1 AS BIGINT) AS ckpt,
         COUNT(*) AS new_vocab
  FROM first GROUP BY 1
)
SELECT t.ckpt AS checkpoint,
       CAST(SUM(t.toks) OVER (ORDER BY t.ckpt
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(v.new_vocab, 0)) OVER (ORDER BY t.ckpt
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab
FROM tok_ck t LEFT JOIN voc_ck v ON t.ckpt = v.ckpt
"""


# ---------------------------------------------------------------------------
# Classifier calibration: reliability bins + ECE contributions
# ---------------------------------------------------------------------------

CALIB_N_BINS = 10


def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + Expected Calibration Error, the third
    leg of the eval family (AUC ranks, the sweep prices thresholds,
    calibration answers "is 0.8 really 80%?"): the deterministic
    quality score binned into CALIB_N_BINS fixed-width bins, per bin
    the count, mean score (confidence), positive rate (accuracy),
    gap, and the ECE contribution n/N * |gap| — the standard
    Guo et al. ICML'17 decomposition, summable to ECE.

    Engine parity: the bin is floor(k * 10 / 97.0) on the INTEGER
    score numerator — one double division on small exact integers,
    bit-identical in both engines; all other outputs are integer
    counts or 6dp-rounded rational aggregates.

    Scale shape: one grouped aggregate to CALIB_N_BINS rows
    (map-side partials); the N total rides a whole-frame window over
    those bins."""
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    )
    k = F.col("n_chars") % 97
    binned = docs.select(
        F.floor(k * CALIB_N_BINS / F.lit(97.0)).alias("bin"),
        (k / F.lit(97.0)).alias("score"),
        (F.col("lang") == "en").cast("long").alias("label"),
    )
    g = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.avg("score").alias("conf"),
        F.avg("label").alias("acc"),
    )
    w_all = Window.partitionBy()
    return g.select(
        "bin",
        "n",
        F.round("conf", 6).alias("mean_score"),
        F.round("acc", 6).alias("pos_rate"),
        F.round(F.col("acc") - F.col("conf"), 6).alias("gap"),
        F.round(
            F.col("n")
            / F.sum("n").over(w_all)
            * F.abs(F.col("acc") - F.col("conf")),
            6,
        ).alias("ece_contrib"),
    )


CALIB_ORACLE = f"""
WITH binned AS (
  SELECT CAST(floor((n_chars % 97) * {CALIB_N_BINS} / 97.0) AS BIGINT)
           AS bin,
         (n_chars % 97) / 97.0 AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
  FROM documents
  WHERE n_chars IS NOT NULL AND lang IS NOT NULL
),
g AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
         AVG(score) AS conf, AVG(label * 1.0) AS acc
  FROM binned GROUP BY bin
)
SELECT bin, n,
       ROUND(conf, 6) AS mean_score,
       ROUND(acc, 6) AS pos_rate,
       ROUND(acc - conf, 6) AS gap,
       ROUND(n * 1.0 / SUM(n) OVER () * ABS(acc - conf), 6)
         AS ece_contrib
FROM g
"""


# ---------------------------------------------------------------------------
# int8 scalar quantization: the compression-error audit
# ---------------------------------------------------------------------------

SQ_LEVELS = 255


def embed_sq8_quantization_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """int8 scalar quantization audit — the standard first rung of
    the embedding-compression ladder (beside PQ/IVFPQ): per
    dimension, global [min, max] train the affine code q =
    floor((x - mn) / (mx - mn) * 255 + 0.5); the audit reports, per
    label, how much geometry the 4x compression costs — mean/min
    cosine(original, dequantized) and mean/max per-coordinate
    absolute error. The deploy decision ("is int8 safe for this
    corpus?") read straight off a table.

    Engine parity: quantization uses floor(v + 0.5), identical
    semantics in both engines (never round() — Spark HALF_UP vs
    DuckDB's away-from-zero differ on exact .5 boundaries);
    per-vector sums explode over (vec, dim) pairs and aggregate —
    float sums rounded 6dp after the final aggregate only.

    Scale shape: per-dim ranges are ONE aggregate over the exploded
    frame (64 rows out, map-side partials) broadcast back; the error
    sums are one grouped aggregate per vector then one per label —
    vectors never pair, nothing corpus-sized is collected."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "x"
        ),
    )
    ranges = emb.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    q = F.floor(
        (F.col("x") - F.col("mn"))
        / (F.col("mx") - F.col("mn"))
        * SQ_LEVELS
        + F.lit(0.5)
    )
    # A constant dimension (mx == mn) makes the affine scale 0/0 —
    # the quantizer's degenerate case dequantizes every value to the
    # constant itself (zero error), in BOTH engines, instead of
    # leaking NaN into the cosine/MAE aggregates where Spark and
    # DuckDB propagate NULL/NaN differently.
    deq = F.when(F.col("mx") == F.col("mn"), F.col("mn")).otherwise(
        F.col("mn") + q * (F.col("mx") - F.col("mn")) / SQ_LEVELS
    )
    per_dim = emb.join(F.broadcast(ranges), "dim").select(
        "vec_id",
        "label",
        "x",
        deq.alias("xq"),
    )
    per_vec = per_dim.groupBy("vec_id", "label").agg(
        (
            F.sum(F.col("x") * F.col("xq"))
            / (
                F.sqrt(F.sum(F.col("x") * F.col("x")))
                * F.sqrt(F.sum(F.col("xq") * F.col("xq")))
            )
        ).alias("cos"),
        F.avg(F.abs(F.col("x") - F.col("xq"))).alias("mae"),
        F.max(F.abs(F.col("x") - F.col("xq"))).alias("maxe"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("cos"), 6).alias("avg_cos"),
            F.round(F.min("cos"), 6).alias("min_cos"),
            F.round(F.avg("mae"), 6).alias("avg_abs_err"),
            F.round(F.max("maxe"), 6).alias("max_abs_err"),
        )
        .orderBy("label")
    )


SQ8_ORACLE = f"""
WITH emb AS (
  SELECT vec_id, label, CAST(dim - 1 AS BIGINT) AS dim,
         CAST(embedding[dim] AS DOUBLE) AS x
  FROM embeddings,
       UNNEST(range(1, len(embedding) + 1)) AS u(dim)
),
ranges AS (
  SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM emb GROUP BY dim
),
per_dim AS (
  SELECT e.vec_id, e.label, e.x,
         CASE WHEN r.mx = r.mn THEN r.mn
              ELSE r.mn
                + floor((e.x - r.mn) / (r.mx - r.mn) * {SQ_LEVELS} + 0.5)
                * (r.mx - r.mn) / {SQ_LEVELS}
         END AS xq
  FROM emb e JOIN ranges r ON e.dim = r.dim
),
per_vec AS (
  SELECT vec_id, label,
         SUM(x * xq) / (SQRT(SUM(x * x)) * SQRT(SUM(xq * xq))) AS cos,
         AVG(ABS(x - xq)) AS mae,
         MAX(ABS(x - xq)) AS maxe
  FROM per_dim GROUP BY vec_id, label
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(AVG(cos), 6) AS avg_cos,
       ROUND(MIN(cos), 6) AS min_cos,
       ROUND(AVG(mae), 6) AS avg_abs_err,
       ROUND(MAX(maxe), 6) AS max_abs_err
FROM per_vec GROUP BY label
"""


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between per-source unigram distributions
# ---------------------------------------------------------------------------


def text_js_divergence_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the unigram
    distributions of every source pair — the DISTRIBUTIONAL
    complement to dedup_source_overlap_matrix's shingle containment:
    overlap finds copied text, JS divergence finds sources whose
    vocabularies drifted apart (or collapsed together after
    over-aggressive curation). Symmetric, bounded by ln 2, exact
    decomposition: the shared-vocabulary mass contributes
    0.5*(p*ln(2p/(p+q)) + q*ln(2q/(p+q))) per term, and each side's
    EXCLUSIVE mass contributes 0.5*(1 - shared_p)*ln 2 (the q=0
    limit) — so the inner join on shared terms plus two grouped sums
    is the whole computation; the union vocabulary never
    materializes.

    Scale shape: one grouped count to the (source, term) frame
    (vocab-bounded, map-side partials); per-source totals broadcast;
    ONE term-keyed self-join of the probability table (never doc
    pairs); the pair frame is |sources|^2-bounded."""
    import math

    docs = read_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "source",
            F.explode(
                F.split(F.trim(F.lower("text")), r"\s+")
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    tot = tf.groupBy("source").agg(F.sum("c").alias("n"))
    probs = tf.join(F.broadcast(tot), "source").select(
        "source", "tok", (F.col("c") / F.col("n")).alias("p")
    )
    a = probs.select(
        F.col("source").alias("src_a"), "tok", F.col("p").alias("pa")
    )
    b = probs.select(
        F.col("source").alias("src_b"), "tok", F.col("p").alias("pb")
    )
    shared = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.count("*").alias("n_shared_terms"),
            F.sum(
                0.5
                * (
                    F.col("pa")
                    * F.log(2.0 * F.col("pa") / (F.col("pa") + F.col("pb")))
                    + F.col("pb")
                    * F.log(2.0 * F.col("pb") / (F.col("pa") + F.col("pb")))
                )
            ).alias("js_shared"),
            F.sum("pa").alias("sa"),
            F.sum("pb").alias("sb"),
        )
    )
    srcs = tot.select(F.col("source"))
    all_pairs = (
        srcs.select(F.col("source").alias("src_a"))
        .crossJoin(srcs.select(F.col("source").alias("src_b")))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    ln2 = math.log(2.0)
    return all_pairs.join(shared, ["src_a", "src_b"], "left").select(
        "src_a",
        "src_b",
        F.coalesce("n_shared_terms", F.lit(0)).alias("n_shared_terms"),
        F.round(
            F.coalesce("js_shared", F.lit(0.0))
            + 0.5 * (1.0 - F.coalesce("sa", F.lit(0.0))) * ln2
            + 0.5 * (1.0 - F.coalesce("sb", F.lit(0.0))) * ln2,
            6,
        ).alias("js_divergence"),
    )


JS_ORACLE = """
WITH tf AS (
  SELECT source, tok, COUNT(*) AS c
  FROM documents,
       unnest(string_split_regex(trim(lower(text)), '\\s+')) AS u(tok)
  WHERE tok <> ''
  GROUP BY source, tok
),
tot AS (SELECT source, SUM(c) AS n FROM tf GROUP BY source),
probs AS (
  SELECT tf.source, tf.tok, tf.c * 1.0 / tot.n AS p
  FROM tf JOIN tot ON tf.source = tot.source
),
shared AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared_terms,
         SUM(0.5 * (a.p * ln(2.0 * a.p / (a.p + b.p))
                    + b.p * ln(2.0 * b.p / (a.p + b.p)))) AS js_shared,
         SUM(a.p) AS sa, SUM(b.p) AS sb
  FROM probs a JOIN probs b
    ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
),
all_pairs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM tot a JOIN tot b ON a.source < b.source
)
SELECT p.src_a, p.src_b,
       COALESCE(s.n_shared_terms, 0) AS n_shared_terms,
       ROUND(COALESCE(s.js_shared, 0)
             + 0.5 * (1.0 - COALESCE(s.sa, 0)) * ln(2.0)
             + 0.5 * (1.0 - COALESCE(s.sb, 0)) * ln(2.0), 6)
         AS js_divergence
FROM all_pairs p LEFT JOIN shared s
  ON p.src_a = s.src_a AND p.src_b = s.src_b
"""


# ---------------------------------------------------------------------------
# Shared zero-filled daily event-count series (ACF + Mann-Kendall)
# ---------------------------------------------------------------------------


def _zero_filled_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, t, y): the calendar-indexed daily event-count series —
    missing days are genuine zeros and are materialized as such (the
    ONE definition of the day derivation both the ACF and the
    Mann-Kendall probes run on; skipping days would shift every ACF
    lag and every MK pair). t = days since the first day.

    Scale shape: ONE grouped count collapses events to the day frame;
    the calendar spine is a sequence-explode over the bounded date
    range."""
    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("c"))
    )
    bounds = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        F.col("d0"),
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias(
            "day"
        ),
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.datediff("day", "d0").alias("t"),
        F.coalesce("c", F.lit(0)).cast("double").alias("y"),
    )


# the oracle twin of _zero_filled_daily: CTE prefix shared verbatim by
# the ACF and Mann-Kendall oracles
_DAILY_SERIES_SQL = """daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
spine AS (
  SELECT b.d0,
         UNNEST(generate_series(b.d0, b.d1, INTERVAL 1 DAY))::DATE
           AS day
  FROM bounds b
),
series AS (
  SELECT s.day, DATE_DIFF('day', s.d0, s.day) AS t,
         CAST(COALESCE(d.c, 0) AS DOUBLE) AS y
  FROM spine s LEFT JOIN daily d ON s.day = d.day
)"""


# ---------------------------------------------------------------------------
# Autocorrelation of the daily event-count series (seasonality probe)
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 14


def events_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event-count series at
    lags 1..ACF_MAX_LAG — the standard seasonality/periodicity probe
    run beside the CUSUM changepoint (a weekly ingest cadence shows
    as a lag-7 spike; its DISAPPEARANCE is a pipeline-change signal).
    Uses the standard biased ACF estimator r_k =
    sum((y_t - ybar)(y_{t+k} - ybar)) / sum((y_t - ybar)^2) over the
    calendar-indexed series (_zero_filled_daily). ALL lags 1..14 are
    always present: a lag with no (t, t+k) pair in a short series
    reports NULL acf rather than silently narrowing the frame.

    Scale shape: the _zero_filled_daily collapse, then a day-keyed
    lag join over the bounded spine — nothing event-sized shuffles
    twice."""
    series = _zero_filled_daily(spark, sf_dir).select("day", "y")
    # centered series once; denominator = sum of squared deviations
    w_all = Window.partitionBy()
    centered = series.select(
        "day",
        (F.col("y") - F.avg("y").over(w_all)).alias("dy"),
    )
    denom = centered.agg(
        F.sum(F.col("dy") * F.col("dy")).alias("ss"),
        F.count("*").alias("n_days"),
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = centered.select("day", F.col("dy").alias("dy_a"))
    b = centered.select(
        F.col("day").alias("day_b"), F.col("dy").alias("dy_b")
    )
    prods = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.expr("date_add(day, lag)") == F.col("day_b"),
        )
        .groupBy("lag")
        .agg(F.sum(F.col("dy_a") * F.col("dy_b")).alias("num"))
    )
    return (
        lags.crossJoin(F.broadcast(denom))
        .join(prods, "lag", "left")
        .select(
            "lag",
            "n_days",
            F.round(F.col("num") / F.col("ss"), 6).alias("acf"),
        )
        .orderBy("lag")
    )


ACF_ORACLE = f"""
WITH {_DAILY_SERIES_SQL},
centered AS (
  SELECT day, y - AVG(y) OVER () AS dy FROM series
),
denom AS (
  SELECT SUM(dy * dy) AS ss, CAST(COUNT(*) AS BIGINT) AS n_days
  FROM centered
),
lags AS (SELECT UNNEST(range(1, {ACF_MAX_LAG} + 1)) AS lag),
prods AS (
  SELECT l.lag, SUM(a.dy * b.dy) AS num
  FROM lags l
  JOIN centered a ON TRUE
  JOIN centered b ON b.day = a.day + CAST(l.lag AS INTEGER)
  GROUP BY l.lag
)
SELECT CAST(l.lag AS INTEGER) AS lag, d.n_days,
       ROUND(p.num / d.ss, 6) AS acf
FROM lags l CROSS JOIN denom d
LEFT JOIN prods p ON p.lag = l.lag
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit over order values (data-quality / fraud screen)
# ---------------------------------------------------------------------------


def stats_benford_first_digit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benford's-law first-significant-digit audit of order values:
    observed digit shares vs the log10(1 + 1/d) expectation, with the
    per-digit Pearson chi-square contribution — the classic
    fabricated-numbers / unit-mixup screen run over ingested monetary
    columns. The first digit is extracted numerically
    (floor(x / 10^floor(log10 x))), identical arithmetic in both
    engines.

    Scale shape: ONE grouped count collapses the corpus to the 9-digit
    frame; totals and expectations ride whole-frame windows over those
    9 rows. Nothing else shuffles."""
    x = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.floor(
                F.col("o_totalprice")
                / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
            )
            .cast("int")
            .alias("digit")
        )
    )
    per = x.groupBy("digit").agg(F.count("*").alias("n_obs"))
    w_all = Window.partitionBy()
    exp_share = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    n = F.sum("n_obs").over(w_all)
    return (
        per.select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs") / n, 6).alias("obs_share"),
            F.round(exp_share, 6).alias("exp_share"),
            F.round(
                F.pow(F.col("n_obs") - n * exp_share, F.lit(2.0))
                / (n * exp_share),
                6,
            ).alias("chi2_part"),
        )
        .orderBy("digit")
    )


BENFORD_ORACLE = """
WITH x AS (
  SELECT CAST(FLOOR(o_totalprice
               / POW(10.0, FLOOR(LOG10(o_totalprice)))) AS INTEGER)
         AS digit
  FROM orders WHERE o_totalprice > 0
),
per AS (SELECT digit, COUNT(*) AS n_obs FROM x GROUP BY digit)
SELECT digit, n_obs,
       ROUND(n_obs * 1.0 / SUM(n_obs) OVER (), 6) AS obs_share,
       ROUND(LOG10(1.0 + 1.0 / digit), 6) AS exp_share,
       ROUND(POW(n_obs - SUM(n_obs) OVER () * LOG10(1.0 + 1.0 / digit),
                 2.0)
             / (SUM(n_obs) OVER () * LOG10(1.0 + 1.0 / digit)),
             6) AS chi2_part
FROM per
"""


# ---------------------------------------------------------------------------
# Mann-Kendall trend test + Theil-Sen slope over the daily event series
# ---------------------------------------------------------------------------


def events_trend_mann_kendall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mann-Kendall nonparametric trend test over the zero-filled
    daily event-count series (S = sum over i<j of sign(y_j - y_i),
    tie-corrected variance, normal-approximation two-sided p-value via
    the Abramowitz-Stegun 26.2.17 polynomial — identical literal
    coefficients in both engines) plus the Theil-Sen slope (the
    DISC-median of pairwise slopes, the verified engine-parity
    percentile construction). The robust companion to the CUSUM
    changepoint: monotone ingest drift that never jumps.

    Scale shape: the _zero_filled_daily collapse (shared with the
    ACF, so the two probes can never disagree on the day derivation);
    the i<j pair join, the tie groups, and every statistic live on
    that bounded day frame — the corpus shuffles once."""
    series = _zero_filled_daily(spark, sf_dir).select("t", "y")
    a = series.select(
        F.col("t").alias("ti"), F.col("y").alias("yi")
    )
    b = series.select(
        F.col("t").alias("tj"), F.col("y").alias("yj")
    )
    pair_stats = (
        a.join(b, F.col("ti") < F.col("tj"))
        .agg(
            F.sum(F.signum(F.col("yj") - F.col("yi")))
            .cast("long")
            .alias("s_stat"),
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP "
                "(ORDER BY (yj - yi) / (tj - ti))"
            ).alias("sen_slope"),
        )
    )
    ties = (
        series.groupBy("y")
        .agg(F.count("*").alias("tc"))
        .agg(
            F.sum(
                F.col("tc")
                * (F.col("tc") - 1)
                * (2 * F.col("tc") + 5)
            ).alias("tie_corr"),
            F.sum("tc").alias("n_days"),
        )
    )
    stats = pair_stats.crossJoin(F.broadcast(ties)).select(
        "n_days",
        "s_stat",
        "sen_slope",
        (
            (
                F.col("n_days")
                * (F.col("n_days") - 1)
                * (2 * F.col("n_days") + 5)
                - F.col("tie_corr")
            )
            / F.lit(18.0)
        ).alias("var_s"),
    )
    z = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(F.lit(0.0))
    ) / F.sqrt("var_s")
    # two-sided p = 2 * Q(|z|); Q(z) = phi(z) * (b1 t + ... + b5 t^5),
    # t = 1 / (1 + 0.2316419 z)  (A&S 26.2.17, |error| < 7.5e-8)
    az = F.abs(z)
    t_ = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * az)
    phi = F.exp(F.lit(-0.5) * az * az) / F.lit(2.5066282746310002)
    poly = (
        F.lit(0.319381530) * t_
        + F.lit(-0.356563782) * F.pow(t_, F.lit(2.0))
        + F.lit(1.781477937) * F.pow(t_, F.lit(3.0))
        + F.lit(-1.821255978) * F.pow(t_, F.lit(4.0))
        + F.lit(1.330274429) * F.pow(t_, F.lit(5.0))
    )
    p = F.least(F.lit(2.0) * phi * poly, F.lit(1.0))
    return stats.select(
        "n_days",
        "s_stat",
        F.round("var_s", 6).alias("var_s"),
        F.round(z, 6).alias("z_stat"),
        F.round(p, 6).alias("p_value"),
        F.round("sen_slope", 6).alias("sen_slope"),
    )


MK_ORACLE = f"""
WITH {_DAILY_SERIES_SQL},
pair_stats AS (
  SELECT CAST(SUM(SIGN(b.y - a.y)) AS BIGINT) AS s_stat,
         QUANTILE_DISC((b.y - a.y) / (b.t - a.t), 0.5) AS sen_slope
  FROM series a JOIN series b ON a.t < b.t
),
ties AS (
  SELECT SUM(tc * (tc - 1) * (2 * tc + 5)) AS tie_corr,
         CAST(SUM(tc) AS BIGINT) AS n_days
  FROM (SELECT COUNT(*) AS tc FROM series GROUP BY y)
),
stats AS (
  SELECT t.n_days, p.s_stat, p.sen_slope,
         (t.n_days * (t.n_days - 1) * (2 * t.n_days + 5) - t.tie_corr)
           / 18.0 AS var_s
  FROM pair_stats p CROSS JOIN ties t
),
zc AS (
  SELECT *,
         (CASE WHEN s_stat > 0 THEN s_stat - 1
               WHEN s_stat < 0 THEN s_stat + 1
               ELSE 0.0 END) / SQRT(var_s) AS z
  FROM stats
),
qc AS (
  SELECT *, ABS(z) AS az,
         1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt
  FROM zc
)
SELECT n_days, s_stat, ROUND(var_s, 6) AS var_s,
       ROUND(z, 6) AS z_stat,
       ROUND(LEAST(
         2.0 * (EXP(-0.5 * az * az) / 2.5066282746310002)
             * (0.319381530 * tt
                - 0.356563782 * POW(tt, 2.0)
                + 1.781477937 * POW(tt, 3.0)
                - 1.821255978 * POW(tt, 4.0)
                + 1.330274429 * POW(tt, 5.0)),
         1.0), 6) AS p_value,
       ROUND(sen_slope, 6) AS sen_slope
FROM qc
"""


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman supplier-concentration index per nation
# ---------------------------------------------------------------------------


def stats_hhi_supplier_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Herfindahl-Hirschman index of supplier revenue concentration
    within each nation (HHI = 10000 * sum of squared revenue shares —
    the antitrust-screening convention) plus the top-supplier share
    (CR1) and supplier count. The market-structure audit a sourcing
    or data-mixture dashboard runs per segment.

    Scale shape: ONE suppkey-grouped aggregate collapses lineitem to
    the supplier frame; the supplier and nation dims broadcast; the
    within-nation share is a window over the bounded supplier frame
    partitioned by nation. The corpus shuffles once, on l_suppkey."""
    rev = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev")
        )
    )
    sup = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    w_nat = Window.partitionBy("n_name")
    share = (
        rev.join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(
            "n_name",
            (F.col("rev") / F.sum("rev").over(w_nat)).alias("share"),
        )
    )
    return (
        share.groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(
                F.lit(10000.0) * F.sum(F.col("share") * F.col("share")),
                4,
            ).alias("hhi"),
            F.round(F.max("share"), 6).alias("cr1"),
        )
        .orderBy("n_name")
    )


HHI_ORACLE = """
WITH rev AS (
  SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem GROUP BY l_suppkey
),
share AS (
  SELECT n.n_name,
         r.rev / SUM(r.rev) OVER (PARTITION BY n.n_name) AS share
  FROM rev r
  JOIN supplier s ON r.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
)
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       ROUND(10000.0 * SUM(share * share), 4) AS hhi,
       ROUND(MAX(share), 6) AS cr1
FROM share GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Registration hook for round 11
# ---------------------------------------------------------------------------

PENDING_ORDER = [
    "stats_ks_drift_segments",
    "stats_psi_value_drift",
    "events_cusum_changepoint",
    "text_zipf_fit",
    "text_heaps_vocab_growth",
    "eval_calibration_bins",
    "embed_sq8_quantization_error",
    "text_js_divergence_sources",
    "events_acf_daily",
    "stats_benford_first_digit",
    "events_trend_mann_kendall",
    "stats_hhi_supplier_concentration",
]

_PENDING = {
    "stats_ks_drift_segments": (stats_ks_drift_segments, KS_ORACLE),
    "stats_psi_value_drift": (stats_psi_value_drift, PSI_ORACLE),
    "events_cusum_changepoint": (
        events_cusum_changepoint,
        CUSUM_ORACLE,
    ),
    "text_zipf_fit": (text_zipf_fit, ZIPF_ORACLE),
    "text_heaps_vocab_growth": (
        text_heaps_vocab_growth,
        HEAPS_ORACLE,
    ),
    "eval_calibration_bins": (eval_calibration_bins, CALIB_ORACLE),
    "embed_sq8_quantization_error": (
        embed_sq8_quantization_error,
        SQ8_ORACLE,
    ),
    "text_js_divergence_sources": (
        text_js_divergence_sources,
        JS_ORACLE,
    ),
    "events_acf_daily": (events_acf_daily, ACF_ORACLE),
    "stats_benford_first_digit": (
        stats_benford_first_digit,
        BENFORD_ORACLE,
    ),
    "events_trend_mann_kendall": (
        events_trend_mann_kendall,
        MK_ORACLE,
    ),
    "stats_hhi_supplier_concentration": (
        stats_hhi_supplier_concentration,
        HHI_ORACLE,
    ),
}


def register_all() -> None:
    """Register every pending query (round-11 hook). One-shot: the
    registry's duplicate check fires on a second call."""
    from cdc_2025_spark.queries.registry import query

    for name in PENDING_ORDER:
        fn, oracle = _PENDING[name]
        query(name, oracle=oracle)(fn)
