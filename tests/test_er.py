"""Entity resolution: blocking recall/precision on planted
duplicates, no-cross-product blocking, transitive closure through a
chain, deterministic survivorship, and NULL block keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_2025_spark.functions.er import (
    blocked_candidate_pairs,
    golden_records,
)


@pytest.fixture(scope="module")
def contacts(spark):
    # planted truth: {1,2,3} one entity (typo chain), {4,5} another
    # (shared zip, name variants), 6 and 7 singletons; 8/9 share a
    # NULL zip and must NOT become candidates through it
    rows = [
        (1, "john smith", "94110", 5),
        (2, "jona smith", "94110", 3),  # typo of 1; same zip block
        (3, "jona smyth", "02139", 4),  # typo of 2; prefix block only
        (4, "maria garcia", "60601", 9),
        (5, "maria l garcia", "60601", 2),
        (6, "wei chen", "10001", 7),
        (7, "amara okafor", "73301", 8),
        (8, "k. bell", None, 1),
        (9, "t. hall", None, 6),
    ]
    return spark.createDataFrame(
        rows, "cid long, name string, zip string, completeness int"
    )


def _keys():
    return [
        F.substring(F.col("name"), 1, 4),  # name prefix block
        F.col("zip"),  # exact zip block
    ]


def test_blocking_candidates_and_null_keys(spark, contacts):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in blocked_candidate_pairs(contacts, "cid", _keys()).collect()
    }
    # typo chain: (1,2) via zip AND prefix, (2,3) via prefix; (1,3)
    # shares neither block — transitive closure's job, not blocking's
    assert {(1, 2), (2, 3), (4, 5)} <= pairs
    assert (1, 3) not in pairs
    # NULL zips never block together
    assert (8, 9) not in pairs
    # blocking is not a cross product: 9 rows -> far fewer than C(9,2)
    assert len(pairs) < 36


def test_golden_records_closure_and_survivorship(spark, contacts):
    cand = blocked_candidate_pairs(contacts, "cid", _keys())
    # gate: edit distance <= 2 on names
    named = contacts.select("cid", "name")
    matches = (
        cand.join(
            named.select(
                F.col("cid").alias("id_a"), F.col("name").alias("na")
            ),
            "id_a",
        )
        .join(
            named.select(
                F.col("cid").alias("id_b"), F.col("name").alias("nb")
            ),
            "id_b",
        )
        .filter(F.levenshtein("na", "nb") <= 2)
        .select("id_a", "id_b")
    )
    out = golden_records(
        contacts, "cid", matches, [F.col("completeness").desc()]
    )
    rows = {r["cid"]: r for r in out.collect()}
    # closure: 3 reaches 1 through 2 even though (1,3) never blocked
    assert rows[1]["cluster_id"] == rows[2]["cluster_id"] == rows[3]["cluster_id"] == 1
    assert rows[4]["cluster_id"] == rows[5]["cluster_id"] == 4
    for cid in (6, 7, 8, 9):
        assert rows[cid]["cluster_id"] == cid and rows[cid]["is_golden"]
    # survivorship: highest completeness wins
    assert rows[1]["is_golden"] and not rows[2]["is_golden"] and not rows[3]["is_golden"]
    assert rows[4]["is_golden"] and not rows[5]["is_golden"]
    # exactly one golden per cluster
    golden = [r for r in rows.values() if r["is_golden"]]
    assert len(golden) == len({r["cluster_id"] for r in rows.values()})


def test_blocking_requires_keys_and_plans_equi_joins(spark, contacts):
    from cdc_2025_spark.plans import plan_string

    with pytest.raises(ValueError):
        blocked_candidate_pairs(contacts, "cid", [])
    p = plan_string(blocked_candidate_pairs(contacts, "cid", _keys()))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_golden_records_string_ids(spark):
    """Non-integral ids (UUID-ish strings) must cluster correctly via
    the internal dense-long mapping — the cluster label is the
    lexicographic min id, closure still crosses blocks, and column
    collisions raise instead of clobbering."""
    rows = [
        ("u-b", "jona smith", 3),
        ("u-a", "john smith", 5),
        ("u-c", "jona smyth", 4),
        ("u-d", "wei chen", 7),
    ]
    df = spark.createDataFrame(
        rows, "cid string, name string, completeness int"
    )
    pairs = spark.createDataFrame(
        [("u-a", "u-b"), ("u-b", "u-c")], "id_a string, id_b string"
    )
    out = {
        r["cid"]: r
        for r in golden_records(
            df, "cid", pairs, [F.col("completeness").desc()]
        ).collect()
    }
    assert (
        out["u-a"]["cluster_id"]
        == out["u-b"]["cluster_id"]
        == out["u-c"]["cluster_id"]
        == "u-a"
    )
    assert out["u-d"]["cluster_id"] == "u-d" and out["u-d"]["is_golden"]
    assert out["u-a"]["is_golden"]
    assert not out["u-b"]["is_golden"] and not out["u-c"]["is_golden"]
    clash = df.withColumn("cluster_id", F.lit(1))
    with pytest.raises(ValueError):
        golden_records(clash, "cid", pairs, [F.col("completeness")])


def test_blocking_matches_python_model_property(spark):
    """Property (deterministic grid, no hypothesis needed — the
    model is exhaustive): blocked_candidate_pairs emits EXACTLY the
    id pairs sharing >= 1 non-NULL block key — sound (no pair
    without a shared key) and complete (every shared-key pair) —
    across a grid of random-ish fixtures with NULLs and collisions."""
    import itertools

    for seed in range(4):
        rows = []
        for i in range(14):
            zip_ = None if (i + seed) % 5 == 0 else f"z{(i * 7 + seed) % 4}"
            pre = f"p{(i * 3 + seed) % 5}"
            rows.append((i, pre + "-name", zip_))
        df = spark.createDataFrame(rows, "cid long, name string, zip string")
        keys = [F.substring(F.col("name"), 1, 2), F.col("zip")]
        got = {
            (r["id_a"], r["id_b"])
            for r in blocked_candidate_pairs(df, "cid", keys).collect()
        }
        want = set()
        for (ia, na, za), (ib, nb, zb) in itertools.combinations(rows, 2):
            a, b = min(ia, ib), max(ia, ib)
            if na[:2] == nb[:2] or (za is not None and za == zb):
                want.add((a, b))
        assert got == want, (seed, got ^ want)


def test_snm_pairing_in_oversized_blocks_matches_model(spark):
    """max_block switches an oversized block to sorted-neighborhood
    pairing: rank members by (order, id), pair ranks within the
    window — pinned against a python model; small blocks keep full
    pairing; the default path (max_block=None) is unchanged."""
    from pyspark.sql import functions as F

    from cdc_2025_spark.functions.er import blocked_candidate_pairs

    rows = []
    # block 'big': 30 members with shuffled order values
    for i in range(30):
        rows.append((i, "big", float((i * 7) % 30)))
    # block 'small': 4 members -> full pairing
    for i in range(100, 104):
        rows.append((i, "small", float(i)))
    df = spark.createDataFrame(rows, "id long, blk string, v double")

    got = {
        (r["id_a"], r["id_b"])
        for r in blocked_candidate_pairs(
            df,
            "id",
            [F.col("blk")],
            max_block=10,
            snm_order=F.col("v"),
            snm_window=3,
        ).collect()
    }
    # python model
    big = sorted(
        [(float((i * 7) % 30), i) for i in range(30)]
    )
    want = set()
    for a in range(len(big)):
        for b in range(a + 1, min(a + 4, len(big))):
            want.add(
                (min(big[a][1], big[b][1]), max(big[a][1], big[b][1]))
            )
    for a in range(100, 104):
        for b in range(a + 1, 104):
            want.add((a, b))
    assert got == want

    # default path unchanged: full pairing everywhere
    full = blocked_candidate_pairs(df, "id", [F.col("blk")]).count()
    assert full == 30 * 29 // 2 + 6

    import pytest as pt

    with pt.raises(ValueError, match="snm_order"):
        blocked_candidate_pairs(
            df, "id", [F.col("blk")], max_block=10
        )


def test_order_band_post_gate_set_identical(spark):
    """order_band prunes the small-block self-join to adjacent
    floor(order/band) bands. Contract: after a |Δorder| <= band gate
    the match set is IDENTICAL to the unbanded kernel's — including
    NULL orders (never pair banded; pair-then-fail-the-gate unbanded)
    and values sitting exactly on band boundaries. Each surviving
    pair must also be emitted exactly once (distinct=False)."""
    import itertools

    from pyspark.sql import functions as F

    from cdc_2025_spark.functions.er import blocked_candidate_pairs

    rows = []
    vals = [0.0, 1.9, 2.0, 2.1, 3.9999, 4.0, 6.0, -2.0, -0.01, None]
    for i, v in enumerate(vals):
        rows.append((i, "blk", v))
    rows.append((99, "other", 2.5))
    rows.append((98, "other", 4.49))
    df = spark.createDataFrame(rows, "id long, blk string, v double")
    eps = 2.0

    def gated(extra):
        cand = blocked_candidate_pairs(
            df,
            "id",
            [F.col("blk")],
            snm_order=F.col("v"),
            keep_order=True,
            distinct=False,
            **extra,
        ).filter(F.abs(F.col("ord_a") - F.col("ord_b")) <= eps)
        got = [
            (r["id_a"], r["id_b"]) for r in cand.collect()
        ]
        assert len(got) == len(set(got)), "duplicate pair emitted"
        return set(got)

    plain = gated({})
    banded = gated({"order_band": eps})
    assert banded == plain and plain
    # cross-check vs an exhaustive python model
    want = set()
    for (ia, ba, va), (ib, bb, vb) in itertools.combinations(rows, 2):
        if ba == bb and va is not None and vb is not None and abs(va - vb) <= eps:
            want.add((min(ia, ib), max(ia, ib)))
    assert plain == want

    import pytest as pt

    with pt.raises(ValueError, match="order_band"):
        blocked_candidate_pairs(
            df, "id", [F.col("blk")], snm_order=F.col("v"), order_band=0.0
        )
    with pt.raises(ValueError, match="snm_order"):
        blocked_candidate_pairs(
            df, "id", [F.col("blk")], order_band=1.0
        )
