"""Apriori frequent-itemset mining: result-set equality against a
brute-force pure-python model on a literal basket fixture (the
level-wise join + prune must be invisible in the RESULT — it is a
work-saving device, never a semantics change), plus distinct-ification
and co-occurrence pins.
"""

from __future__ import annotations

from datetime import datetime
from itertools import combinations

from cdc_2025_spark.queries.behavior import (
    MINSUP_DEN,
    MINSUP_NUM,
    mine_frequent_event_sets,
)

_TS = datetime(2024, 1, 1, 12, 0, 0)


def _write_events(spark, tmp_path, baskets):
    """baskets: list of iterables of event types; basket i becomes
    user i's day-1 events (with a duplicate of the first type, to pin
    that raw events distinct-ify into set-valued baskets)."""
    rows = []
    eid = 0
    for uid, types in enumerate(baskets):
        types = list(types)
        for t in types + types[:1]:
            rows.append((eid, _TS, uid, t, 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _python_model(baskets):
    sets = [frozenset(b) for b in baskets]
    n = len(sets)
    out = {}
    items = sorted(set().union(*sets))
    for k in (1, 2, 3):
        for cand in combinations(items, k):
            cnt = sum(1 for s in sets if set(cand) <= s)
            if cnt * MINSUP_DEN >= MINSUP_NUM * n:
                out[",".join(cand)] = (k, cnt, round(cnt / n, 4))
    return out


def test_matches_bruteforce_model(spark, tmp_path):
    """38 singleton filler baskets push the support threshold to 2
    occurrences, so singles, pairs and triples all straddle the
    frequent boundary; the engine must agree with exhaustive
    enumeration exactly."""
    baskets = (
        [["x"]] * 30
        + [["p", "q"], ["p", "q"], ["p", "r"], ["p", "r"]]
        + [["p", "q", "r"], ["q", "r", "s"], ["s"], ["x", "s"]]
    )
    sf_dir = _write_events(spark, tmp_path, baskets)
    got = {
        r["itemset"]: (
            r["itemset_size"],
            r["support_count"],
            r["support"],
        )
        for r in mine_frequent_event_sets(spark, sf_dir).collect()
    }
    assert got == _python_model(baskets)


def test_never_cooccurring_pair_absent(spark, tmp_path):
    """Two individually-frequent items that never share a basket
    yield no pair row (count 0 is never emitted)."""
    baskets = [["a"], ["b"]] * 5
    sf_dir = _write_events(spark, tmp_path, baskets)
    got = mine_frequent_event_sets(spark, sf_dir).collect()
    assert {r["itemset"] for r in got} == {"a", "b"}
    assert all(r["support_count"] == 5 for r in got)


def test_association_rules_match_bruteforce(spark, tmp_path):
    """Rules from a literal fixture must equal exhaustive rule
    enumeration over the brute-force frequent sets: every 1->1 and
    2->1 split, confidence filter integer-exact, lift =
    n*c(set)/(c(ante)*c(cons))."""
    from cdc_2025_spark.queries.behavior import (
        MINCONF_DEN,
        MINCONF_NUM,
        mine_association_rules,
    )

    baskets = (
        [["x"]] * 30
        + [["p", "q"], ["p", "q"], ["p", "r"], ["p", "r"]]
        + [["p", "q", "r"], ["q", "r", "s"], ["s"], ["x", "s"]]
    )
    sf_dir = _write_events(spark, tmp_path, baskets)
    sets = [frozenset(b) for b in baskets]
    n = len(sets)

    def cnt(c):
        return sum(1 for s in sets if set(c) <= s)

    freq = _python_model(baskets)
    want = {}
    for itemset, (k, c_set, _) in freq.items():
        if k == 1:
            continue
        members = itemset.split(",")
        for cons in members:
            ante = [m for m in members if m != cons]
            c_ante, c_cons = cnt(ante), cnt([cons])
            if c_set * MINCONF_DEN >= MINCONF_NUM * c_ante:
                want[(",".join(ante), cons)] = (
                    c_set,
                    round(c_set / c_ante, 4),
                    round(c_set * n / (c_ante * c_cons), 4),
                )
    got = {
        (r["antecedent"], r["consequent"]): (
            r["rule_support_count"],
            r["confidence"],
            r["lift"],
        )
        for r in mine_association_rules(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0
