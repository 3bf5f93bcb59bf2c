"""k-anonymity audit + suppression: literal-fixture counts, the
suppression/audit consistency law, idempotence, NULL-QI handling,
and empty input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_2025_spark.functions.privacy import (
    k_anonymity_audit,
    suppress_below_k,
)


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        # (zip, age_band): group sizes 3, 2, 1, 1(with NULL zip x2)
        ("94110", "30-39", "a"),
        ("94110", "30-39", "b"),
        ("94110", "30-39", "c"),
        ("94110", "40-49", "d"),
        ("94110", "40-49", "e"),
        ("02139", "30-39", "f"),
        (None, "40-49", "g"),
        (None, "40-49", "h"),
    ]
    return spark.createDataFrame(rows, "zip string, age string, name string")


def test_audit_counts_literal(spark, people):
    row = k_anonymity_audit(people, ["zip", "age"], 2).collect()[0]
    assert (
        row["n_groups"],
        row["n_rows"],
        row["n_violating_groups"],
        row["n_at_risk_rows"],
        row["k_effective"],
    ) == (4, 8, 1, 1, 1)
    # at k=3 the two 2-groups (incl. the NULL-zip one) become at-risk
    row3 = k_anonymity_audit(people, ["zip", "age"], 3).collect()[0]
    assert (row3["n_violating_groups"], row3["n_at_risk_rows"]) == (3, 5)


def test_suppression_is_k_anonymous_and_idempotent(spark, people):
    rel = suppress_below_k(people, ["zip", "age"], 2)
    names = {r["name"] for r in rel.collect()}
    # only the singleton ('02139','30-39') drops; NULL-zip group of 2 stays
    assert names == {"a", "b", "c", "d", "e", "g", "h"}
    audit = k_anonymity_audit(rel, ["zip", "age"], 2).collect()[0]
    assert audit["k_effective"] >= 2 and audit["n_violating_groups"] == 0
    again = suppress_below_k(rel, ["zip", "age"], 2)
    assert {r["name"] for r in again.collect()} == names


def test_privacy_empty_and_validation(spark):
    empty = spark.createDataFrame([], "zip string, age string, name string")
    row = k_anonymity_audit(empty, ["zip", "age"], 2).collect()[0]
    assert (
        row["n_groups"],
        row["n_rows"],
        row["n_violating_groups"],
        row["n_at_risk_rows"],
    ) == (0, 0, 0, 0)
    assert row["k_effective"] is None
    assert suppress_below_k(empty, ["zip", "age"], 2).count() == 0
    with pytest.raises(ValueError):
        k_anonymity_audit(empty, ["zip"], 0)
    with pytest.raises(ValueError):
        suppress_below_k(empty, ["zip"], 0)


def test_suppression_matches_python_model_grid(spark):
    """suppress_below_k output equals the python model (rows whose
    QI group size >= k) across a k grid on a fixture with NULLs and
    varied group sizes."""
    rows = [
        (f"r{i}", f"z{i % 3}" if i % 7 else None, f"a{i % 2}")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "name string, zip string, age string")
    from collections import Counter

    sizes = Counter((z, a) for _, z, a in rows)
    for k in (1, 2, 3, 5, 8):
        got = {
            r["name"]
            for r in suppress_below_k(df, ["zip", "age"], k).collect()
        }
        want = {n for n, z, a in rows if sizes[(z, a)] >= k}
        assert got == want, k


def test_group_sizes_audit_equals_rowlevel_suppression_path(spark):
    """The one-scan shortcut (audit the c >= k groups) must equal the
    row-level path (audit over suppress_below_k's actual output) —
    the equivalence the registered query's single-scan shape rests
    on (r9 review fix)."""
    from cdc_2025_spark.functions.privacy import (
        audit_group_sizes,
        k_anonymity_audit,
        suppress_below_k,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 1), ("b", 2), ("b", None),
         (None, 3), (None, 3), ("c", 4)],
        "qa string, qb int",
    )
    for k in (1, 2, 3, 5):
        g = df.groupBy("qa", "qb").count().withColumnRenamed("count", "c")
        fast = audit_group_sizes(
            g.filter(g["c"] >= k), k
        ).collect()[0]
        slow = k_anonymity_audit(
            suppress_below_k(df, ["qa", "qb"], k), ["qa", "qb"], k
        ).collect()[0]
        assert tuple(fast) == tuple(slow), (k, fast, slow)
