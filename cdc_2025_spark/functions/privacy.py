"""k-anonymity audit + suppression over quasi-identifier columns.

A release is k-anonymous over a quasi-identifier (QI) tuple when every
distinct QI combination covers at least k rows (Sweeney, IJUFKS 2002;
Samarati & Sweeney 1998) — smaller groups are re-identification risk.
For a training corpus the audit answers "which metadata granularities
leak individuals" and suppression is the standard mitigation: drop
rows whose QI group is smaller than k (cell generalization is the
other lever; out of scope here — the audit tells you when you need
it).

Scale shape: the audit is ONE grouped count over the QI columns
(map-side partials, ≤ |QI-combinations| rows shuffled) folded into a
single summary row; suppression is the same grouped count semi-joined
back on the QI key — at 100 TB each costs one scan plus a
key-cardinality-bounded exchange, and AQE broadcasts the surviving
key set when it fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """One-row summary of the QI group-size distribution: group and
    row totals, how many groups/rows fall below ``k`` (the at-risk
    mass suppression would drop), and ``k_effective`` — the smallest
    group size, i.e. the k the release actually provides. NULL QI
    values form groups like any other value (a NULL zip code still
    distinguishes rows grouped with non-NULL ones)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    g = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count("*").alias("c")
    )
    return audit_group_sizes(g, k)


def audit_group_sizes(g: DataFrame, k: int) -> DataFrame:
    """The audit fold over an ALREADY-GROUPED (QI..., c) frame — the
    shareable half of :func:`k_anonymity_audit`. Callers holding the
    grouped count can derive several audits from one scan: the
    post-suppression audit is exactly this fold over
    ``g.filter(c >= k)`` because suppression never changes a
    surviving group's size (the idempotence contract)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    viol = F.col("c") < k
    return g.agg(
        F.count("*").alias("n_groups"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_rows"),
        F.coalesce(F.sum(viol.cast("long")), F.lit(0))
        .cast("long")
        .alias("n_violating_groups"),
        F.coalesce(F.sum(F.when(viol, F.col("c"))), F.lit(0))
        .cast("long")
        .alias("n_at_risk_rows"),
        F.min("c").cast("long").alias("k_effective"),
    )


def suppress_below_k(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """The k-anonymous release: rows whose QI group has >= k members
    (suppression). Idempotent — surviving groups keep their full
    size, so a second pass drops nothing. Columns and row contents
    pass through unchanged; uses a null-safe semi-join so NULL QI
    groups follow the same rule as the audit counts them."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keep = (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= k)
        .select(*quasi_cols)
    )
    cond = [df[c].eqNullSafe(keep[c]) for c in quasi_cols]
    return df.join(keep, cond, "left_semi")
