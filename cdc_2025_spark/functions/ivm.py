"""Incremental view maintenance (IVM) for grouped aggregates under
CDC deltas — the classic delta-propagation result (Gupta, Mumick &
Subrahmanian SIGMOD'93; Blakeley et al. SIGMOD'86): COUNT / SUM /
mean / variance are ABELIAN-GROUP aggregates, so a change batch of
inserts, updates, and deletes refreshes a grouped dashboard view in
O(|delta|) — subtract the old contribution, add the new one — with
NO rescan of the fact table. At 100 TB this is the difference
between a per-batch full aggregation (re-shuffling the corpus) and
one tiny delta aggregation merged into the standing state.

State per group is the sufficient-statistics triple (n, sum, sum of
squares) — the same mergeable-moments representation the k-means /
PCA / moments family uses — from which count / sum / mean /
variance / stddev read out in closed form. Deletes retract with
NEGATED contributions; updates retract the OLD value and add the
NEW in one row. A group whose count reaches zero leaves the state
entirely (so a later insert recreates it cleanly, and the view
never carries 0/0 rows).

Floating-point honesty: counts are integer-exact forever; sums drift
by accumulated cancellation at ~1e-12 relative per retraction chain,
which is why the tests compare against full recompute with a
tolerance (and why a production deployment periodically re-bases the
state from the fact table — the documented compaction analog).

Reference surface: the reference repo recomputes its pandas
aggregates from scratch on every run (resilience.py) — this is the
operator that makes the same dashboards refreshable at lake scale.

Scale shape: ``apply_delta`` is ONE groupBy over the delta batch
(map-side partial, |delta| rows in), ONE key-equi outer merge with
the bounded state frame, zero fact-table access. Works identically
under streaming ``foreachBatch`` — each microbatch is a delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# change-row operation codes
OP_INSERT = "I"
OP_DELETE = "D"
OP_UPDATE = "U"

_STATE_COLS = ("ivm_n", "ivm_sum", "ivm_sumsq")


def agg_state(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """Build the standing state from a full scan (the one-time
    base-lining pass, or a periodic re-base): per-key
    (ivm_n, ivm_sum, ivm_sumsq) over non-NULL values."""
    v = F.col(value)
    return (
        df.filter(v.isNotNull())
        .groupBy(*keys)
        .agg(
            F.count("*").cast("long").alias("ivm_n"),
            F.sum(v).alias("ivm_sum"),
            F.sum(v * v).alias("ivm_sumsq"),
        )
    )


def delta_contributions(
    delta: DataFrame,
    keys: list[str],
    op_col: str = "op",
    old_col: str = "old_value",
    new_col: str = "new_value",
) -> DataFrame:
    """Collapse a CDC delta batch into per-key signed contribution
    triples. Delta rows carry ``op`` in {'I','U','D'}: inserts
    contribute +new, deletes -old, updates -old +new. NULL values
    contribute nothing on their side (matching agg_state's NULL
    exclusion). Rows with any other op code are counted into
    ``ivm_bad_ops`` so ``apply_delta`` can refuse the batch loudly
    instead of absorbing a malformed change as a no-op."""
    op = F.col(op_col)
    new_v, old_v = F.col(new_col), F.col(old_col)
    add = F.when(op.isin(OP_INSERT, OP_UPDATE), new_v)
    sub = F.when(op.isin(OP_DELETE, OP_UPDATE), old_v)
    n_add = F.when(add.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    n_sub = F.when(sub.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    return delta.groupBy(*keys).agg(
        F.sum(n_add - n_sub).cast("long").alias("ivm_n"),
        F.sum(
            F.coalesce(add, F.lit(0.0)) - F.coalesce(sub, F.lit(0.0))
        ).alias("ivm_sum"),
        F.sum(
            F.coalesce(add * add, F.lit(0.0))
            - F.coalesce(sub * sub, F.lit(0.0))
        ).alias("ivm_sumsq"),
        F.sum(
            (~op.isin(OP_INSERT, OP_UPDATE, OP_DELETE)).cast("long")
        ).alias("ivm_bad_ops"),
    )


def apply_delta(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    op_col: str = "op",
    old_col: str = "old_value",
    new_col: str = "new_value",
) -> DataFrame:
    """state + delta -> new state: one delta groupBy, one key-equi
    full-outer merge, groups at n == 0 dropped. Raises ValueError if
    the delta carries an unknown op code, and raises at evaluation
    time if any merged group count goes NEGATIVE (a delta that
    retracts rows never present in the state — an over-retraction
    silently diverges from recompute, so it must fail loud like the
    bad-op check does; the guard is an in-plan raise_error, not an
    extra per-batch action)."""
    # materialize the delta aggregation ONCE: the bad-op check below
    # is an action, and without the checkpoint the same groupBy would
    # re-execute inside the returned plan — doubling the per-batch
    # cost of the function whose point is O(|delta|) refresh
    contrib = delta_contributions(
        delta, keys, op_col=op_col, old_col=old_col, new_col=new_col
    ).localCheckpoint()
    bad = contrib.agg(F.sum("ivm_bad_ops").alias("b")).collect()[0]["b"]
    if bad:
        raise ValueError(
            f"delta batch carries {bad} rows with op not in "
            f"('{OP_INSERT}', '{OP_UPDATE}', '{OP_DELETE}')"
        )
    c = contrib.drop("ivm_bad_ops")
    # NULL-SAFE key join: groupBy keeps a NULL key as one group, so
    # the merge must match it too (a plain `on=keys` join would
    # leave the NULL group as two separate rows and silently break
    # incremental == recompute)
    cond = None
    for k in keys:
        term = F.col(f"s.{k}").eqNullSafe(F.col(f"c.{k}"))
        cond = term if cond is None else cond & term
    merged = state.alias("s").join(
        c.alias("c"), on=cond, how="full_outer"
    )
    out_cols = [
        F.coalesce(F.col(f"s.{k}"), F.col(f"c.{k}")).alias(k)
        for k in keys
    ]
    for col in _STATE_COLS:
        out_cols.append(
            (
                F.coalesce(F.col(f"s.{col}"), F.lit(0))
                + F.coalesce(F.col(f"c.{col}"), F.lit(0))
            ).alias(col)
        )
    # the filter doubles as the over-retraction tripwire: evaluated
    # for every merged row, so a negative count can never be pruned
    # away silently (a bare guard column would fall to Catalyst's
    # column pruning and never run)
    return merged.select(*out_cols).filter(
        F.when(
            F.col("ivm_n") < 0,
            F.raise_error(
                F.concat(
                    F.lit(
                        "IVM over-retraction: merged ivm_n = "
                    ),
                    F.col("ivm_n").cast("string"),
                    F.lit(
                        " < 0 — the delta retracts rows never "
                        "present in the state"
                    ),
                )
            ).cast("boolean"),
        ).otherwise(F.col("ivm_n") > 0)
    )


def readout(state: DataFrame, keys: list[str]) -> DataFrame:
    """The dashboard view over the state: count / sum / mean /
    sample variance / stddev per key, in closed form from the
    sufficient statistics (variance = (sumsq - sum^2/n)/(n-1),
    NULL when n < 2 — the var_samp convention)."""
    n = F.col("ivm_n")
    s = F.col("ivm_sum")
    s2 = F.col("ivm_sumsq")
    # clamp at zero: retraction chains can cancel to a slightly
    # negative variance, which would read out as NaN, not drift
    var = F.when(
        n >= 2, F.greatest((s2 - s * s / n) / (n - 1), F.lit(0.0))
    )
    return state.select(
        *keys,
        n.alias("n"),
        s.alias("total"),
        (s / n).alias("mean"),
        var.alias("var_samp"),
        F.sqrt(var).alias("stddev_samp"),
    )
