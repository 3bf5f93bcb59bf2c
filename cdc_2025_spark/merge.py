"""Batch MERGE INTO — the lakehouse upsert statement (Delta Lake /
Iceberg MERGE semantics, ANSI SQL:2003 MERGE) expressed as ONE
declarative full-outer join over plain DataFrames:

- target rows with no source match          -> unchanged
- matched + delete condition                -> removed
- matched + update condition (else-branch)  -> SET clauses applied
- matched, neither condition                -> unchanged
- source rows with no target match          -> inserted (optional
  condition; Delta's WHEN NOT MATCHED THEN INSERT)
- >1 source row matching one target key     -> ValueError (the same
  cardinality violation Delta raises — a nondeterministic merge is
  an error, not a silent pick)

Column convention inside conditions / SET / INSERT expressions:
target payload columns are visible as ``t_<name>``, source payload
columns as ``s_<name>``, key columns by their own names. The result
carries the TARGET schema.

Scale shape: the cardinality check is one aggregate; the merge is a
single key-shuffled full-outer join (AQE sizes it; a broadcast hint
on a small source side collapses it further) with every clause a
codegen'd CASE — this is how engines execute MERGE minus the
file-level pruning layer (which `layout.zorder/compact` covers for
the storage side). Pair with `streaming.cdc._swap_store` for the
crash-safe on-disk swap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    *,
    update_set: dict[str, Column] | None = None,
    update_condition: Column | None = None,
    delete_condition: Column | None = None,
    insert: bool = True,
    insert_values: dict[str, Column] | None = None,
    insert_condition: Column | None = None,
) -> DataFrame:
    """Delta-style MERGE: returns the post-merge frame with the
    target's schema. See module docstring for clause semantics and
    the ``t_<col>`` / ``s_<col>`` naming convention inside the
    condition / SET / INSERT expressions."""
    dup = (
        source.groupBy(*on)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            "merge_into: multiple source rows match one target key "
            f"(first duplicate key: {[dup[0][k] for k in on]}) — "
            "deduplicate the source first (Delta raises the same)"
        )
    t_payload = [c for c in target.columns if c not in on]
    s_payload = [c for c in source.columns if c not in on]
    t = target.select(
        *on,
        F.lit(True).alias("_t_present"),
        *[F.col(c).alias(f"t_{c}") for c in t_payload],
    )
    s = source.select(
        *on,
        F.lit(True).alias("_s_present"),
        *[F.col(c).alias(f"s_{c}") for c in s_payload],
    )
    j = t.join(s, on, "full_outer")
    matched = F.coalesce(F.col("_t_present"), F.lit(False)) & F.coalesce(
        F.col("_s_present"), F.lit(False)
    )
    t_only = F.coalesce(F.col("_t_present"), F.lit(False)) & ~F.coalesce(
        F.col("_s_present"), F.lit(False)
    )
    s_only = ~F.coalesce(F.col("_t_present"), F.lit(False)) & F.coalesce(
        F.col("_s_present"), F.lit(False)
    )
    # Clause conditions over nullable columns can evaluate to NULL;
    # Delta treats that as "clause not satisfied" (row unchanged),
    # but a raw NULL would three-valued-logic its way through `keep`
    # and filter() would silently DROP the row — coalesce to each
    # clause's neutral value first.
    upd_cond = (
        F.coalesce(update_condition, F.lit(False))
        if update_condition is not None
        else F.lit(True)
    )
    del_cond = (
        F.coalesce(delete_condition, F.lit(False))
        if delete_condition is not None
        else F.lit(False)
    )
    ins_cond = (
        F.coalesce(insert_condition, F.lit(False))
        if insert_condition is not None
        else F.lit(True)
    )
    keep = (
        t_only
        | (matched & ~del_cond)
        | (s_only & F.lit(insert) & ins_cond)
    )
    update_set = update_set or {}
    insert_values = insert_values or {}
    out_cols = list(on)
    for c in t_payload:
        upd = update_set.get(c, F.col(f"t_{c}"))
        ins = insert_values.get(
            c,
            F.col(f"s_{c}") if c in s_payload else F.lit(None),
        )
        out_cols.append(
            F.when(matched & ~del_cond & upd_cond, upd)
            .when(s_only, ins)
            .otherwise(F.col(f"t_{c}"))
            .alias(c)
        )
    return j.filter(keep).select(*out_cols)
