"""Exact deduplication: hash-groupBy on a content key.

The canonical-survivor rule is min(id) per key — deterministic and
order-insensitive, unlike dropDuplicates() whose survivor depends on
partition layout.

Scale: one shuffle on the 128-bit content hash; hashes distribute
uniformly so there is no skew by construction. At 100 TB dedup this is
the cheapest possible shape (the hash is computed map-side during the
scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_key(text: Column | str, normalize: bool = True) -> Column:
    """md5 of the (optionally whitespace/case-normalized) text."""
    col = F.col(text) if isinstance(text, str) else text
    if normalize:
        col = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(col)


def vocab_key(text: Column | str) -> Column:
    """Bag-of-words-insensitive key: md5 of the sorted distinct token
    set. Collapses word-order permutations of the same vocabulary —
    a cheap near-dup canonicalization."""
    col = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.trim(F.lower(col)), r"\s+")
    return F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))


def exact_dup_groups(
    df: DataFrame, id_col: str, key: Column
) -> DataFrame:
    """One row per content key: group size + canonical (min) id."""
    return (
        df.select(F.col(id_col), key.alias("content_key"))
        .groupBy("content_key")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, key: Column) -> DataFrame:
    """Keep exactly the canonical (min-id) row per content key.

    Implemented as min_by over the full row struct — one aggregation,
    no join-back.
    """
    others = [c for c in df.columns]
    keyed = df.withColumn("_ck", key)
    picked = keyed.groupBy("_ck").agg(
        F.min_by(F.struct(*others), F.col(id_col)).alias("_row")
    )
    return picked.select("_row.*")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    key: Column,
) -> DataFrame:
    """Corpus snapshot diff: per-id verdict ('added' / 'removed' /
    'changed' / 'unchanged') between two corpus versions, compared on
    a content key — the accounting step of incremental ingest (what
    actually changed since the last run drives which documents
    re-enter the dedup/quality pipeline).

    Scale: the content key is computed map-side during each scan;
    the single shuffle is the id-keyed full-outer join (both sides
    hash-partition on the id — co-partitioned under AQE; zero skew on
    unique ids). Verdict classification is a map-side CASE on the
    joined row. Returns (id, status, old_key, new_key).
    """
    o = old.select(
        F.col(id_col).alias("_id"), key.alias("old_key")
    )
    n = new.select(
        F.col(id_col).alias("_id"), key.alias("new_key")
    )
    j = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("old_key").isNull(), "added")
        .when(F.col("new_key").isNull(), "removed")
        .when(F.col("old_key") != F.col("new_key"), "changed")
        .otherwise("unchanged")
    )
    return j.select(
        F.col("_id").alias(id_col),
        status.alias("status"),
        "old_key",
        "new_key",
    )
