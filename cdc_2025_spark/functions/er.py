"""Entity resolution: blocking → similarity gate → clusters → golden
records.

The classic record-linkage pipeline (Fellegi & Sunter JASA'69 for the
match/non-match framing; blocking + transitive closure + survivorship
is the standard MDM recipe, e.g. Christen, "Data Matching", 2012):

1. BLOCKING: candidate pairs only within shared block keys (name
   prefix, zip, phonetic code, ...) — the step that replaces the
   O(n²) all-pairs comparison with a union of per-block self-joins.
   Multiple keys union'd: a pair is a candidate if it shares ANY key
   (recall stacks across keys; each key's fan-out is bounded by its
   block sizes — skewed blocks are the knob to watch, same reasoning
   as `stats_join_skew_advisor`).
2. GATE: a caller-supplied match condition on the candidate pair
   (edit distance, exact fields, model score — the engine does not
   pick the matcher).
3. CLUSTERS: transitive closure over surviving match edges — reuses
   `dedup.cluster.connected_components` (min-id labels,
   driver-budget fast path + label-propagation scale path).
4. GOLDEN RECORD: one survivor per cluster by a deterministic
   ordering (completeness, recency, id — caller's `order_by`), the
   survivorship rule; every row keeps its cluster id and survivor
   flag so the merge is auditable.

Scale shape: each blocking key contributes one key-grouped self-join
(never a cross product — pinned in tests); the gate runs on the
candidate-pair frame only; closure touches id-pairs (8-byte columns);
survivorship is one window per cluster. At 100 TB the whole pipeline
shuffles ids and block keys, never full records, until the final
label join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cdc_2025_spark.dedup.cluster import connected_components


def blocked_candidate_pairs(
    df: DataFrame, id_col: str, block_keys: list[Column]
) -> DataFrame:
    """Distinct candidate id pairs (id_a < id_b) sharing at least one
    block key. NULL block-key values never form a block (a missing
    zip should not candidate-pair every other missing zip)."""
    if not block_keys:
        raise ValueError("at least one blocking key is required")
    out = None
    for i, key in enumerate(block_keys):
        keyed = df.select(
            key.alias("_bk"), F.col(id_col).alias("_id")
        ).filter(F.col("_bk").isNotNull())
        a = keyed.select(F.col("_bk"), F.col("_id").alias("id_a"))
        b = keyed.select(F.col("_bk"), F.col("_id").alias("id_b"))
        pairs = (
            a.join(b, "_bk")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        out = pairs if out is None else out.unionByName(pairs)
    return out.distinct()


_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def golden_records(
    df: DataFrame,
    id_col: str,
    match_pairs: DataFrame,
    order_by: list[Column],
) -> DataFrame:
    """Attach (cluster_id, is_golden) to every row: cluster_id is the
    min id of the row's match-component (singletons cluster with
    themselves), is_golden marks the per-cluster survivor under
    ``order_by`` (ties broken by id — fully deterministic).

    Non-integral ids (UUIDs, natural keys) are supported via an
    internal dense-long mapping — `connected_components` requires
    long vertices, and casting a string id would throw under ANSI
    (or, worse, NULL out every vertex with ANSI off and silently
    make every row a singleton). The mapping sorts the DISTINCT ids
    once (row_number — preserves order, so min-mapped-id round-trips
    to the lexicographic min id); integral ids skip it entirely."""
    for c in ("comp", "cluster_id", "is_golden", "_nid", "_comp_nid"):
        if c in df.columns:
            raise ValueError(
                f"input already has a {c!r} column; rename it before "
                "golden_records"
            )
    if dict(df.dtypes)[id_col] in _INTEGRAL:
        comp = connected_components(match_pairs)
        labeled = df.join(
            comp.withColumnRenamed("id", id_col),
            id_col,
            "left",
        ).withColumn(
            "cluster_id", F.coalesce("comp", F.col(id_col))
        ).drop("comp")
    else:
        ids = (
            df.select(F.col(id_col).alias("_oid"))
            .distinct()
            .withColumn(
                "_nid",
                F.row_number().over(Window.orderBy("_oid")),
            )
        )
        np_ = (
            match_pairs.join(
                ids.select(
                    F.col("_oid").alias("id_a"),
                    F.col("_nid").alias("na"),
                ),
                "id_a",
            )
            .join(
                ids.select(
                    F.col("_oid").alias("id_b"),
                    F.col("_nid").alias("nb"),
                ),
                "id_b",
            )
            .select(F.col("na").alias("id_a"), F.col("nb").alias("id_b"))
        )
        comp = connected_components(np_)
        # map component label (min _nid) back to its original id
        back = comp.join(
            ids.withColumnRenamed("_nid", "comp"), "comp"
        ).select(
            F.col("id").alias("_nid"),
            F.col("_oid").alias("_comp_oid"),
        )
        labeled = (
            df.join(
                ids.withColumnRenamed("_oid", id_col), id_col, "left"
            )
            .join(back, "_nid", "left")
            .withColumn(
                "cluster_id",
                F.coalesce("_comp_oid", F.col(id_col)),
            )
            .drop("_nid", "_comp_oid")
        )
    w = Window.partitionBy("cluster_id").orderBy(
        *order_by, F.col(id_col)
    )
    return labeled.withColumn(
        "is_golden", F.row_number().over(w) == 1
    )
