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
    df: DataFrame,
    id_col: str,
    block_keys: list[Column],
    max_block: int | None = None,
    snm_order: Column | None = None,
    snm_window: int = 10,
    keep_order: bool = False,
    distinct: bool = True,
    order_band: float | None = None,
) -> DataFrame:
    """Candidate id pairs (id_a < id_b) sharing at least one block
    key. NULL block-key values never form a block (a missing zip
    should not candidate-pair every other missing zip).

    Within-block pairing is QUADRATIC in block size, and fixed block
    keys do not get finer as the corpus grows (measured: a 10x
    customer replica grew the candidate set ~100x, 2M -> 192M pairs).
    ``max_block`` is the scale guard: blocks larger than it switch
    from full pairing to SORTED-NEIGHBORHOOD pairing (Hernández &
    Stolfo, SIGMOD'95) — members rank by (``snm_order``, id) inside
    the block and only ranks within ``snm_window`` of each other
    pair, so an oversized block contributes O(m * window) pairs
    instead of O(m²). Recall is exact for match gates monotone in
    the sort attribute whenever fewer than ``snm_window`` members
    separate a true pair in sort order — pick ``snm_order`` to be
    the attribute the gate thresholds (the classic SNM guidance);
    ties rank deterministically by id. SNM neighbors come from
    ``lead()`` over the SAME window that ranks the block — one
    exchange, no rank self-join.

    ``keep_order=True`` carries the ``snm_order`` attribute through
    as ``ord_a``/``ord_b`` so a gate that thresholds it (the usual
    SNM setup) can filter the pair stream directly instead of
    re-joining the entity table twice — at scale that removes two
    shuffles of the (far larger) pair stream. ``distinct=False``
    skips the final dedup exchange for consumers that tolerate
    duplicate pairs (a transitive-closure consumer does: duplicate
    edges never change connectivity) — dedup AFTER a selective gate
    is strictly cheaper than before it.

    ``max_block=None`` (default) keeps full pairing everywhere.

    ``order_band`` (requires ``snm_order``) prunes the SMALL-block
    quadratic self-join for gates that threshold the order attribute:
    rows join on (block key, floor(order / order_band)) with the
    right side fanned to its three adjacent bands, so a pair is
    emitted iff its band ids differ by at most 1 — a strict SUPERSET
    of every pair with ``|Δorder| <= order_band`` (|x-y| <= w implies
    |floor(x/w)-floor(y/w)| <= 1), each emitted exactly ONCE (the
    left row's single band matches at most one of the right row's
    three). Pairs whose orders differ by MORE than ``order_band`` may
    be omitted, and NULL-order rows never pair — callers must apply a
    gate at least as strict as ``|Δorder| <= order_band`` (a NULL
    order fails any such gate), which makes the post-gate match set
    identical to the unbanded kernel's while the join emits
    O(rows-per-band²) instead of O(block²) candidates. The oversized-
    block SNM branch is unaffected (already O(m·window))."""
    if not block_keys:
        raise ValueError("at least one blocking key is required")
    if max_block is not None and snm_order is None:
        raise ValueError(
            "max_block requires snm_order (the in-block sort "
            "attribute for sorted-neighborhood pairing)"
        )
    if max_block is not None and max_block < 2:
        raise ValueError(f"max_block must be >= 2, got {max_block}")
    if snm_window < 1:
        raise ValueError(f"snm_window must be >= 1, got {snm_window}")
    if keep_order and snm_order is None:
        raise ValueError(
            "keep_order requires snm_order (the attribute to carry)"
        )
    if order_band is not None and snm_order is None:
        raise ValueError(
            "order_band requires snm_order (the banded attribute)"
        )
    if order_band is not None and not order_band > 0:
        raise ValueError(f"order_band must be > 0, got {order_band}")
    pair_cols = ["id_a", "id_b"] + (
        ["ord_a", "ord_b"] if keep_order else []
    )
    # r16: when every blocking key shares one data type, ALL keys
    # ride ONE tagged frame — a single explode emits (key index,
    # block value) rows, so the size aggregate, the small-block
    # self-join and the SNM window each run ONCE partitioned by
    # (_kt, _bk) instead of once per key (two sequential
    # exchange+sort window stages collapse into one for the
    # two-key ER query; pair multisets are identical because the
    # key tag keeps blocks from different keys apart exactly as the
    # per-key loop did). Heterogeneous key types keep the per-key
    # loop — a common cast could merge distinct block values.
    key_types = df.select(
        *[k.alias(f"_bk{i}") for i, k in enumerate(block_keys)]
    ).schema
    fused = len({f.dataType for f in key_types.fields}) == 1
    groups: list[tuple[list, list[str]]]
    if fused:
        cols = [
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("_kt"), k.alias("_bk")
                        )
                        for i, k in enumerate(block_keys)
                    ]
                )
            ).alias("_k"),
            F.col(id_col).alias("_id"),
        ]
        if snm_order is not None:
            cols.append(snm_order.alias("_ord"))
        tagged = (
            df.select(*cols)
            .withColumn("_kt", F.col("_k._kt"))
            .withColumn("_bk", F.col("_k._bk"))
            .drop("_k")
            .filter(F.col("_bk").isNotNull())
        )
        groups = [(["_kt", "_bk"], tagged)]
    else:
        groups = []
        for key in block_keys:
            cols = [key.alias("_bk"), F.col(id_col).alias("_id")]
            if snm_order is not None:
                cols.append(snm_order.alias("_ord"))
            groups.append(
                (
                    ["_bk"],
                    df.select(*cols).filter(F.col("_bk").isNotNull()),
                )
            )
    out = None
    for gb, keyed in groups:
        if max_block is not None:
            sizes = keyed.groupBy(*gb).agg(
                F.count("*").alias("_bs")
            )
            keyed = keyed.join(sizes, gb)
            small = keyed.filter(F.col("_bs") <= max_block)
            big = keyed.filter(F.col("_bs") > max_block)
        else:
            small, big = keyed, None
        a_cols = [*[F.col(g) for g in gb], F.col("_id").alias("id_a")]
        b_cols = [*[F.col(g) for g in gb], F.col("_id").alias("id_b")]
        if keep_order:
            a_cols.append(F.col("_ord").alias("ord_a"))
            b_cols.append(F.col("_ord").alias("ord_b"))
        if order_band is not None:
            band = F.floor(F.col("_ord") / F.lit(float(order_band)))
            a_side = small.select(*a_cols, band.alias("_band"))
            b_side = small.select(
                *b_cols,
                F.explode(
                    F.array(band - 1, band, band + 1)
                ).alias("_band"),
            )
            pairs = (
                a_side.join(b_side, [*gb, "_band"])
                .filter(F.col("id_a") < F.col("id_b"))
                .select(*pair_cols)
            )
        else:
            pairs = (
                small.select(*a_cols)
                .join(small.select(*b_cols), gb)
                .filter(F.col("id_a") < F.col("id_b"))
                .select(*pair_cols)
            )
        if big is not None:
            # neighbors within the SNM window via lead() over the
            # SAME (block, order, id) window — the rank and all its
            # forward neighbors come out of one exchange
            wspec = Window.partitionBy(*gb).orderBy("_ord", "_id")
            nbrs = F.array(
                *[
                    F.struct(
                        F.lead("_id", o).over(wspec).alias("nid"),
                        F.lead("_ord", o).over(wspec).alias("nord"),
                    )
                    for o in range(1, snm_window + 1)
                ]
            )
            exploded = (
                big.select("_id", "_ord", nbrs.alias("_nbrs"))
                .select(
                    "_id", "_ord", F.explode("_nbrs").alias("_n")
                )
                .filter(F.col("_n.nid").isNotNull())
            )
            swap = F.col("_id") <= F.col("_n.nid")
            snm_cols = [
                F.least("_id", F.col("_n.nid")).alias("id_a"),
                F.greatest("_id", F.col("_n.nid")).alias("id_b"),
            ]
            if keep_order:
                snm_cols += [
                    F.when(swap, F.col("_ord"))
                    .otherwise(F.col("_n.nord"))
                    .alias("ord_a"),
                    F.when(swap, F.col("_n.nord"))
                    .otherwise(F.col("_ord"))
                    .alias("ord_b"),
                ]
            snm = (
                exploded.select(*snm_cols)
                .filter(F.col("id_a") < F.col("id_b"))
            )
            pairs = pairs.unionByName(snm)
        out = pairs if out is None else out.unionByName(pairs)
    return out.distinct() if distinct else out


_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def golden_records(
    df: DataFrame,
    id_col: str,
    match_pairs: DataFrame,
    order_by: list[Column],
    cc_fallback: str = "label_prop",
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
    to the lexicographic min id); integral ids skip it entirely.

    ``cc_fallback``: the over-budget closure algorithm (see
    connected_components) — pass ``star`` when the match graph can
    contain long chains (sorted-neighborhood candidates chained
    along the sort attribute), where label propagation's
    O(diameter) rounds explode."""
    for c in ("comp", "cluster_id", "is_golden", "_nid", "_comp_nid"):
        if c in df.columns:
            raise ValueError(
                f"input already has a {c!r} column; rename it before "
                "golden_records"
            )
    if dict(df.dtypes)[id_col] in _INTEGRAL:
        comp = connected_components(match_pairs, fallback=cc_fallback)
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
        comp = connected_components(np_, fallback=cc_fallback)
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
