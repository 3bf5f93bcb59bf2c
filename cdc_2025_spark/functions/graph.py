"""Distributed PageRank (Brin & Page 1998; the Pregel/GraphX power
iteration) over a weighted edge frame.

Scale shape, per iteration: the rank vector joins onto the edge
frame keyed by source (BROADCAST when the vertex set is small — the
registered trade network has 25 nations; a web-scale vertex set
flips the same join to a key-shuffled hash join with identical
semantics), contributions aggregate per destination (map-side
partials), and dangling-node mass redistributes via one scalar
aggregate — nothing but the V-sized rank table leaves the plan.
Deterministic: uniform init, fixed damping and iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


DRIVER_MODE_MAX_V = 1000


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = "w",
    mode: str = "auto",
) -> DataFrame:
    """Weighted PageRank over ``edges`` (src, dst[, w]); returns
    (node, pagerank) for every node appearing as source or
    destination. Dangling nodes (no out-edges) spread their mass
    uniformly — the standard correction, applied as a scalar each
    round so ranks sum to 1 throughout.

    ``mode``: 'distributed' runs the per-iteration join+aggregate
    plan (the web-scale path); 'driver' collects the AGGREGATED
    transition table (≤ V² weights — V-bounded, never raw-edge-
    bounded) and power-iterates in plain Python — for small vertex
    sets the distributed path's cost is n_iter × fixed job overhead,
    which a 25-node graph cannot amortize; 'auto' (default) picks
    'driver' when V ≤ {DRIVER_MODE_MAX_V}. Cross-mode agreement at
    1e-9 is pinned in tests/test_graph.py."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown mode {mode!r}")
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"),
        w_col.alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pagerank", F.lit(0.0))
    if mode == "driver" or (mode == "auto" and n <= DRIVER_MODE_MAX_V):
        # V-bounded: collect the aggregated transition table and
        # iterate in python — identical update rule, no per-round job
        agg_e = (
            e.groupBy("src", "dst").agg(F.sum("w").alias("w")).collect()
        )
        triples = [(r["src"], r["dst"], r["w"]) for r in agg_e]
        names = sorted(r["node"] for r in nodes.collect())
        out_w_d: dict = {}
        for s_, _, w_ in triples:
            out_w_d[s_] = out_w_d.get(s_, 0.0) + w_
        r = {v: 1.0 / n for v in names}
        for _ in range(n_iter):
            contrib = {v: 0.0 for v in names}
            for s_, t_, w_ in triples:
                contrib[t_] += r[s_] * w_ / out_w_d[s_]
            dm = sum(r[v] for v in names if v not in out_w_d)
            r = {
                v: (1.0 - damping) / n
                + damping * (contrib[v] + dm / n)
                for v in names
            }
        node_t = nodes.schema["node"].dataType.simpleString()
        return edges.sparkSession.createDataFrame(
            [(v, r[v]) for v in names],
            f"node {node_t}, pagerank double",
        )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # edge transition probabilities are iteration-invariant
    trans = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .localCheckpoint(eager=False)
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("r"))
    for _ in range(n_iter):
        ranks = ranks.localCheckpoint(eager=False)
        contrib = (
            trans.join(
                F.broadcast(ranks.withColumnRenamed("node", "src")), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("p") * F.col("r")).alias("in_r"))
        )
        # dangling mass: rank held by nodes with no out-edges
        dangling = (
            ranks.join(
                out_w.withColumnRenamed("src", "node"), "node", "left_anti"
            )
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_r"), F.lit(0.0))
                        + F.col("dm") / n
                    )
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("pagerank"))


def triangle_stats(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Exact per-node triangle counts + local clustering coefficient
    over an undirected edge list (``id_a`` < ``id_b``, no duplicate
    edges) — the compact-forward / degree-orientation algorithm
    (Chiba & Nishizeki SICOMP'85; Suri & Vassilvitskii WWW'11 "the
    curse of the last reducer").

    Returns (node, degree, n_triangles, clustering_coeff) for every
    node with at least one edge; coefficient = 2·t / (d·(d-1)) for
    d ≥ 2, else 0.0 (unrounded — callers round for display parity).

    Scale shape: every edge is oriented from its LOWER-(degree, id)
    endpoint to its higher one, so each wedge is enumerated exactly
    once at its lowest-rank apex — per-node wedge fan-out is bounded
    by out-degree ≤ O(√m) instead of raw degree, which is what keeps
    a hub node (the "last reducer") from generating deg² wedge
    candidates. The plan is two self-joins of the oriented edge
    frame (wedge build on the apex key, then closure probe on the
    (v, w) pair key) — no cross product, all equi-joins, map-side
    partials on the final per-node count. Rank comparison uses a
    struct((degree, id)) total order in-plan; no global row_number
    (a no-partition window would single-thread the sort at scale).
    """
    a, b = F.col(id_a), F.col(id_b)
    # the edge frame feeds degree counting AND orientation, and the
    # oriented frame feeds three subtrees (both wedge legs + the
    # closure probe) — lazily localCheckpoint both so a potentially
    # expensive upstream pair computation executes once per action,
    # not once per reference (without this, an uncached similarity
    # join upstream re-runs up to 6x; measured 4.9 -> ~1 s at sf0.1)
    edges = pairs.select(a.alias("u"), b.alias("v")).localCheckpoint(
        eager=False
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    # attach each endpoint's degree, then orient low-rank -> high-rank
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    ranked = edges.join(du, "u").join(dv, "v")
    ku = F.struct(F.col("du").alias("d"), F.col("u").alias("i"))
    kv = F.struct(F.col("dv").alias("d"), F.col("v").alias("i"))
    oriented = ranked.select(
        F.when(ku < kv, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(ku < kv, F.col("v")).otherwise(F.col("u")).alias("d"),
        F.when(ku < kv, kv).otherwise(ku).alias("dk"),
    ).localCheckpoint(eager=False)
    e1 = oriented.select(
        F.col("s"), F.col("d").alias("w1"), F.col("dk").alias("k1")
    )
    e2 = oriented.select(
        F.col("s"), F.col("d").alias("w2"), F.col("dk").alias("k2")
    )
    # each wedge once: apex s, legs ordered by the same (deg, id) rank
    wedges = e1.join(e2, "s").filter(F.col("k1") < F.col("k2"))
    closing = oriented.select(
        F.col("s").alias("w1"), F.col("d").alias("w2")
    )
    tri = wedges.join(closing, ["w1", "w2"]).select("s", "w1", "w2")
    tri_nodes = (
        tri.select(F.explode(F.array("s", "w1", "w2")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return deg.join(tri_nodes, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
        F.when(
            F.col("degree") > 1,
            2.0
            * F.coalesce(F.col("n_triangles"), F.lit(0))
            / (F.col("degree") * (F.col("degree") - F.lit(1))),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering_coeff"),
    )


def bfs_hops(
    edges: DataFrame,
    source,
    src: str = "src",
    dst: str = "dst",
    max_iter: int | None = None,
) -> DataFrame:
    """(node, hop): minimum directed hop count from ``source`` over
    ``edges`` — breadth-first frontier expansion (the Pregel BFS /
    unit-weight Bellman-Ford). Unreachable nodes are absent; callers
    left-join the vertex set if they want NULL rows.

    Scale shape: each round is ONE equi-join of the current frontier
    against the edge frame plus an anti-join against the settled set
    — never a full-graph pass over already-settled nodes; rounds =
    graph diameter. Frontier and settled frames are lazily
    localCheckpoint'd every round so lineage stays FLAT (the classic
    iterative-plan failure is a lineage tree that doubles per round);
    the edge frame checkpoints once. The per-round .count() is the
    termination test — hop-bounded state, O(diameter) driver
    round-trips, same posture as connected_components
    (dedup/cluster.py)."""
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    spark = edges.sparkSession
    node_type = dict(e.dtypes)["s"]
    dist = spark.createDataFrame(
        [(source, 0)], f"node {node_type}, hop int"
    ).localCheckpoint(eager=False)
    frontier = dist
    limit = max_iter if max_iter is not None else 1 << 30
    rounds = 0
    while rounds < limit:
        rounds += 1
        nxt = (
            frontier.join(e, frontier["node"] == e["s"])
            .select(F.col("d").alias("node"), F.lit(rounds).alias("hop"))
            .distinct()
            .join(dist, "node", "anti")
            .localCheckpoint(eager=False)
        )
        if nxt.count() == 0:
            break
        dist = dist.unionAll(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return dist
