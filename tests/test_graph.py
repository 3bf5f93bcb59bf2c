"""PageRank: exact agreement with a pure-python power-iteration
model, probability-mass invariants, fixpoints on literal graphs,
dangling-node handling, and guards."""

from __future__ import annotations

import pytest

from cdc_2025_spark.functions.graph import pagerank


def _python_pagerank(edges, n_iter=10, d=0.85):
    """(src, dst, w) triples -> {node: rank}, same dangling rule."""
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    n = len(nodes)
    out_w: dict = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0.0) + w
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0.0 for v in nodes}
        for s, t, w in edges:
            contrib[t] += r[s] * w / out_w[s]
        dm = sum(r[v] for v in nodes if v not in out_w)
        r = {
            v: (1 - d) / n + d * (contrib[v] + dm / n) for v in nodes
        }
    return r


def _collect(df):
    return {r["node"]: r["pagerank"] for r in df.collect()}


def test_matches_python_model_on_fixture_graph(spark, sf_dir):
    from cdc_2025_spark.queries.graph import trade_edges

    e = trade_edges(spark, sf_dir)
    triples = [(r["src"], r["dst"], r["w"]) for r in e.collect()]
    got = _collect(pagerank(e))
    want = _python_pagerank(triples)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert all(x > 0 for x in got.values())


def test_symmetric_cycle_is_uniform_fixpoint(spark):
    e = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    got = _collect(pagerank(e, n_iter=7))
    for v in got.values():
        assert v == pytest.approx(1 / 3, abs=1e-12)


def test_dangling_node_mass_redistributes(spark):
    # b has no out-edges: its mass spreads uniformly; ranks still
    # sum to 1 and the sink outranks the source
    e = spark.createDataFrame(
        [("a", "b", 1.0)], "src string, dst string, w double"
    )
    got = _collect(pagerank(e, n_iter=10))
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    assert got["b"] > got["a"] > 0
    want = _python_pagerank([("a", "b", 1.0)])
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_weights_shift_rank(spark):
    # c receives 3x the weight b does from a — c must outrank b
    e = spark.createDataFrame(
        [("a", "b", 1.0), ("a", "c", 3.0), ("b", "a", 1.0),
         ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    got = _collect(pagerank(e, n_iter=12))
    assert got["c"] > got["b"]


def test_registered_query_shape(spark, sf_dir):
    from cdc_2025_spark.queries.graph import graph_pagerank_trade_network

    rows = graph_pagerank_trade_network(spark, sf_dir).collect()
    assert len(rows) == 25  # all nations trade at sf0.001+
    assert sorted(r["rk"] for r in rows) == list(range(1, 26))
    assert abs(sum(r["pagerank"] for r in rows) - 1.0) < 25 * 5e-5


def test_guards_and_empty(spark):
    e = spark.createDataFrame([], "src string, dst string, w double")
    assert pagerank(e).count() == 0
    one = spark.createDataFrame(
        [("a", "b", 1.0)], "src string, dst string, w double"
    )
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(one, n_iter=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(one, damping=1.5)


def test_driver_and_distributed_modes_agree(spark, sf_dir):
    """The small-V driver iterate and the per-iteration distributed
    plan implement the same update — agreement at 1e-9 on the
    fixture trade network (the cross-backend pin that licenses the
    auto-mode switch)."""
    from cdc_2025_spark.queries.graph import trade_edges

    e = trade_edges(spark, sf_dir).localCheckpoint()
    a = _collect(pagerank(e, mode="driver"))
    b = _collect(pagerank(e, mode="distributed"))
    assert set(a) == set(b)
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-9)


def test_mode_guard(spark):
    one = spark.createDataFrame(
        [("a", "b", 1.0)], "src string, dst string, w double"
    )
    with pytest.raises(ValueError, match="mode"):
        pagerank(one, mode="banana")


# ---------------------------------------------------------------- triangles


def _tri_rows(spark, edges):
    from cdc_2025_spark.functions.graph import triangle_stats

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering_coeff"])
        for r in triangle_stats(df).collect()
    }


def test_triangle_k4_counts(spark):
    """K4: every node has degree 3 and sits in C(3,2)=3 triangles,
    coefficient exactly 1.0; total triangles = 4."""
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    got = _tri_rows(spark, k4)
    assert got == {v: (3, 3, 1.0) for v in range(1, 5)}


def test_triangle_chain_has_none(spark):
    """A path graph has zero triangles and zero coefficients."""
    got = _tri_rows(spark, [(1, 2), (2, 3), (3, 4)])
    assert {v: t[1] for v, t in got.items()} == {1: 0, 2: 0, 3: 0, 4: 0}
    assert all(t[2] == 0.0 for t in got.values())


def test_triangle_hub_with_one_closure(spark):
    """Hub 1 connects to 2..6; only edge (2,3) closes a triangle.
    Pins the degree-oriented enumeration against the textbook
    counts: hub degree 5, one triangle at nodes {1,2,3}, hub
    coefficient 2*1/(5*4) = 0.1 — and pins that orientation away
    from the hub (its (degree,id) rank is highest) found the
    triangle regardless."""
    edges = [(1, v) for v in range(2, 7)] + [(2, 3)]
    got = _tri_rows(spark, edges)
    assert got[1] == (5, 1, pytest.approx(0.1))
    assert got[2] == (2, 1, pytest.approx(1.0))
    assert got[3] == (2, 1, pytest.approx(1.0))
    assert got[4][1] == 0 and got[5][1] == 0 and got[6][1] == 0


# ---------------------------------------------------------------- BFS hops


def _bfs_model(edges, source):
    from collections import deque

    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {source: 0}
    q = deque([source])
    while q:
        u = q.popleft()
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_bfs_literal_graphs_match_model(spark):
    """Chain with a shortcut (shorter path must win), a cycle back
    edge, and an unreachable node (absent from the result)."""
    from cdc_2025_spark.functions.graph import bfs_hops

    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"),  # shortcut a->c
        ("d", "a"),                                       # cycle
        ("z1", "z2"),                                     # unreachable
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["hop"] for r in bfs_hops(df, "a").collect()}
    assert got == _bfs_model(edges, "a")
    assert "z1" not in got and "z2" not in got
    assert got["c"] == 1  # the shortcut won over a->b->c


def test_bfs_max_iter_truncates(spark):
    from cdc_2025_spark.functions.graph import bfs_hops

    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["hop"] for r in bfs_hops(df, "a", max_iter=1).collect()}
    assert got == {"a": 0, "b": 1}


def test_bfs_registered_query_matches_model(spark, sf_dir):
    from cdc_2025_spark.queries.graph import (
        BFS_SOURCE,
        graph_bfs_trade_hops,
        trade_edges,
    )

    got = {
        r["n_name"]: r["hop"]
        for r in graph_bfs_trade_hops(spark, sf_dir).collect()
    }
    edges = [
        (r["src"], r["dst"]) for r in trade_edges(spark, sf_dir).collect()
    ]
    want = _bfs_model(edges, BFS_SOURCE)
    for n, h in got.items():
        assert h == want.get(n), (n, h, want.get(n))
    assert got[BFS_SOURCE] == 0
