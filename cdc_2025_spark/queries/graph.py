"""Graph analytics over the star schema: PageRank on the
nation-to-nation trade network (connected components live in
dedup/cluster.py — this module adds the second iterative-graph
family member)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_2025_spark.io import read_table
from cdc_2025_spark.queries.registry import query

PR_ITERS = 10
PR_DAMPING = 0.85


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, w): customer-nation -> supplier-nation edges, one
    unit of weight per lineitem — the demand-flow graph. Dim chains
    (customer, supplier, nation) broadcast into the two fact scans;
    the only big shuffle is lineitem ⋈ orders on the order key."""
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    cust_nation = F.broadcast(
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        ).select(
            "c_custkey", F.col("n_name").alias("src")
        )
    )
    supp_nation = F.broadcast(
        supplier.join(
            F.broadcast(nation),
            supplier.s_nationkey == nation.n_nationkey,
        ).select("s_suppkey", F.col("n_name").alias("dst"))
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(cust_nation, orders.o_custkey == cust_nation.c_custkey)
        .join(supp_nation, lineitem.l_suppkey == supp_nation.s_suppkey)
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
    )


@query("graph_pagerank_trade_network")
def graph_pagerank_trade_network(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PageRank over the nation trade network — which nations sit at
    the center of demand flow (the classic graph-centrality rollup a
    supply-chain or link-graph pipeline runs; Brin & Page 1998,
    executed as the Pregel/GraphX power iteration).

    rows-only by design: 10 data-dependent power iterations have no
    reasonable SQL twin. Accuracy pinned in tests/test_graph.py:
    exact 4dp equality against a pure-python power-iteration model
    (same damping, dangling correction, and iteration count), ranks
    sum to 1 every iteration, and uniform-rank fixpoint on a
    symmetric literal graph.

    Shape: edge construction is the star-schema join (dims
    broadcast, one fact-fact shuffle); the 25-node transition table
    is iteration-invariant (localCheckpoint'd once); each iteration
    is one broadcast join of the V-sized rank table + one
    destination-keyed aggregate + a scalar dangling-mass aggregate.
    At web scale the same plan swaps the broadcast for a
    key-shuffled join — semantics unchanged (noted in
    functions/graph.py)."""
    from cdc_2025_spark.functions.graph import pagerank

    pr = pagerank(
        trade_edges(spark, sf_dir), n_iter=PR_ITERS, damping=PR_DAMPING
    )
    return (
        pr.select(
            F.col("node").alias("n_name"),
            F.round("pagerank", 4).alias("pagerank"),
        )
        .withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.col("pagerank").desc(), "n_name"))
            .cast("long"),
        )
    )
