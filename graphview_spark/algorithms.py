"""Iterative graph algorithms as driver-side DataFrame loops.

The reference has no built-in algorithms; its README claims iterative
computation via T-SQL WHILE loops around MATCH queries (README.md:16,
WSql.cs:405-454 — SURVEY.md §2.6 'Graph algorithms' row). The Spark
equivalent is a Pregel-style loop: per-iteration message aggregation by
join + groupBy, driver-controlled convergence, checkpoints to cut
lineage. ``aggregate_messages`` is the one primitive both algorithms
here build on — the PySpark-idiomatic analog of GraphX
aggregateMessages (GraphX itself is JVM/RDD-only, SURVEY §2.6).

Scale notes: every iteration is one shuffle on node id (the same
partitioning each round — bucketed edge storage makes it co-located);
state per node is O(1); localCheckpoint every iteration keeps plan
depth constant. Convergence tests cost one tiny aggregate per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_messages(
    nodes: DataFrame,
    edges: DataFrame,
    msg_expr,
    agg_expr,
    direction: str = "out",
) -> DataFrame:
    """One Pregel superstep: each edge sends ``msg_expr`` (may reference
    source-node columns and edge columns) to its sink (``direction=
    'out'``) or source ('in'); messages aggregate per receiver with
    ``agg_expr``. Returns (GlobalNodeId, msg)."""
    send_key, recv_key = ("src", "sink") if direction == "out" else ("sink", "src")
    joined = edges.join(
        nodes, edges[send_key] == nodes["GlobalNodeId"], "inner"
    )
    return (
        joined.select(F.col(recv_key).alias("__recv"), msg_expr.alias("__msg"))
        .groupBy("__recv")
        .agg(agg_expr(F.col("__msg")).alias("msg"))
        .withColumnRenamed("__recv", "GlobalNodeId")
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """PageRank over (GlobalNodeId) nodes and (src, sink) edges; fixed
    iteration count → deterministic. Dangling mass is redistributed
    uniformly (the standard formulation)."""
    n = nodes.count()
    ranks = nodes.select("GlobalNodeId").withColumn("rank", F.lit(1.0 / n))
    degrees = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))

    for _ in range(iterations):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["GlobalNodeId"])
            .join(degrees, "src")
            .select(
                F.col("sink").alias("GlobalNodeId"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("GlobalNodeId")
            .agg(F.sum("c").alias("received"))
        )
        dangling = (
            ranks.join(degrees, ranks["GlobalNodeId"] == degrees["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.select("GlobalNodeId")
            .join(contribs, "GlobalNodeId", "left")
            .select(
                "GlobalNodeId",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("received"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """Label propagation to a fixpoint: every node adopts the minimum
    component id among itself and its neighbors (edges treated as
    undirected). Returns (GlobalNodeId, component)."""
    labels = nodes.select(
        "GlobalNodeId", F.col("GlobalNodeId").alias("component")
    ).localCheckpoint(eager=True)
    sym = edges.select("src", "sink").union(
        edges.select(F.col("sink").alias("src"), F.col("src").alias("sink"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["src"] == labels["GlobalNodeId"])
            .select(F.col("sink").alias("GlobalNodeId"), "component")
            .groupBy("GlobalNodeId")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "GlobalNodeId", "left")
            .select(
                "GlobalNodeId",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "GlobalNodeId")
            .filter(F.col("u.component") != F.col("l.component"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels


# --------------------------------------------------------------------------
# correctness-gate entries (iterative → no SQL oracle; rows-only check,
# exact values asserted in tests/test_algorithms.py instead)
# --------------------------------------------------------------------------

def q_graph_pagerank(spark, sf_dir: str) -> DataFrame:
    """PageRank over the Refers tree (driver-loop iterative algorithm —
    SURVEY §2.6 'Graph algorithms' row; deliberately no oracle_sql:
    iterative fixpoints are not expressible in one SQL statement)."""
    from graphview_spark.graph_queries import tpch_graph

    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes["Customer"]
    edges = g.edge_with_id("Customer.Refers")
    pr = pagerank(nodes, edges, iterations=5)
    return (
        pr.join(nodes, "GlobalNodeId")
        .select("c_custkey", F.round("rank", 8).alias("rank"))
    )


def q_graph_components(spark, sf_dir: str) -> DataFrame:
    from graphview_spark.graph_queries import tpch_graph

    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes["Customer"]
    edges = g.edge_with_id("Customer.Refers")
    cc = connected_components(nodes, edges)
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(F.count(F.lit(1)).alias("n_components"),
                F.max("n_nodes").alias("largest"))
    )


QUERIES = {
    "graph_pagerank": q_graph_pagerank,
    "graph_components": q_graph_components,
}

# no ORACLES on purpose: driver records rows-only (weak) checks for these
ORACLES: dict[str, str] = {}
