"""Streaming graph ingestion: a micro-batch stream of edge (and node)
rows folded into a live ``GraphDatabase``.

Net-new surface (SURVEY.md §2.7): the reference is strictly batch — its
only ingest paths are INSERT statements and BulkInsert
(GraphView/BulkInsert.cs). On Spark the same graph catalog accepts a
``foreachBatch`` sink: every micro-batch reuses the BATCH ingest methods
(``insert_nodes_df`` / ``insert_edges_df``), so streaming and bulk
ingestion share one code path and one set of invariants (GlobalNodeId
assignment, edge ordinal batching, referential checks).

Scale design:
  - ``insert_edges_df`` is a lazy union tagged with a batch ordinal — a
    micro-batch appends WITHOUT reading or rewriting the existing edge
    DataFrame, so ingest cost is O(batch), not O(graph).
  - Node resolution (NodeId → GlobalNodeId) is an equi-join against the
    node table; with bucketed persistence the join side is pre-hashed.
  - After ``compact_every`` batches the edge lineage is checkpointed —
    unbounded union lineage is the one thing that would degrade a
    long-running stream (plan size grows per batch; the checkpoint
    resets it to a materialized scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphview_spark.graph import GraphDatabase


class GraphStreamWriter:
    """``foreachBatch``-compatible edge ingester for one edge type.

    Usage::

        w = GraphStreamWriter(g, "Person", "Knows", src_key="src_id",
                              sink_key="dst_id", compact_every=16)
        q = (edges_stream.writeStream.foreachBatch(w)
             .outputMode("append").start())

    The incoming batch carries NodeId values; the writer resolves both
    endpoints against the node tables and drops rows whose endpoints
    don't exist yet (counted in ``skipped_rows`` — a real deployment
    routes them to a dead-letter sink or retries after the node stream
    catches up)."""

    def __init__(self, g: GraphDatabase, source_table: str, edge_name: str,
                 src_key: str, sink_key: str, compact_every: int = 16):
        self.g = g
        self.source_table = source_table
        self.edge_name = edge_name
        self.src_key = src_key
        self.sink_key = sink_key
        self.compact_every = compact_every
        self.batches = 0
        self.ingested_rows = 0
        self.skipped_rows = 0
        self.last_batch_id = -1

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: after a failure the engine
        # replays the last micro-batch with the SAME batch_id. Edges have
        # no natural key to anti-join on (parallel edges are legal), so
        # replay protection is the standard batch_id high-water mark —
        # a replayed batch would otherwise double-insert every edge.
        if batch_id <= self.last_batch_id:
            return
        g = self.g
        e = g.catalog.resolve_edge(self.source_table, self.edge_name)
        src_t = g.catalog.table(e.source_table)
        sink_t = g.catalog.table(e.sink_table)
        attr_cols = [
            n for n, _ in e.attributes if n in batch_df.columns
        ]
        src_nodes = g.nodes[src_t.name].select(
            F.col(src_t.node_id_column).alias(self.src_key),
            F.col("GlobalNodeId").alias("src"),
        )
        sink_nodes = g.nodes[sink_t.name].select(
            F.col(sink_t.node_id_column).alias(self.sink_key),
            F.col("GlobalNodeId").alias("sink"),
        )
        n_in = batch_df.count()
        resolved = (
            batch_df.join(src_nodes, self.src_key)
            .join(sink_nodes, self.sink_key)
            .select("src", "sink", *attr_cols)
        )
        n_ok = resolved.count()
        g.insert_edges_df(src_t.name, e.name, resolved)
        # advance the high-water mark only AFTER the ingest lands: a
        # batch that fails mid-ingest is replayed with the same
        # batch_id, and a pre-advanced mark would skip it (data loss)
        self.last_batch_id = batch_id
        self.batches += 1
        self.ingested_rows += n_ok
        self.skipped_rows += n_in - n_ok
        if self.batches % self.compact_every == 0:
            # cut the per-batch union lineage before it dominates
            # planning time on a long-running stream
            g.edges[e.qualified] = g.edges[e.qualified].localCheckpoint(
                eager=True
            )


class NodeStreamWriter:
    """``foreachBatch``-compatible node ingester: each micro-batch's rows
    become new nodes of one table via the batch ``insert_nodes_df`` path
    (GlobalNodeId assignment identical to bulk load). Rows whose NodeId
    already exists are dropped (idempotent re-delivery — at-least-once
    sources replay batches)."""

    def __init__(self, g: GraphDatabase, table: str, compact_every: int = 16):
        self.g = g
        self.table = table
        self.compact_every = compact_every
        self.batches = 0
        self.last_batch_id = -1

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # same batch_id high-water mark as GraphStreamWriter — the
        # NodeId anti-join below already makes replays a no-op, but the
        # guard keeps both writers on one idempotence invariant and
        # skips the join work on a replay.
        if batch_id <= self.last_batch_id:
            return
        g = self.g
        t = g.catalog.table(self.table)
        nid = t.node_id_column
        existing = g.nodes[t.name].select(F.col(nid).alias("__nid"))
        fresh = (
            batch_df.dropDuplicates([nid])
            .join(existing, F.col(nid) == F.col("__nid"), "left_anti")
        )
        prop_names = [n for n, _ in t.properties]
        node_types = {f.name: f.dataType for f in g.nodes[t.name].schema.fields}
        sel = [
            (
                F.col(n).cast(node_types[n])
                if n in fresh.columns
                else F.lit(None).cast(node_types[n])
            ).alias(n)
            for n in prop_names
        ]
        g.insert_nodes_df(t.name, fresh.select(*sel))
        # after the ingest, for the same replay-safety reason as above
        # (the anti-join alone would also absorb a replay, but a failed
        # attempt must not be skippable)
        self.last_batch_id = batch_id
        self.batches += 1
        if self.batches % self.compact_every == 0:
            g.nodes[t.name] = g.nodes[t.name].localCheckpoint(eager=True)
