"""Streaming graph ingestion: foreachBatch micro-batches folded into a
live GraphDatabase via the batch ingest paths."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from graphview_spark.graph import GraphDatabase
from graphview_spark.streaming.graph_ingest import (
    GraphStreamWriter,
    NodeStreamWriter,
)


@pytest.fixture()
def g(spark):
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [Person] (
            [ColumnRole:"NodeId"] pid INT,
            [ColumnRole:"Property"] name varchar(20),
            [ColumnRole:"Edge",Reference:"Person"] Knows VARBINARY(max) )"""
    )
    g.execute(
        "INSERT INTO Person(pid,name) VALUES"
        "(1,'a'),(2,'b'),(3,'c'),(4,'d')"
    )
    return g


def _drain(stream_df, writer):
    q = (
        stream_df.writeStream.foreachBatch(writer)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_edge_stream_ingest_and_match(g, spark, tmp_path):
    src = tmp_path / "edges_in"
    src.mkdir()
    # two files → (with maxFilesPerTrigger=1) at least two micro-batches
    spark.createDataFrame(
        [(1, 2), (2, 3)], ["src_id", "dst_id"]
    ).coalesce(1).write.json(str(src / "b0"))
    spark.createDataFrame(
        [(3, 4), (9, 1)], ["src_id", "dst_id"]  # 9 unresolvable
    ).coalesce(1).write.json(str(src / "b1"))

    stream = (
        spark.readStream.schema("src_id INT, dst_id INT")
        .option("maxFilesPerTrigger", 1)
        .json(str(src) + "/*")
    )
    w = GraphStreamWriter(g, "Person", "Knows", "src_id", "dst_id",
                          compact_every=2)
    _drain(stream, w)

    assert w.ingested_rows == 3
    assert w.skipped_rows == 1
    assert g.edge_count("Person.Knows") == 3
    # the ingested edges answer MATCH like any batch-loaded graph
    got = g.execute(
        "SELECT A.name AS a, B.name AS b FROM Person A, Person B "
        "MATCH A-[Knows]->B"
    ).collect()
    assert {(r["a"], r["b"]) for r in got} == {("a", "b"), ("b", "c"), ("c", "d")}


def test_edge_stream_replayed_batch_is_noop(g, spark):
    # at-least-once foreachBatch: after a failure the SAME batch_id is
    # redelivered — the writer's batch_id high-water mark must make the
    # replay a no-op instead of double-inserting every edge
    w = GraphStreamWriter(g, "Person", "Knows", "src_id", "dst_id")
    batch = spark.createDataFrame([(1, 2), (2, 3)], ["src_id", "dst_id"])
    w(batch, 0)
    assert g.edge_count("Person.Knows") == 2
    w(batch, 0)  # replay
    assert g.edge_count("Person.Knows") == 2
    assert w.ingested_rows == 2
    w(batch.where("src_id = 1"), 1)  # a genuinely new batch still lands
    assert g.edge_count("Person.Knows") == 3


def test_node_stream_ingest_idempotent(g, spark, tmp_path):
    src = tmp_path / "nodes_in"
    src.mkdir()
    spark.createDataFrame(
        [(10, "x"), (11, "y")], ["pid", "name"]
    ).coalesce(1).write.json(str(src / "b0"))
    # replay of pid=10 (at-least-once delivery) plus a fresh pid=12
    spark.createDataFrame(
        [(10, "x"), (12, "z")], ["pid", "name"]
    ).coalesce(1).write.json(str(src / "b1"))

    stream = (
        spark.readStream.schema("pid INT, name STRING")
        .option("maxFilesPerTrigger", 1)
        .json(str(src) + "/*")
    )
    _drain(stream, NodeStreamWriter(g, "Person", compact_every=2))

    rows = {
        r["pid"]: r["name"]
        for r in g.execute("SELECT pid, name FROM Person").collect()
    }
    assert rows == {1: "a", 2: "b", 3: "c", 4: "d", 10: "x", 11: "y", 12: "z"}
    # GlobalNodeIds stay unique after streamed inserts
    ids = [r["GlobalNodeId"] for r in g.nodes["Person"].collect()]
    assert len(ids) == len(set(ids))


def test_edge_stream_failed_attempt_is_retried(g, spark, monkeypatch):
    # the high-water mark must advance only AFTER the ingest lands: a
    # batch whose first attempt dies mid-ingest is redelivered with the
    # same batch_id and must NOT be skipped (that would be data loss)
    w = GraphStreamWriter(g, "Person", "Knows", "src_id", "dst_id")
    batch = spark.createDataFrame([(1, 2), (2, 3)], ["src_id", "dst_id"])
    real = g.insert_edges_df

    def boom(*a, **k):
        raise RuntimeError("transient ingest failure")

    monkeypatch.setattr(g, "insert_edges_df", boom)
    try:
        w(batch, 0)
    except RuntimeError:
        pass
    monkeypatch.setattr(g, "insert_edges_df", real)
    w(batch, 0)  # engine retry with the same batch_id
    assert g.edge_count("Person.Knows") == 2
    w(batch, 0)  # a successful batch is still replay-protected
    assert g.edge_count("Person.Knows") == 2
