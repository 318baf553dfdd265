"""Bucketed persistence — the 100 TB storage layout: nodes bucketed by
GlobalNodeId, edges by src, so MATCH joins run without an Exchange on
either side (the Spark analog of the reference's in-row adjacency,
SURVEY §1.4)."""

from __future__ import annotations

import pytest

from graphview_spark.graph import GraphDatabase


@pytest.fixture()
def g(spark):
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [P] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Property"] name varchar(20),
            [ColumnRole:"Edge",Reference:"P"] Knows VARBINARY(max) )"""
    )
    g.execute(
        "INSERT INTO P(id,name) VALUES(1,'a'),(2,'b'),(3,'c'),(4,'d')"
    )
    g.execute(
        "INSERT EDGE INTO P.Knows SELECT x,y FROM P x, P y WHERE x.id + 1 = y.id"
    )
    return g


def test_bucketed_roundtrip_and_exchange_free_join(g, spark, tmp_path):
    g.save_bucketed("gdb_test", buckets=4, location=str(tmp_path / "wh"))
    g2 = GraphDatabase.load_bucketed(spark, "gdb_test")

    # data round-trips
    res = g2.execute(
        """SELECT x.name AS a, y.name AS b FROM P x, P y
           MATCH x-[Knows]->y"""
    )
    assert sorted((r["a"], r["b"]) for r in res.collect()) == [
        ("a", "b"), ("b", "c"), ("c", "d"),
    ]

    # the node-edge equi-join is exchange-free: both scans are bucketed
    # on their join keys with the same bucket count. Disable broadcast so
    # the planner actually exercises the bucketed (shuffle-join) path —
    # at 100 TB neither side broadcasts, which is exactly when bucketing
    # pays off.
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        nodes = g2.nodes["P"]
        edges = g2.edges["P.Knows"]
        plan = (
            edges.join(nodes, edges["src"] == nodes["GlobalNodeId"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)

    # id sequence continues after reload (state via _meta)
    g2.execute("INSERT INTO P(id,name) VALUES(5,'e')")
    gids = [r["GlobalNodeId"] for r in g2.nodes["P"].collect()]
    assert len(set(gids)) == 5

    spark.sql("DROP DATABASE IF EXISTS gdb_test CASCADE")
