"""BEGIN TRANSACTION / COMMIT / ROLLBACK over versioned DataFrames
(reference: GraphViewConnection.BeginTransaction,
GraphViewConnection.cs:242-273 — transactions spanning nodes, edges and
DDL)."""

from __future__ import annotations

import pytest

from graphview_spark.graph import GraphDatabase, GraphViewError


@pytest.fixture()
def g(spark):
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [P] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Edge",Reference:"P"] E VARBINARY(max) )"""
    )
    g.execute("INSERT INTO P(id) VALUES(1),(2)")
    return g


def test_rollback_undoes_dml_and_ddl(g):
    g.execute("BEGIN TRANSACTION")
    g.execute("INSERT INTO P(id) VALUES(3)")
    g.execute(
        "INSERT EDGE INTO P.E SELECT a,b FROM P a, P b "
        "WHERE a.id = 1 AND b.id = 2"
    )
    g.execute(
        """CREATE TABLE [Q] ( [ColumnRole:"NodeId"] qid INT )"""
    )
    assert g.node_count("P") == 3 and g.edge_count("P.E") == 1
    g.execute("ROLLBACK")
    assert g.node_count("P") == 2
    assert g.edge_count("P.E") == 0
    assert not g.catalog.has_table("Q")


def test_commit_keeps_changes(g):
    g.execute("BEGIN TRAN")
    g.execute("INSERT INTO P(id) VALUES(7)")
    g.execute("COMMIT")
    assert g.node_count("P") == 3
    with pytest.raises(GraphViewError, match="COMMIT without"):
        g.execute("COMMIT")


def test_nested_rollback_to_outermost(g):
    g.execute("BEGIN TRANSACTION")
    g.execute("INSERT INTO P(id) VALUES(10)")
    g.execute("BEGIN TRANSACTION")
    g.execute("INSERT INTO P(id) VALUES(11)")
    g.execute("COMMIT")           # inner commit only pops the stack
    g.execute("ROLLBACK")         # undoes to the OUTERMOST begin
    assert {r["id"] for r in g.execute("SELECT id FROM P").collect()} == {1, 2}


def test_transaction_in_script(g):
    out = g.execute_script(
        """
        BEGIN TRANSACTION;
        INSERT INTO P(id) VALUES(5);
        ROLLBACK;
        BEGIN TRANSACTION;
        INSERT INTO P(id) VALUES(6);
        COMMIT;
        SELECT count(*) AS n FROM P
        """
    )
    assert out.collect()[0]["n"] == 3
