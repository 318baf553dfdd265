"""The reference's own tutorial programs, replayed statement-for-
statement against this engine — the switch-over test: a GraphView user's
scripts run unchanged (GraphViewTutorial/InsAndDelTutorial.cs,
StoredProcedureTutorial.cs, BulkLoadTutorial.cs).

One deliberate deviation, asserted where it matters: SQL Server's
default collation is case-insensitive ('caven' matches 'Caven',
InsAndDelTutorial.cs:48), Spark string equality is case-sensitive —
so the tutorial is replayed with exact-case literals.
"""

from __future__ import annotations

import pytest

from graphview_spark.graph import GraphDatabase
from graphview_spark.sources.bulk import bulk_insert_edges, bulk_insert_nodes


def test_ins_and_del_tutorial(spark):
    """InsAndDelTutorial.cs:22-148, full flow."""
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [People] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Property"] name varchar(20),
            [ColumnRole:"Edge",Reference:"People"] Knows VARBINARY(max) )"""
    )
    for i, n in [(1, "Alice"), (2, "Bob"), (3, "Caven"), (4, "David")]:
        g.execute(f"INSERT INTO [People](id,name) VALUES({i},'{n}')")

    g.execute(
        """INSERT EDGE INTO People.Knows
           SELECT x,y FROM People x , People y
               WHERE x.name = 'Alice' AND y.name = 'Bob' """
    )
    g.execute(
        """INSERT EDGE INTO People.Knows
           SELECT x,y FROM People x , People y
               WHERE x.name = 'Bob' AND y.name = 'Caven' """
    )
    g.execute(
        """INSERT EDGE INTO People.Knows
           SELECT x,y FROM People x , People y
               WHERE x.name = 'Bob' AND y.name = 'David' """
    )

    # Query 1: knowers of knowers of Alice (tutorial prints Caven, David)
    res = g.execute(
        """SELECT C.* FROM People A, People B, People C
           MATCH A-[Knows]->B-[Knows]->C
           WHERE A.name = 'Alice' """
    )
    assert {r["name"] for r in res.collect()} == {"Caven", "David"}

    # Delete edges into Bob or Caven
    g.execute(
        """DELETE EDGE [x]-[Knows]->[y]
           FROM People as x, People as y
           WHERE y.name='Bob' or y.name = 'Caven' """
    )

    # Query 2: remaining edges — only Bob knows David
    res = g.execute(
        """SELECT x.name as name1, y.name as name2 FROM People x, People y
           MATCH x-[Knows]->y """
    )
    assert [(r["name1"], r["name2"]) for r in res.collect()] == [("Bob", "David")]

    # Delete unconnected nodes (Alice, Caven); Bob/David excluded by WHERE
    g.execute(
        "DELETE NODE FROM People WHERE People.name <> 'Bob' "
        "and People.name <> 'David' "
    )

    # Query 3: remaining nodes
    res = g.execute("SELECT * FROM [People] ")
    assert {r["name"] for r in res.collect()} == {"Bob", "David"}

    # Delete all edges, then all nodes — table ends empty
    g.execute(
        """DELETE EDGE [x]-[Knows]->[y]
           FROM People as x, People as y """
    )
    g.execute("DELETE NODE FROM People ")
    assert g.execute("SELECT * FROM [People] ").count() == 0


def test_stored_procedure_tutorial(spark):
    """StoredProcedureTutorial.cs:25-94: CREATE PROCEDURE with graph
    statements inside, EXEC with named parameters."""
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [Node] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Edge",Reference:"Node"] Edges VARBINARY(max) )"""
    )
    for i in (1, 2, 3):
        g.execute(f"INSERT INTO [Node](id) VALUES({i})")

    g.execute(
        """CREATE PROCEDURE AddEdge
            @st INT,
            @ed INT
            AS
            BEGIN
                INSERT EDGE INTO Node.Edges
                SELECT s,t FROM
                Node s , Node t WHERE s.id = @st AND t.id= @ed ;
            END"""
    )
    g.execute(
        """CREATE PROCEDURE SelectNeighbors
            @id INT
            AS
            BEGIN
                SELECT y.* FROM Node x, Node y
                    MATCH x-[Edges]->y
                    WHERE x.id = @id
            END"""
    )

    g.execute_procedure("AddEdge", st=1, ed=2)
    g.execute_procedure("AddEdge", st=1, ed=3)
    res = g.execute_procedure("SelectNeighbors", id=1)
    assert {r["id"] for r in res.collect()} == {2, 3}


def test_bulk_load_tutorial(spark, tmp_path):
    """BulkLoadTutorial.cs:15-87: headerless delimited files → node
    tables + edge column, then MATCH."""
    reader_f = tmp_path / "Reader.txt"
    book_f = tmp_path / "Book.txt"
    read_f = tmp_path / "Read.txt"
    reader_f.write_text("Alice,Female\nBob,Male\nClever,\n")
    book_f.write_text('"The Three-Body Problem"\n"Harry Potter"\n')
    read_f.write_text(
        'Alice,"The Three-Body Problem"\n'
        'Bob,"The Three-Body Problem"\n'
        'Clever,"Harry Potter"\n'
    )

    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [Book] (
            [ColumnRole:"NodeId"] name VARCHAR(40) )"""
    )
    g.execute(
        """CREATE TABLE [Reader] (
            [ColumnRole:"NodeId"] name VARCHAR(30),
            [ColumnRole:"Property"] gender VARCHAR(10),
            [ColumnRole:"Edge",Reference:"Book"] Reads VARBINARY(max) )"""
    )

    bulk_insert_nodes(g, "Reader", str(reader_f), header=False,
                      columns=["name", "gender"])
    bulk_insert_nodes(g, "Book", str(book_f), header=False, columns=["name"])
    bulk_insert_edges(g, "Reader", "Reads", str(read_f), header=False)

    res = g.execute(
        """SELECT x.name as name1, y.name as name2 FROM Reader x, Book y
           MATCH x-[Reads]->y """
    )
    got = {(r["name1"], r["name2"]) for r in res.collect()}
    assert got == {
        ("Alice", "The Three-Body Problem"),
        ("Bob", "The Three-Body Problem"),
        ("Clever", "Harry Potter"),
    }
    # Clever's empty gender field loads as null (BulkInsert null handling)
    genders = {
        r["name"]: r["gender"]
        for r in g.execute("SELECT name, gender FROM Reader").collect()
    }
    assert genders["Clever"] is None


def test_delete_node_connected_raises_like_reference(spark):
    """InsAndDelTutorial.cs:105-107: 'you can not delete a node with
    edge linked to it' — an unfiltered DELETE NODE on a connected table
    raises (TranslateDataModificationVisitor.cs:2164-2179)."""
    from graphview_spark.graph import GraphViewError

    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [People] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Edge",Reference:"People"] Knows VARBINARY(max) )"""
    )
    g.execute("INSERT INTO [People](id) VALUES(1),(2)")
    g.execute(
        "INSERT EDGE INTO People.Knows SELECT x,y FROM People x, People y "
        "WHERE x.id = 1 AND y.id = 2"
    )
    with pytest.raises(GraphViewError, match="edge"):
        g.execute("DELETE NODE FROM People")


def test_ins_and_del_tutorial_ci_collation(spark):
    """The tutorial's lowercase 'caven' literal (InsAndDelTutorial.cs:48)
    matches 'Caven' under case_insensitive=True — SQL Server's default
    collation behavior, closing the one documented deviation."""
    g = GraphDatabase(spark, case_insensitive=True)
    g.execute(
        """CREATE TABLE [People] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Property"] name varchar(20),
            [ColumnRole:"Edge",Reference:"People"] Knows VARBINARY(max) )"""
    )
    for i, n in [(1, "Alice"), (2, "Bob"), (3, "Caven"), (4, "David")]:
        g.execute(f"INSERT INTO [People](id,name) VALUES({i},'{n}')")
    # the tutorial's literal, verbatim: lowercase 'caven'
    g.execute(
        """INSERT EDGE INTO People.Knows
           SELECT x,y FROM People x , People y
               WHERE x.name = 'Bob' AND y.name = 'caven' """
    )
    assert g.edge_count("People.Knows") == 1
    got = g.execute(
        "SELECT y.name FROM People x, People y MATCH x-[Knows]->y "
        "WHERE x.name = 'BOB'"
    ).collect()
    assert [r["name"] for r in got] == ["Caven"]
