"""DROP NODE TABLE / ALTER TABLE DROP COLUMN / UPDATE ... FROM.

Reference: GraphViewConnection.DropNodeTable (GraphViewConnection.cs:1496),
DropNodeTableColumn (:2294), and UPDATE as full T-SQL passthrough incl.
FROM/JOIN (TSQL Syntax Tree/WDataModification.cs:386+)."""

from __future__ import annotations

import pytest

from graphview_spark.graph import GraphDatabase, GraphViewError


@pytest.fixture()
def g(spark):
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [Author] (
            [ColumnRole:"NodeId"] aid INT,
            [ColumnRole:"Property"] name varchar(20),
            [ColumnRole:"Property"] rating float,
            [ColumnRole:"Edge",Reference:"Book"] Wrote VARBINARY(max) )"""
    )
    g.execute(
        """CREATE TABLE [Book] (
            [ColumnRole:"NodeId"] bid INT,
            [ColumnRole:"Property"] title varchar(40) )"""
    )
    g.execute("INSERT INTO Author(aid,name,rating) VALUES(1,'ann',1.0),(2,'bob',2.0)")
    g.execute("INSERT INTO Book(bid,title) VALUES(10,'x'),(11,'y')")
    return g


def test_drop_refused_while_referenced(g):
    with pytest.raises(GraphViewError, match="referenced by edge"):
        g.execute("DROP NODE TABLE Book")


def test_drop_create_roundtrip(g):
    # dropping the referencing table first releases Book
    g.execute("DROP NODE TABLE Author")
    assert not g.catalog.has_table("Author")
    g.execute("DROP NODE TABLE Book")
    g.execute(
        """CREATE TABLE [Book] (
            [ColumnRole:"NodeId"] bid INT,
            [ColumnRole:"Property"] title varchar(40) )"""
    )
    g.execute("INSERT INTO Book(bid,title) VALUES(1,'z')")
    assert g.execute("SELECT * FROM Book").count() == 1


def test_drop_refused_while_in_view(g):
    g.create_node_view("Lit", ["Author", "Book"])
    with pytest.raises(GraphViewError, match="member of view"):
        g.execute("DROP NODE TABLE Author")


def test_drop_unknown_table_raises(g):
    with pytest.raises(KeyError):
        g.execute("DROP NODE TABLE Nope")


def test_alter_drop_property_column(g):
    g.execute("ALTER TABLE Author DROP COLUMN rating")
    cols = g.execute("SELECT * FROM Author").columns
    assert "rating" not in cols and "name" in cols
    assert [n for n, _ in g.catalog.table("Author").properties] == ["aid", "name"]


def test_alter_drop_nodeid_refused(g):
    with pytest.raises(GraphViewError, match="NodeId"):
        g.execute("ALTER TABLE Author DROP COLUMN aid")


def test_alter_drop_edge_column(g):
    g.execute("ALTER TABLE Author DROP COLUMN Wrote")
    assert "wrote" not in g.catalog.table("Author").edges
    # Book is no longer referenced — drop now succeeds
    g.execute("DROP NODE TABLE Book")


def test_update_from_joined_aggregate(g):
    g.execute(
        """CREATE TABLE [Sale] (
            [ColumnRole:"NodeId"] sid INT,
            [ColumnRole:"Property"] author_id INT,
            [ColumnRole:"Property"] amount float )"""
    )
    g.execute(
        """INSERT INTO Sale(sid,author_id,amount)
           VALUES(1,1,10.0),(2,1,30.0),(3,2,5.0)"""
    )
    g.execute(
        """UPDATE A SET rating = t.total
           FROM Author A JOIN (
               SELECT s.author_id AS author_id, SUM(s.amount) AS total
               FROM Sale s GROUP BY s.author_id
           ) t ON A.aid = t.author_id"""
    )
    rows = {r["name"]: r["rating"] for r in g.execute("SELECT * FROM Author").collect()}
    assert rows == {"ann": 40.0, "bob": 5.0}


def test_update_from_leaves_unmatched_rows(g):
    g.execute(
        """UPDATE A SET rating = A.rating + 100
           FROM Author A WHERE A.name = 'ann'"""
    )
    rows = {r["name"]: r["rating"] for r in g.execute("SELECT * FROM Author").collect()}
    assert rows == {"ann": 101.0, "bob": 2.0}


def test_update_scalar_subquery_set_still_single_table(g):
    # a FROM inside a parenthesized scalar subquery must NOT trigger the
    # UPDATE..FROM path
    g.execute(
        "UPDATE Author SET rating = (SELECT MAX(b.bid) FROM Book b)"
    )
    ratings = {r["rating"] for r in g.execute("SELECT * FROM Author").collect()}
    assert ratings == {11.0}


def test_alter_add_property_column(g):
    g.execute(
        'ALTER TABLE Author ADD [ColumnRole:"Property"] country varchar(10)'
    )
    rows = g.execute("SELECT aid, country FROM Author").collect()
    assert all(r["country"] is None for r in rows) and len(rows) == 2
    g.execute("UPDATE Author SET country = 'US' WHERE aid = 1")
    got = {r["aid"]: r["country"] for r in g.execute(
        "SELECT aid, country FROM Author").collect()}
    assert got == {1: "US", 2: None}


def test_alter_add_edge_column_and_traverse(g):
    g.execute(
        'ALTER TABLE Author ADD '
        '[ColumnRole:"Edge",Reference:"Author"] Mentors VARBINARY(max)'
    )
    g.execute(
        "INSERT EDGE INTO Author.Mentors SELECT a,b FROM Author a, Author b "
        "WHERE a.aid = 1 AND b.aid = 2"
    )
    got = g.execute(
        "SELECT a.name AS m, b.name AS s FROM Author a, Author b "
        "MATCH a-[Mentors]->b"
    ).collect()
    assert [(r["m"], r["s"]) for r in got] == [("ann", "bob")]


def test_alter_add_rejects_nodeid_and_dupes(g):
    import pytest as _pytest

    from graphview_spark.graph import GraphViewError

    with _pytest.raises(GraphViewError, match="NodeId"):
        g.execute('ALTER TABLE Author ADD [ColumnRole:"NodeId"] k INT')
    with _pytest.raises(GraphViewError, match="already exists"):
        g.execute('ALTER TABLE Author ADD [ColumnRole:"Property"] name varchar(5)')


def test_drop_procedure_roundtrip(g):
    g.execute("CREATE PROCEDURE P1 @x INT AS BEGIN SELECT @x AS v END")
    assert g.execute_procedure("P1", x=3).collect()[0]["v"] == 3
    g.execute("DROP PROCEDURE P1")
    import pytest as _pytest

    with _pytest.raises(KeyError):
        g.execute_procedure("P1", x=3)
    assert g.list_tables() == ["Author", "Book"]


def test_delete_node_join_form(g, spark):
    # stage a key list to join against, then delete the matching author
    spark.createDataFrame([(2,)], ["kid"]).createOrReplaceTempView("kill_list")
    g.execute(
        "DELETE NODE a FROM Author a JOIN kill_list k ON a.aid = k.kid"
    )
    assert {r["aid"] for r in g.execute("SELECT aid FROM Author").collect()} == {1}


def test_delete_node_join_form_guards_edges(g, spark):
    g.execute(
        "INSERT EDGE INTO Author.Wrote SELECT a, b FROM Author a, Book b "
        "WHERE a.aid = 1 AND b.bid = 10"
    )
    import pytest as _pytest

    from graphview_spark.graph import GraphViewError

    spark.createDataFrame([(1,)], ["kid"]).createOrReplaceTempView("kill_list")
    with _pytest.raises(GraphViewError, match="edge"):
        g.execute(
            "DELETE NODE a FROM Author a JOIN kill_list k ON a.aid = k.kid"
        )
    # nothing deleted on failure
    assert g.execute("SELECT aid FROM Author").count() == 2
