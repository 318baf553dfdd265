"""Dialect DDL for procedures and views — the tutorial scripts run
end-to-end as statement text (reference: StoredProcedureTutorial.cs:39-76,
GraphViewConnection.cs:1619-1698, View.cs:689-737,830-874)."""

from __future__ import annotations

import pytest

from graphview_spark.graph import GraphDatabase


@pytest.fixture()
def g(spark):
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [Node] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Property"] name varchar(20),
            [ColumnRole:"Edge",Reference:"Node"] Edges VARBINARY(max) )"""
    )
    g.execute("INSERT INTO Node(id,name) VALUES(1,'a'),(2,'b'),(3,'c')")
    return g


def test_create_procedure_and_exec(g):
    # StoredProcedureTutorial.cs:39-47 verbatim shape
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
                SELECT y.name AS n FROM Node x, Node y
                    MATCH x-[Edges]->y
                    WHERE x.id = @id
            END"""
    )
    g.execute("EXEC AddEdge @st = 1, @ed = 2")
    g.execute("EXEC AddEdge 1, 3")  # positional binding
    res = g.execute("EXEC SelectNeighbors @id = 1")
    assert sorted(r["n"] for r in res.collect()) == ["b", "c"]


def test_create_procedure_multi_statement(g):
    g.execute(
        """CREATE PROCEDURE AddPair @i INT, @n varchar(20) AS BEGIN
               INSERT INTO Node(id,name) VALUES(@i, @n);
               INSERT EDGE INTO Node.Edges
               SELECT s,t FROM Node s, Node t WHERE s.id = 1 AND t.id = @i;
           END"""
    )
    g.execute("EXEC AddPair @i = 9, @n = 'nine'")
    res = g.execute(
        """SELECT y.name AS n FROM Node x, Node y
           MATCH x-[Edges]->y WHERE x.id = 1"""
    )
    assert sorted(r["n"] for r in res.collect()) == ["nine"]


def test_procedure_param_prefix_and_literals(g):
    # @p must not corrupt @prio (whole-token substitution), and a string
    # literal containing '@p' must pass through untouched
    g.execute(
        """CREATE PROCEDURE Tag @p INT, @prio varchar(20) AS BEGIN
               SELECT n.name AS nm, @prio AS prio, '@p stays' AS lit
               FROM Node n WHERE n.id = @p
           END"""
    )
    row = g.execute("EXEC Tag @p = 2, @prio = 'high'").first()
    assert row["nm"] == "b"
    assert row["prio"] == "high"
    assert row["lit"] == "@p stays"


def test_view_degree_columns_plain_sql(g):
    g.execute(
        """INSERT EDGE INTO Node.Edges
           SELECT s,t FROM Node s, Node t WHERE s.id = 1 AND t.id = 2"""
    )
    g.create_node_view("VNode", ["Node"])
    rows = {
        r["name"]: (r["outd"], r["ind"])
        for r in g.execute(
            """SELECT v.name AS name, v.OutDegree AS outd, v.InDegree AS ind
               FROM VNode v"""
        ).collect()
    }
    assert rows["a"] == (1, 0) and rows["b"] == (0, 1) and rows["c"] == (0, 0)


def test_create_node_view_star_and_mapped(spark):
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [Emp] (
            [ColumnRole:"NodeId"] eid INT,
            [ColumnRole:"Property"] ename varchar(20),
            [ColumnRole:"Property"] dept varchar(20) )"""
    )
    g.execute(
        """CREATE TABLE [Contractor] (
            [ColumnRole:"NodeId"] cid INT,
            [ColumnRole:"Property"] cname varchar(20) )"""
    )
    g.execute("INSERT INTO Emp(eid,ename,dept) VALUES(1,'ann','hr')")
    g.execute("INSERT INTO Contractor(cid,cname) VALUES(7,'bob')")
    # positional mapping with aliases and NULL padding
    g.execute(
        """CREATE NODE VIEW Worker AS
           SELECT ename AS wname, dept FROM Emp
           UNION ALL
           SELECT cname AS wname, NULL FROM Contractor"""
    )
    rows = {
        (r["_NodeType"], r["wname"], r["dept"])
        for r in g.node_view_df("Worker").collect()
    }
    assert rows == {("Emp", "ann", "hr"), ("Contractor", "bob", None)}
    # star mapping merges by property name
    g.execute(
        "CREATE NODE VIEW AllW AS SELECT * FROM Emp UNION ALL SELECT * FROM Contractor"
    )
    df = g.node_view_df("AllW")
    assert {"ename", "cname", "dept"} <= set(df.columns)
    assert df.count() == 2


def test_global_node_view_queryable(g):
    g.execute(
        """CREATE TABLE [Org] (
            [ColumnRole:"NodeId"] oid INT,
            [ColumnRole:"Property"] oname varchar(20) )"""
    )
    g.execute("INSERT INTO Org(oid,oname) VALUES(1,'acme')")
    res = g.execute(
        "SELECT _NodeType AS t, COUNT(*) AS n FROM GlobalNodeView GROUP BY _NodeType"
    )
    rows = {(r["t"], r["n"]) for r in res.collect()}
    assert rows == {("Node", 3), ("Org", 1)}


def test_create_edge_view_statement(g):
    g.execute(
        """CREATE TABLE [Org] (
            [ColumnRole:"NodeId"] oid INT,
            [ColumnRole:"Edge",Reference:"Node"] Links VARBINARY(max) )"""
    )
    g.execute("INSERT INTO Org(oid) VALUES(1)")
    g.execute(
        "INSERT EDGE INTO Node.Edges SELECT s,t FROM Node s, Node t "
        "WHERE s.id = 1 AND t.id = 2"
    )
    g.execute(
        "INSERT EDGE INTO Org.Links SELECT s,t FROM Org s, Node t "
        "WHERE s.oid = 1 AND t.id = 3"
    )
    g.execute(
        """CREATE EDGE VIEW AnyLink AS
           SELECT * FROM Node.Edges
           UNION ALL
           SELECT * FROM Org.Links"""
    )
    df = g.edge_view_df("AnyLink")
    assert df.count() == 2
    assert sorted(r["_EdgeType"] for r in df.collect()) == [
        "Node.Edges", "Org.Links",
    ]


def test_tsql_type_mapping(spark):
    """T-SQL column types map to their true Spark widths — float is
    8-byte (double) on SQL Server, bit is boolean, (max) is unbounded."""
    from graphview_spark.graph import GraphDatabase

    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [Typed] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Property"] score float,
            [ColumnRole:"Property"] active bit,
            [ColumnRole:"Property"] note nvarchar(max),
            [ColumnRole:"Property"] seen datetime )"""
    )
    dt = dict(g.nodes["Typed"].dtypes)
    assert dt["score"] == "double"
    assert dt["active"] == "boolean"
    assert dt["note"] == "string"
    assert dt["seen"] == "timestamp"


def test_decimal_precision_preserved(spark):
    from graphview_spark.graph import GraphDatabase

    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [Priced] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Property"] price DECIMAL(10,2) )"""
    )
    assert dict(g.nodes["Priced"].dtypes)["price"] == "decimal(10,2)"
