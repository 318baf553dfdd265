"""MERGE INTO / TRUNCATE TABLE / CREATE INDEX dialect statements.

Reference: non-graph DML/DDL is plain T-SQL passthrough
(TSQL Syntax Tree/WDataModification.cs:77+); indexes live in SQL Server
(GraphView's own metadata tables get clustered PKs,
GraphViewConnection.cs:300-360)."""

from __future__ import annotations

import pytest

from graphview_spark.graph import GraphDatabase, GraphViewError


@pytest.fixture()
def g(spark):
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [Emp] (
            [ColumnRole:"NodeId"] eid INT,
            [ColumnRole:"Property"] name varchar(20),
            [ColumnRole:"Property"] salary float,
            [ColumnRole:"Edge",Reference:"Emp"] Manages VARBINARY(max) )"""
    )
    g.execute(
        "INSERT INTO Emp(eid,name,salary) VALUES(1,'ann',10.0),(2,'bob',20.0)"
    )
    return g


def _rows(g):
    return {
        r["eid"]: (r["name"], r["salary"])
        for r in g.execute("SELECT eid, name, salary FROM Emp").collect()
    }


def test_merge_update_and_insert(g, spark):
    spark.createDataFrame(
        [(1, "ANN", 11.0), (3, "cyd", 30.0)], ["id", "nm", "sal"]
    ).createOrReplaceTempView("staged")
    g.execute(
        """MERGE INTO Emp AS t USING staged AS s ON t.eid = s.id
           WHEN MATCHED THEN UPDATE SET name = s.nm, salary = s.sal
           WHEN NOT MATCHED THEN INSERT (eid, name, salary)
                VALUES (s.id, s.nm, s.sal)"""
    )
    assert _rows(g) == {
        1: ("ANN", 11.0),
        2: ("bob", 20.0),
        3: ("cyd", 30.0),
    }


def test_merge_branches_see_pre_statement_snapshot(g, spark):
    # T-SQL MERGE evaluates WHEN branches against the pre-statement
    # target: the matched-branch UPDATE rewrites the ON key (eid 1 → 9),
    # which must NOT unmatch source row id=9 — it was unmatched before
    # the statement, so it still inserts (sequential evaluation would
    # see eid=9 already present and skip it).
    spark.createDataFrame(
        [(1, "upd", 99.0), (9, "new", 9.0)], ["id", "nm", "sal"]
    ).createOrReplaceTempView("snap_src")
    g.execute(
        """MERGE INTO Emp AS t USING snap_src AS s ON t.eid = s.id
           WHEN MATCHED THEN UPDATE SET eid = 9, name = s.nm
           WHEN NOT MATCHED THEN INSERT (eid, name, salary)
                VALUES (s.id, s.nm, s.sal)"""
    )
    got = sorted(
        (r["eid"], r["name"])
        for r in g.execute("SELECT eid, name FROM Emp").collect()
    )
    assert got == [(2, "bob"), (9, "new"), (9, "upd")]


def test_merge_subquery_source_update_only(g):
    g.execute(
        """MERGE INTO Emp USING (
             SELECT eid AS id, salary * 2 AS sal FROM Emp WHERE eid = 2
           ) s ON Emp.eid = s.id
           WHEN MATCHED THEN UPDATE SET salary = s.sal"""
    )
    assert _rows(g)[2] == ("bob", 40.0)


def test_merge_insert_only(g, spark):
    spark.createDataFrame([(9, "zoe")], ["id", "nm"]).createOrReplaceTempView(
        "newbies"
    )
    g.execute(
        """MERGE INTO Emp t USING newbies s ON t.eid = s.id
           WHEN NOT MATCHED THEN INSERT (eid, name) VALUES (s.id, s.nm)"""
    )
    rows = _rows(g)
    assert rows[9][0] == "zoe" and len(rows) == 3


def test_truncate_empties_nodes_and_out_edges(g):
    g.execute(
        "INSERT EDGE INTO Emp.Manages SELECT a, b FROM Emp a, Emp b "
        "WHERE a.eid = 1 AND b.eid = 2"
    )
    assert g.edge_count("Emp.Manages") == 1
    g.execute("TRUNCATE TABLE Emp")
    assert g.node_count("Emp") == 0
    assert g.edge_count("Emp.Manages") == 0
    # table stays usable, ids not reused
    g.execute("INSERT INTO Emp(eid,name,salary) VALUES(5,'eve',1.0)")
    assert list(_rows(g)) == [5]


def test_truncate_refused_with_incoming_edges(g, spark):
    g.execute(
        """CREATE TABLE [Dept] (
            [ColumnRole:"NodeId"] did INT,
            [ColumnRole:"Edge",Reference:"Emp"] Employs VARBINARY(max) )"""
    )
    g.execute("INSERT INTO Dept(did) VALUES(100)")
    g.execute(
        "INSERT EDGE INTO Dept.Employs SELECT d, e FROM Dept d, Emp e "
        "WHERE d.did = 100 AND e.eid = 1"
    )
    with pytest.raises(GraphViewError, match="incoming edge"):
        g.execute("TRUNCATE TABLE Emp")


def test_create_index_recorded_and_validated(g):
    g.execute("CREATE NONCLUSTERED INDEX ix_name ON Emp (name ASC)")
    assert g.indexes["ix_name"] == ("Emp", ["name"])
    g.execute("CREATE UNIQUE CLUSTERED INDEX ix_eid ON [Emp] ([eid])")
    assert g.indexes["ix_eid"] == ("Emp", ["eid"])
    with pytest.raises(GraphViewError, match="unknown column"):
        g.execute("CREATE INDEX ix_bad ON Emp (nosuch)")


def test_explain_returns_plan(g):
    plan = g.execute(
        "EXPLAIN SELECT eid, name FROM Emp WHERE salary > 5"
    ).collect()[0]["plan"]
    assert "Physical Plan" in plan


def test_clear_drops_everything(g):
    g.clear()
    assert not g.catalog.has_table("Emp")
    g.execute(
        """CREATE TABLE [Emp] (
            [ColumnRole:"NodeId"] eid INT )"""
    )
    g.execute("INSERT INTO Emp(eid) VALUES(7)")
    assert g.node_count("Emp") == 1


def test_merge_insert_with_function_values(g, spark):
    spark.createDataFrame([(8, "ada")], ["id", "nm"]).createOrReplaceTempView(
        "fn_src"
    )
    g.execute(
        """MERGE INTO Emp t USING fn_src s ON t.eid = s.id
           WHEN NOT MATCHED THEN INSERT (eid, name)
                VALUES (s.id, upper(concat(s.nm, '!')))"""
    )
    assert _rows(g)[8][0] == "ADA!"


def test_merge_nested_subquery_source(g):
    g.execute(
        """MERGE INTO Emp USING (
             SELECT eid AS id, round(greatest(salary, least(salary, 5.0)), 1) AS sal
             FROM Emp WHERE eid IN (SELECT eid FROM Emp WHERE eid = 1)
           ) s ON Emp.eid = s.id
           WHEN MATCHED THEN UPDATE SET salary = s.sal"""
    )
    assert _rows(g)[1][1] == 10.0


def test_tsql_hints_stripped(g):
    rows = g.execute(
        "SELECT eid, name FROM Emp WITH (NOLOCK) "
        "WHERE salary > 5 OPTION (MAXDOP 4, RECOMPILE)"
    ).collect()
    assert {r["eid"] for r in rows} == {1, 2}
    # MATCH statements carry hints too
    g.execute(
        "INSERT EDGE INTO Emp.Manages SELECT a, b FROM Emp a, Emp b "
        "WHERE a.eid = 1 AND b.eid = 2"
    )
    got = g.execute(
        "SELECT A.name AS n FROM Emp A, Emp B (NOLOCK) "
        "MATCH A-[Manages]->B OPTION (HASH JOIN)"
    ).collect()
    assert [r["n"] for r in got] == ["ann"]
