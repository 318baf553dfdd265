"""Dialect WITH-CTEs and INSERT ... SELECT.

Reference: every statement is wrapped in WStatementWithCtesAndXmlNamespaces
(GraphView/TSQL Syntax Tree/WSql.cs:215-313) so CTEs are first-class around
MATCH and DML; the reference's INSERT source may be any query
(GraphView/TSQL Syntax Tree/WDataModification.cs:77-149)."""

from __future__ import annotations

import pytest

from graphview_spark.graph import GraphDatabase


@pytest.fixture()
def people(spark):
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [People] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Property"] name varchar(20),
            [ColumnRole:"Edge",Reference:"People"] Knows VARBINARY(max) )"""
    )
    for i, name in [(1, "Alice"), (2, "Bob"), (3, "Caven"), (4, "David")]:
        g.execute(f"INSERT INTO [People](id,name) VALUES({i},'{name}')")
    for a, b in [("Alice", "Bob"), ("Bob", "Caven"), ("Bob", "David")]:
        g.execute(
            f"""INSERT EDGE INTO People.Knows
                SELECT x,y FROM People x , People y
                WHERE x.name = '{a}' AND y.name = '{b}'"""
        )
    return g


def test_with_cte_around_match(people):
    res = people.execute(
        """WITH pairs AS (
               SELECT x.name AS src, y.name AS dst
               FROM People x, People y MATCH x-[Knows]->y
           )
           SELECT src, COUNT(*) AS fanout FROM pairs GROUP BY src"""
    )
    got = {r["src"]: r["fanout"] for r in res.collect()}
    assert got == {"Alice": 1, "Bob": 2}


def test_with_multiple_ctes_chained(people):
    res = people.execute(
        """WITH pairs AS (
               SELECT x.id AS src_id, y.id AS dst_id
               FROM People x, People y MATCH x-[Knows]->y
           ), hub (hub_id, fanout) AS (
               SELECT src_id, COUNT(*) FROM pairs GROUP BY src_id
           )
           SELECT p.name AS name, h.fanout AS fanout
           FROM People p JOIN hub h ON p.id = h.hub_id
           WHERE h.fanout >= 2"""
    )
    rows = res.collect()
    assert [(r["name"], r["fanout"]) for r in rows] == [("Bob", 2)]


def test_cte_is_statement_scoped(people):
    people.execute(
        """WITH tmp AS (SELECT p.name FROM People p)
           SELECT COUNT(*) AS n FROM tmp"""
    )
    with pytest.raises(Exception):
        people.execute("SELECT * FROM tmp").collect()


def test_cte_string_literal_with_comma_and_paren(people):
    # masked parsing: commas/parens inside literals must not split CTEs
    res = people.execute(
        """WITH tagged AS (
               SELECT p.name AS name, 'x,(y' AS tag FROM People p
           )
           SELECT COUNT(*) AS n FROM tagged WHERE tag = 'x,(y'"""
    )
    assert res.first()["n"] == 4


def test_recursive_cte_transitive_closure(people):
    # reference parity: bfsPath is a generated recursive CTE
    # (DeployScriptTemplate.cs:208-341)
    res = people.execute(
        """WITH edges AS (
               SELECT x.id AS src, y.id AS dst
               FROM People x, People y MATCH x-[Knows]->y
           ), reach (root, node) AS (
               SELECT e.src, e.dst FROM edges e WHERE e.src = 1
               UNION ALL
               SELECT r.root, e.dst
               FROM reach r JOIN edges e ON e.src = r.node
           )
           SELECT node FROM reach ORDER BY node"""
    )
    assert [r["node"] for r in res.collect()] == [2, 3, 4]


def test_recursive_cte_generator_with_bound(people):
    res = people.execute(
        """WITH nums (n) AS (
               SELECT p.id FROM People p WHERE p.id = 1
               UNION ALL
               SELECT n + 1 FROM nums WHERE n < 5
           )
           SELECT COUNT(*) AS c, SUM(n) AS s FROM nums"""
    )
    row = res.first()
    assert (row["c"], row["s"]) == (5, 15)


def test_recursive_cte_cycle_hits_maxrecursion(spark):
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [N] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Edge",Reference:"N"] E VARBINARY(max) )"""
    )
    g.execute("INSERT INTO N(id) VALUES(1),(2)")
    g.execute(
        """INSERT EDGE INTO N.E SELECT a,b FROM N a, N b
           WHERE a.id = 1 AND b.id = 2"""
    )
    g.execute(
        """INSERT EDGE INTO N.E SELECT a,b FROM N a, N b
           WHERE a.id = 2 AND b.id = 1"""
    )
    with pytest.raises(Exception, match="MAXRECURSION"):
        g.execute(
            """WITH edges AS (
                   SELECT x.id AS src, y.id AS dst FROM N x, N y MATCH x-[E]->y
               ), walk (node) AS (
                   SELECT e.dst FROM edges e WHERE e.src = 1
                   UNION ALL
                   SELECT e.dst FROM walk w JOIN edges e ON e.src = w.node
               )
               SELECT COUNT(*) AS c FROM walk"""
        )


def test_insert_select_from_query(people):
    # bulk-ish node creation from a query: shifted ids, derived names
    people.execute(
        """INSERT INTO People (id, name)
           SELECT p.id + 100, CONCAT(p.name, '_clone')
           FROM People p WHERE p.id <= 2"""
    )
    rows = {r["id"]: r["name"] for r in people.execute("SELECT * FROM People").collect()}
    assert rows[101] == "Alice_clone" and rows[102] == "Bob_clone"
    assert len(rows) == 6
    # gids contiguous with the id-based convention: unique, monotone in id
    gids = {
        r["id"]: r["GlobalNodeId"]
        for r in people.nodes["People"].collect()
    }
    assert len(set(gids.values())) == 6
    assert gids[102] - gids[101] == 1


def test_insert_select_via_cte_and_match(people):
    # WITH + INSERT ... SELECT: materialize 2-hop targets as new nodes
    people.execute(
        """WITH twohop AS (
               SELECT c.id AS cid, c.name AS cname
               FROM People a, People b, People c
               MATCH a-[Knows]->b-[Knows]->c
               WHERE a.name = 'Alice'
           )
           INSERT INTO People (id, name)
           SELECT cid + 200, CONCAT('reached_', cname) FROM twohop"""
    )
    names = sorted(
        r["name"]
        for r in people.execute(
            "SELECT * FROM People WHERE id > 200"
        ).collect()
    )
    assert names == ["reached_Caven", "reached_David"]


def test_insert_select_requires_nodeid(people):
    with pytest.raises(Exception, match="NodeId"):
        people.execute(
            "INSERT INTO People (name) SELECT p.name FROM People p"
        )


def test_insert_select_null_pads_missing_props(spark):
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [Thing] (
            [ColumnRole:"NodeId"] tid INT,
            [ColumnRole:"Property"] label varchar(20),
            [ColumnRole:"Property"] score float )"""
    )
    g.execute("INSERT INTO Thing (tid, label, score) VALUES (1, 'a', 0.5)")
    g.execute("INSERT INTO Thing (tid, label) SELECT t.tid + 10, t.label FROM Thing t")
    row = g.execute("SELECT * FROM Thing WHERE tid = 11").first()
    assert row["label"] == "a" and row["score"] is None
