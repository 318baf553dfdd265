"""F1 people_knows — the reference's InsAndDelTutorial end-to-end
(GraphViewTutorial/InsAndDelTutorial.cs:14-161, FIXTURES.md F1)."""

from __future__ import annotations

import pytest

from graphview_spark.graph import GraphDatabase, GraphViewError


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


def test_two_hop_match(people):
    res = people.execute(
        """SELECT C.* FROM People A, People B, People C
           MATCH A-[Knows]->B-[Knows]->C
           WHERE A.name = 'Alice'"""
    )
    names = sorted(r["name"] for r in res.collect())
    assert names == ["Caven", "David"]


def test_one_hop_all_edges(people):
    res = people.execute(
        """SELECT x.name as name1, y.name as name2 FROM People x, People y
           MATCH x-[Knows]->y"""
    )
    pairs = sorted((r["name1"], r["name2"]) for r in res.collect())
    assert pairs == [("Alice", "Bob"), ("Bob", "Caven"), ("Bob", "David")]


def test_delete_edge_then_remaining(people):
    people.execute(
        """DELETE EDGE [x]-[Knows]->[y]
           FROM People as x, People as y
           WHERE y.name='Bob' or y.name = 'Caven'"""
    )
    res = people.execute(
        """SELECT x.name as name1, y.name as name2 FROM People x, People y
           MATCH x-[Knows]->y"""
    )
    pairs = sorted((r["name1"], r["name2"]) for r in res.collect())
    assert pairs == [("Bob", "David")]


def test_delete_node_guards_connected(people):
    people.execute(
        """DELETE EDGE [x]-[Knows]->[y]
           FROM People as x, People as y
           WHERE y.name='Bob' or y.name = 'Caven'"""
    )
    # Bob->David edge remains; tutorial: 'you can not delete a node with
    # edge linked to it' — Bob and David survive, Alice and Caven go.
    people.execute(
        "DELETE NODE FROM People WHERE People.name <> 'Bob' and People.name <> 'David'"
    )
    names = sorted(r["name"] for r in people.execute("SELECT * FROM [People]").collect())
    assert names == ["Bob", "David"]
    # delete remaining edge, then everything can be deleted
    people.execute("DELETE EDGE [x]-[Knows]->[y] FROM People as x, People as y")
    people.execute("DELETE NODE FROM People")
    assert people.execute("SELECT * FROM [People]").count() == 0


def test_delete_node_raises_on_connected(people):
    # Bob has edges; the reference throws '...still has/have ingoing or
    # outdoing edge(s)' (TranslateDataModificationVisitor.cs:2164-2179)
    with pytest.raises(GraphViewError, match="ingoing or outdoing"):
        people.execute("DELETE NODE FROM People WHERE People.name = 'Bob'")
    # atomicity: nothing was deleted
    assert people.execute("SELECT * FROM People").count() == 4
    # a bare DELETE NODE FROM People matches connected nodes too -> raises
    with pytest.raises(GraphViewError):
        people.execute("DELETE NODE FROM People")


def test_update_node_properties(people):
    people.execute("UPDATE People SET name = 'Bobby' WHERE People.name = 'Bob'")
    names = sorted(
        r["name"] for r in people.execute("SELECT * FROM People").collect()
    )
    assert names == ["Alice", "Bobby", "Caven", "David"]
    # expression referencing another column + no WHERE (all rows)
    people.execute("UPDATE People SET id = id + 100")
    ids = sorted(r["id"] for r in people.execute("SELECT * FROM People").collect())
    assert ids == [101, 102, 103, 104]
    # the graph structure is untouched: Bobby still knows Caven and David
    res = people.execute(
        """SELECT y.name AS name2 FROM People x, People y
           MATCH x-[Knows]->y WHERE x.name = 'Bobby'"""
    )
    assert sorted(r["name2"] for r in res.collect()) == ["Caven", "David"]


def test_update_unknown_column_raises(people):
    with pytest.raises(GraphViewError, match="unknown column"):
        people.execute("UPDATE People SET nope = 1")


def test_match_where_exists_subquery(people):
    # non-pattern node tables resolve inside a MATCH statement's WHERE
    # (reference allows arbitrary T-SQL around MATCH,
    # GraphViewParser.cs:1605-1640)
    r = people.execute(
        """SELECT y.name AS n FROM People x, People y
           MATCH x-[Knows]->y
           WHERE EXISTS (SELECT 1 FROM People p
                         WHERE p.name = 'Alice' AND p.id < y.id)"""
    )
    assert sorted(row["n"] for row in r.collect()) == ["Bob", "Caven", "David"]


def test_match_qualified_join_in_from(people):
    # JOIN ... ON between a pattern table and a plain table
    # (WTableReference.cs:371-431 passthrough)
    r = people.execute(
        """SELECT x.name AS a, y.name AS b, o.name AS same_id
           FROM People x, People y LEFT JOIN People o ON o.id = x.id
           MATCH x-[Knows]->y"""
    )
    rows = sorted((row["a"], row["b"], row["same_id"]) for row in r.collect())
    assert rows == [
        ("Alice", "Bob", "Alice"),
        ("Bob", "Caven", "Bob"),
        ("Bob", "David", "Bob"),
    ]


def test_degree_columns_in_dialect(people):
    # reserved InDegree/OutDegree output columns (GraphViewKeywords.cs:40-49)
    r = people.execute(
        """SELECT x.name AS n, x.OutDegree AS outd, x.InDegree AS ind
           FROM People x, People y MATCH x-[Knows]->y"""
    )
    rows = sorted({(row["n"], row["outd"], row["ind"]) for row in r.collect()})
    assert rows == [("Alice", 1, 0), ("Bob", 2, 1)]
    r = people.execute(
        """SELECT DISTINCT x.name AS n FROM People x, People y
           MATCH x-[Knows]->y WHERE x.OutDegree >= 2"""
    )
    assert [row["n"] for row in r.collect()] == ["Bob"]


def test_degree_cache_invalidates_on_dml(people):
    # degrees are materialized on first use (the reference stores them
    # as columns); a DML rebind of the edge DF must be a cache miss
    before = {
        r["GlobalNodeId"]: r["out_degree"]
        for r in people.out_degree("People").collect()
    }
    # cache hit: identical object back for the same graph state
    assert people.out_degree("People") is people.out_degree("People")
    people.execute(
        "INSERT EDGE INTO People.Knows SELECT a, b FROM People a, People b "
        "WHERE a.name = 'Alice' AND b.name = 'Alice'"
    )
    after = {
        r["GlobalNodeId"]: r["out_degree"]
        for r in people.out_degree("People").collect()
    }
    nodes = {
        r["name"]: r["GlobalNodeId"] for r in people.nodes["People"].collect()
    }
    assert after[nodes["Alice"]] == before[nodes["Alice"]] + 1


def test_degree_columns_in_plain_sql(people):
    # the reference stores degrees as physical columns, so a plain SELECT
    # (no MATCH) can read them (GraphViewParser.cs:1041-1131)
    r = people.execute(
        "SELECT name, InDegree, OutDegree FROM People WHERE OutDegree > 0"
    )
    rows = sorted((x["name"], x["InDegree"], x["OutDegree"]) for x in r.collect())
    assert rows == [("Alice", 0, 1), ("Bob", 1, 2)]


def test_degrees(people):
    outd = {
        r["GlobalNodeId"]: r["out_degree"]
        for r in people.out_degree("People").collect()
    }
    nodes = {
        r["name"]: r["GlobalNodeId"] for r in people.nodes["People"].collect()
    }
    assert outd[nodes["Alice"]] == 1
    assert outd[nodes["Bob"]] == 2
    ind = {
        r["GlobalNodeId"]: r["in_degree"]
        for r in people.in_degree("People").collect()
    }
    assert ind[nodes["Bob"]] == 1
    assert nodes["Alice"] not in ind


def test_global_node_id_scheme(people):
    t = people.catalog.table("People")
    gids = [r["GlobalNodeId"] for r in people.nodes["People"].collect()]
    base = t.table_id << 48
    assert all(gid > base for gid in gids)
    assert len(set(gids)) == 4


def test_bare_qualified_select_outputs_bare_name(people):
    # T-SQL: SELECT C.name outputs column `name`, not a prefixed name
    res = people.execute(
        "SELECT B.name FROM People A, People B MATCH A-[Knows]->B "
        "WHERE A.name = 'Alice'"
    )
    assert res.columns == ["name"]
