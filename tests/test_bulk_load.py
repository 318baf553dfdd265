"""Bulk load parity with GraphViewTutorial/BulkLoadTutorial.cs:44-100:
create node tables, bulk-load nodes and edges from delimited files, run
a 1-hop MATCH over the loaded graph."""

from __future__ import annotations

import os

import pytest

from graphview_spark.graph import GraphDatabase
from graphview_spark.sources.bulk import bulk_insert_edges, bulk_insert_nodes


@pytest.fixture()
def g(spark, tmp_path):
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [Person] (
            [ColumnRole:"NodeId"] pid INT,
            [ColumnRole:"Property"] name varchar(32),
            [ColumnRole:"Edge", Reference:"Person",
             Attributes:{since:"int"}] Follows VARBINARY(max) )"""
    )
    return g


def _write(tmp_path, name, lines):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    return p


def test_bulk_nodes_with_header(g, tmp_path):
    p = _write(tmp_path, "people.csv", [
        "pid,name", "1,Alice", "2,Bob", "3,Caven",
    ])
    n = bulk_insert_nodes(g, "Person", p)
    assert n == 3
    names = sorted(r["name"] for r in g.execute("SELECT * FROM Person").collect())
    assert names == ["Alice", "Bob", "Caven"]


def test_bulk_nodes_headerless_subset_and_order(g, tmp_path):
    """Column list drives mapping when the file has no header; missing
    properties null-pad (BulkInsert.cs column-subset behavior)."""
    p = _write(tmp_path, "people.tsv", ["Alice\t1", "Bob\t2"])
    n = bulk_insert_nodes(
        g, "Person", p, sep="\t", header=False, columns=["name", "pid"]
    )
    assert n == 2
    rows = {r["pid"]: r["name"] for r in g.execute("SELECT * FROM Person").collect()}
    assert rows == {1: "Alice", 2: "Bob"}


def test_bulk_nodes_unknown_column_raises(g, tmp_path):
    p = _write(tmp_path, "bad.csv", ["pid,nickname", "1,Al"])
    with pytest.raises(ValueError, match="not a property"):
        bulk_insert_nodes(g, "Person", p)


def test_bulk_edges_and_match(g, tmp_path):
    nodes = _write(tmp_path, "n.csv", ["pid,name", "1,Alice", "2,Bob", "3,Caven"])
    bulk_insert_nodes(g, "Person", nodes)
    edges = _write(tmp_path, "e.csv", [
        "src,dst,since", "1,2,2019", "2,3,2021", "1,3,2022",
    ])
    n = bulk_insert_edges(g, "Person", "Follows", edges)
    assert n == 3
    res = g.execute(
        """SELECT a.name AS src, b.name AS dst, e.since AS since
           FROM Person a, Person b
           MATCH a-[Follows AS e]->b"""
    )
    got = sorted((r["src"], r["dst"], r["since"]) for r in res.collect())
    assert got == [("Alice", "Bob", 2019), ("Alice", "Caven", 2022),
                   ("Bob", "Caven", 2021)]


def test_bulk_string_nodeids_distributed(spark, tmp_path):
    # non-integral NodeIds: gid assignment must stay distributed — no
    # global row_number window funneling the load through one task
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [Account] (
            [ColumnRole:"NodeId"] handle varchar(32),
            [ColumnRole:"Property"] label varchar(32) )"""
    )
    p = _write(tmp_path, "accounts.csv", [
        "handle,label", "zoe,z", "amy,a", "mia,m", "bea,b",
    ])
    n = bulk_insert_nodes(g, "Account", p)
    assert n == 4
    rows = {r["handle"]: r["GlobalNodeId"] for r in g.nodes["Account"].collect()}
    # deterministic: gids follow NodeId sort order
    ordered = sorted(rows)
    gids = [rows[h] for h in ordered]
    assert gids == sorted(gids) and len(set(gids)) == 4
    plan = g.nodes["Account"]._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # and no Python/RDD round-trip: id assignment is DataFrame-only
    assert "ExistingRDD" not in plan and "EvalPython" not in plan
    # a second load continues the sequence without collisions
    p2 = _write(tmp_path, "more.csv", ["handle,label", "ned,n"])
    bulk_insert_nodes(g, "Account", p2)
    all_gids = [r["GlobalNodeId"] for r in g.nodes["Account"].collect()]
    assert len(set(all_gids)) == 5


def test_bulk_negative_nodeid_raises(g, tmp_path):
    # a negative integral NodeId would silently land below the table's
    # 48-bit id base (possibly inside another table's id space)
    p = _write(tmp_path, "neg.csv", ["pid,name", "-5,Evil", "1,Ok"])
    with pytest.raises(Exception, match="negative NodeId"):
        bulk_insert_nodes(g, "Person", p)


def test_bulk_overflow_nodeid_raises(spark, tmp_path):
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [Big] (
            [ColumnRole:"NodeId"] bid BIGINT,
            [ColumnRole:"Property"] label varchar(32) )"""
    )
    big = (1 << 48) - 1
    p = _write(tmp_path, "big.csv", ["bid,label", f"{big},huge"])
    with pytest.raises(Exception, match="48-bit"):
        bulk_insert_nodes(g, "Big", p)


def test_bulk_edges_unresolved_raises(g, tmp_path):
    nodes = _write(tmp_path, "n.csv", ["pid,name", "1,Alice"])
    bulk_insert_nodes(g, "Person", nodes)
    edges = _write(tmp_path, "e.csv", ["src,dst,since", "1,99,2020"])
    with pytest.raises(ValueError, match="unknown node ids"):
        bulk_insert_edges(g, "Person", "Follows", edges)


def test_bulk_nodes_jsonl(g, tmp_path):
    p = _write(tmp_path, "people.jsonl", [
        '{"pid": 1, "name": "Alice"}',
        '{"pid": 2, "name": "Bob"}',
    ])
    n = bulk_insert_nodes(g, "Person", p, fmt="jsonl")
    assert n == 2
    names = sorted(
        r["name"] for r in g.execute("SELECT * FROM Person").collect()
    )
    assert names == ["Alice", "Bob"]


def test_bulk_nodes_parquet_and_edges_jsonl(g, tmp_path):
    pq = os.path.join(str(tmp_path), "people_pq")
    g.spark.createDataFrame(
        [(1, "Alice"), (2, "Bob"), (3, "Caven")], "pid int, name string"
    ).write.parquet(pq)
    assert bulk_insert_nodes(g, "Person", pq, fmt="parquet") == 3

    ej = _write(tmp_path, "follows.jsonl", [
        '{"src": 1, "dst": 2, "since": 2020}',
        '{"src": 2, "dst": 3, "since": 2021}',
    ])
    n = bulk_insert_edges(
        g, "Person", "Follows", ej, fmt="jsonl",
        src_id_col="src", sink_id_col="dst", attr_cols=["since"],
    )
    assert n == 2
    rows = g.execute(
        """SELECT A.name AS a, B.name AS b
           FROM Person A, Person B MATCH A-[Follows]->B"""
    ).collect()
    assert sorted((r["a"], r["b"]) for r in rows) == [
        ("Alice", "Bob"), ("Bob", "Caven"),
    ]


def test_bulk_unknown_format_raises(g, tmp_path):
    with pytest.raises(ValueError, match="unsupported bulk format"):
        bulk_insert_nodes(g, "Person", "x", fmt="orc-ish")


def test_update_statistics_refresh(spark):
    from graphview_spark.graph import GraphDatabase

    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [S] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Edge",Reference:"S"] E VARBINARY(max) )"""
    )
    g.execute("INSERT INTO S(id) VALUES(1),(2),(3),(4)")
    g.execute(
        "INSERT EDGE INTO S.E SELECT a,b FROM S a, S b WHERE a.id + 1 = b.id"
    )
    stats = g.update_statistics("S")
    assert stats["S"] == 4
    assert stats["S.E"] == (3, 0.75)


def test_bulk_load_custom_row_terminator(spark, tmp_path):
    """ROWTERMINATOR parity (BulkInsert.cs:156-202): load a CSV whose
    rows end with ';' instead of newlines."""
    from graphview_spark.graph import GraphDatabase
    from graphview_spark.sources.bulk import bulk_insert_nodes

    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [RT](
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Property"] name VARCHAR(20))"""
    )
    p = tmp_path / "rows.csv"
    p.write_text("1,alpha;2,beta;3,gamma;")
    n = bulk_insert_nodes(
        g, "RT", str(p), header=False, columns=["id", "name"],
        line_sep=";",
    )
    assert n == 3
    got = {(r["id"], r["name"]) for r in
           g.execute("SELECT id, name FROM RT").collect()}
    assert got == {(1, "alpha"), (2, "beta"), (3, "gamma")}
