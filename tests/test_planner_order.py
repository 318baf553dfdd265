"""Degree-aware greedy join order in the MATCH planner — the Spark analog
of the reference's AverageDegree-sorted candidate expansion
(MatchGraphInterface.cs:47-189)."""

from __future__ import annotations

import graphview_spark.matching.planner as planner
from graphview_spark.graph import GraphDatabase


def test_low_fanout_edge_joins_first(spark, monkeypatch):
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [N] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Edge",Reference:"N"] Big VARBINARY(max),
            [ColumnRole:"Edge",Reference:"N"] Small VARBINARY(max) )"""
    )
    g.execute(
        "INSERT INTO N(id) VALUES " + ",".join(f"({i})" for i in range(1, 9))
    )
    # Big: all ordered pairs (56 edges, fanout 7); Small: one edge
    g.execute("INSERT EDGE INTO N.Big SELECT x, y FROM N x, N y WHERE x.id <> y.id")
    g.execute(
        "INSERT EDGE INTO N.Small SELECT x, y FROM N x, N y "
        "WHERE x.id = 1 AND y.id = 2"
    )

    calls: list[tuple[str, str]] = []
    orig = planner._join_edge

    def spy(g_, cur, e, bound, bindings, alias_filters=None):
        calls.append((e.edge_name, e.src_alias))
        return orig(g_, cur, e, bound, bindings, alias_filters)

    monkeypatch.setattr(planner, "_join_edge", spy)
    res = g.execute(
        """SELECT A.id AS a, B.id AS b, C.id AS c
           FROM N A, N B, N C
           MATCH A-[Big]->B, A-[Small]->C, C-[Big]->B"""
    )
    n = res.count()
    # despite Big being listed first, the planner expands Small first
    # (fanout 1/8 vs 7); the final Big closes the cycle filter-style
    assert calls[0] == ("Small", "A")
    assert calls[1] == ("Big", "A")
    assert calls[2] == ("Big", "C")
    # A=1, C=2 fixed by Small; B ranges over Big(1,*) ∩ Big(2,*): 6 nodes
    assert n == 6
