"""Plan-level assertions (SURVEY §5: the analog of the reference's
GetTsqlQuery translation snapshots): filters reach the parquet scan,
columns prune, dimension joins broadcast, MATCH emits no cartesian
products, hot paths stay in whole-stage codegen."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphview_spark import relational as R
from graphview_spark.plans.inspect import plan_facts, scan_reads_only
from graphview_spark.session import read_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = R.q_pricing_summary(spark, sf_dir)
    facts = plan_facts(df)
    assert any("l_shipdate" in f for f in facts.pushed_filters), facts.pushed_filters


def test_column_pruning_reaches_scan(spark, sf_dir):
    """Q1 touches 7 of lineitem's columns; the scan must not read more."""
    df = R.q_pricing_summary(spark, sf_dir)
    assert scan_reads_only(df, {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    })


def test_dimension_joins_broadcast(spark, sf_dir):
    """Q5 shape: region/nation/supplier joins must be broadcast, and the
    plan must not produce a cartesian product."""
    df = R.q_local_supplier_volume(spark, sf_dir)
    facts = plan_facts(df)
    assert facts.n_broadcast_joins >= 3, facts
    assert facts.n_cartesian == 0


def test_match_plan_shape(spark, sf_dir):
    """2-hop MATCH compiles to equi-joins only — no cartesian products,
    no Python in the plan."""
    from graphview_spark.graph_queries import tpch_graph

    g = tpch_graph(spark, sf_dir)
    df = g.execute(
        """SELECT R.r_name AS region, COUNT(*) AS n_cust
           FROM Customer C, Nation N, Region R
           MATCH C-[FromNation]->N-[InRegion]->R
           GROUP BY R.r_name"""
    )
    facts = plan_facts(df)
    assert facts.n_joins >= 4          # 2 pattern edges = 4 equi-joins
    assert facts.n_cartesian == 0
    assert facts.n_python_evals == 0


def test_match_pushdown_filters_node_side(spark, sf_dir):
    """A single-alias WHERE predicate must appear as a Filter under the
    join, not only above it (reference AttachPredicates)."""
    from graphview_spark.graph_queries import tpch_graph
    from graphview_spark.plans.inspect import optimized_plan

    g = tpch_graph(spark, sf_dir)
    df = g.execute(
        """SELECT O.o_orderkey AS k FROM Customer C, Orders O
           MATCH C-[Placed]->O
           WHERE C.c_mktsegment = 'BUILDING'"""
    )
    plan = optimized_plan(df)
    join_pos = plan.find("Join")
    filt_pos = plan.find("BUILDING")
    assert join_pos != -1 and filt_pos != -1
    # the literal appears below (after) the topmost Join in the tree dump
    assert filt_pos > join_pos


def test_relational_surface_stays_jvm_side(spark, sf_dir):
    """No rel_* query may fall out of the JVM into Python evaluation,
    and each finalized plan runs inside whole-stage codegen. (Codegen
    spans only appear once AQE finalizes, so execute first.)"""
    for name, fn in R.QUERIES.items():
        df = fn(spark, sf_dir)
        df.collect()                      # finalize the adaptive plan
        facts = plan_facts(df)
        assert facts.n_python_evals == 0, name
        assert facts.n_codegen_spans > 0, name


def test_scalar_subquery_broadcasts(spark, sf_dir):
    df = R.q_scalar_subquery(spark, sf_dir)
    facts = plan_facts(df)
    assert facts.n_broadcast_joins >= 1
    assert facts.n_cartesian == 0
