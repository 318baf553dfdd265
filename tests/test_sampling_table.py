"""Sampling tables + optimizer histograms — the reference's per-edge
`_Sampling` table mechanism (GraphViewConnection.cs:1036-1050,
refresh 2933-2993; Statistics.cs histograms), re-expressed as
deterministic md5-bucketed samples with scaled estimates.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def g(spark):
    from graphview_spark.graph_queries import tpch_graph

    return tpch_graph(spark, "/root/testdata/sf0.01")


REFERS = "Customer.Refers"


def test_sample_is_deterministic_and_cached(g):
    s1 = g.sampling_table(REFERS, fraction=0.5)
    s2 = g.sampling_table(REFERS, fraction=0.5)
    assert s1 is s2  # cache hit
    rows = sorted((r["src"], r["edge_id"], r["sink"]) for r in s1.collect())
    fresh = sorted(
        (r["src"], r["edge_id"], r["sink"])
        for r in g.sampling_table(REFERS, fraction=0.5).collect()
    )
    assert rows == fresh
    n_total = g.edge_count(REFERS)
    n_sample = len(rows)
    assert 0 < n_sample < n_total
    # md5 bucketing: sample size within ±20% of fraction at ~1.5k edges
    assert abs(n_sample - 0.5 * n_total) / (0.5 * n_total) < 0.20


def test_estimated_statistics_close_to_exact(g):
    exact = g.edge_count(REFERS)
    stats = g.update_statistics("Customer", sample_fraction=0.5)
    est, avg_deg = stats[REFERS]
    assert abs(est - exact) / exact < 0.20
    # the estimate landed in the planner cache (no exact scan happened)
    assert g.edge_count(REFERS) == est
    # refreshing without a fraction restores the exact count
    g.update_statistics("Customer")
    assert g.edge_count(REFERS) == exact


def test_update_statistics_matches_gate_query(g, spark):
    """update_statistics(sample_fraction=...) must serve EXACTLY the
    estimate the oracle-gated stats_sampled_degree query computes
    distributedly — same sample, same 1/fraction scaling — tying the
    planner-cache path to the driver-gated deterministic-sample
    contract."""
    from graphview_spark.graph_queries import (
        STATS_SAMPLE_FRACTION,
        q_stats_sampled_degree,
    )

    row = q_stats_sampled_degree(spark, "/root/testdata/sf0.01").first()
    stats = g.update_statistics(
        "Customer", sample_fraction=STATS_SAMPLE_FRACTION)
    est, _avg = stats[REFERS]
    assert est == row["est_edges"]
    g.update_statistics("Customer")  # restore exact counts for other tests


def test_histogram_buckets_cover_and_sum(g):
    hist = g.edge_histogram(REFERS, buckets=16, fraction=0.5).collect()
    assert 1 <= len(hist) <= 16
    est_total = sum(r["est_edges"] for r in hist)
    exact = g.edge_count(REFERS)
    assert abs(est_total - exact) / exact < 0.25
    for r in hist:
        assert r["lo"] <= r["hi"]
        assert r["est_edges"] > 0


def test_dml_invalidates_sample(spark):
    from graphview_spark.graph import GraphDatabase

    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [P](
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Edge", Reference:"P"] E VARBINARY(max))"""
    )
    g.execute("INSERT INTO P(id) VALUES (1),(2),(3)")
    g.execute("INSERT EDGE INTO P.E SELECT a, b FROM P a, P b "
              "WHERE a.id = 1 AND b.id = 2")
    s1 = g.sampling_table("P.E", fraction=1.0)
    assert s1.count() == 1
    g.execute("INSERT EDGE INTO P.E SELECT a, b FROM P a, P b "
              "WHERE a.id = 2 AND b.id = 3")
    s2 = g.sampling_table("P.E", fraction=1.0)
    assert s2 is not s1  # DML invalidated the cached sample
    assert s2.count() == 2


def test_truncate_invalidates_sample(spark):
    from graphview_spark.graph import GraphDatabase

    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [Q](
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Edge", Reference:"Q"] E VARBINARY(max))"""
    )
    g.execute("INSERT INTO Q(id) VALUES (1),(2)")
    g.execute("INSERT EDGE INTO Q.E SELECT a, b FROM Q a, Q b "
              "WHERE a.id = 1 AND b.id = 2")
    assert g.sampling_table("Q.E", fraction=1.0).count() == 1
    g.execute("TRUNCATE TABLE Q")
    assert g.sampling_table("Q.E", fraction=1.0).count() == 0


def test_truncate_guard_ignores_sampled_estimate(spark):
    """A small edge table can sample 0 rows, caching estimate 0 — the
    TRUNCATE incoming-edge guard must re-count exactly instead of
    letting the 0 estimate authorize truncation with dangling edges."""
    from graphview_spark.graph import GraphDatabase, GraphViewError

    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [A](
            [ColumnRole:"NodeId"] id INT )"""
    )
    g.execute(
        """CREATE TABLE [B](
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Edge", Reference:"A"] E VARBINARY(max))"""
    )
    g.execute("INSERT INTO A(id) VALUES (1)")
    g.execute("INSERT INTO B(id) VALUES (1)")
    g.execute("INSERT EDGE INTO B.E SELECT b, a FROM B b, A a "
              "WHERE b.id = 1 AND a.id = 1")
    # 1 edge at fraction 1e-3: the deterministic sample keeps 0 rows,
    # so the cached count is the estimate 0 — exactly the trap
    stats = g.update_statistics("B", sample_fraction=0.001)
    assert stats["B.E"][0] == 0  # the estimate really is 0
    with pytest.raises(GraphViewError, match="incoming edge"):
        g.truncate_table("A")  # guard re-counts exactly: 1 edge


def test_shadowed_counts_forward_all_mutators(spark):
    """__delitem__ / update() / setdefault() must forward invalidation
    to the sampling-table shadow like pop/clear/__setitem__ do."""
    from graphview_spark.graph import _ShadowedCounts

    shadow = {"k": "sample", "j": "sample2"}
    c = _ShadowedCounts(shadow)
    dict.__setitem__(c, "k", 5)
    dict.__setitem__(c, "j", 7)
    c.estimated.add("k")
    del c["k"]
    assert "k" not in shadow and "k" not in c.estimated
    c.update({"j": 9})
    assert "j" not in shadow and c["j"] == 9
    shadow["x"] = "sample3"
    assert c.setdefault("x", 1) == 1
    assert "x" not in shadow


def test_bad_fraction_rejected(g):
    from graphview_spark.graph import GraphViewError

    with pytest.raises(GraphViewError, match="fraction"):
        g.sampling_table(REFERS, fraction=0.0)
    with pytest.raises(GraphViewError, match="fraction"):
        g.sampling_table(REFERS, fraction=1.5)


def test_fraction_below_resolution_rejected(g):
    from graphview_spark.graph import GraphViewError

    with pytest.raises(GraphViewError, match="resolution"):
        g.sampling_table(REFERS, fraction=1e-7)


def test_lazy_edge_count_keeps_sample(g):
    """Populating the count cache lazily is not a data change — it must
    not evict a freshly built sampling table."""
    s1 = g.sampling_table(REFERS, fraction=0.5)
    g._edge_counts.clear()     # simulate a cold count cache
    s1b = g.sampling_table(REFERS, fraction=0.5)  # rebuilt (clear forwards)
    g.edge_count(REFERS)       # lazy populate
    assert g.sampling_table(REFERS, fraction=0.5) is s1b
