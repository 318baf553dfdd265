"""Property-based tests for the path-doubling closure operators —
the seminaive delta composition's exactness argument (path splitting:
only last-round-fresh pairs compose) is the subtlest invariant in
algorithms.py, so it gets randomized adversarial coverage against a
brute-force Python reachability/shortest-distance reference."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=25,
)

prop_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _brute_closure(edges):
    """Floyd-Warshall-ish reference: reachability pairs + min-plus
    distances (dist >= 1; self-pairs only via actual cycles)."""
    import itertools

    nodes = sorted({x for e in edges for x in e})
    INF = float("inf")
    dist = {(a, b): INF for a in nodes for b in nodes}
    for s, t in edges:
        dist[(s, t)] = 1
    for k, a, b in itertools.product(nodes, nodes, nodes):
        if dist[(a, k)] + dist[(k, b)] < dist[(a, b)]:
            dist[(a, b)] = dist[(a, k)] + dist[(k, b)]
    reach = {(a, b) for (a, b), d in dist.items() if d < INF}
    dmap = {(a, b): int(d) for (a, b), d in dist.items() if d < INF}
    return reach, dmap


@given(edges_strategy)
@prop_settings
def test_shortcut_closure_matches_bruteforce(spark, raw_edges):
    from graphview_spark.algorithms import _shortcut_closure

    edges = sorted(set(raw_edges))
    ref_reach, _ = _brute_closure(edges)
    e = spark.createDataFrame(edges, "src long, sink long")
    got, complete = _shortcut_closure(e, budget_factor=10 ** 6)
    assert complete
    assert {(r["src"], r["sink"]) for r in got.collect()} == ref_reach


@given(edges_strategy)
@prop_settings
def test_distance_closure_matches_bruteforce(spark, raw_edges):
    from graphview_spark.algorithms import _distance_closure

    edges = sorted(set(raw_edges))
    _, ref_dist = _brute_closure(edges)
    e = spark.createDataFrame(edges, "src long, sink long")
    got, complete = _distance_closure(e, budget_factor=10 ** 6)
    assert complete
    assert {
        (r["src"], r["sink"]): r["dist"] for r in got.collect()
    } == ref_dist


@given(edges_strategy)
@prop_settings
def test_scc_matches_bruteforce(spark, raw_edges):
    """End-to-end SCC (either strategy — the tiny budget_factor pushes
    dense examples onto the peel path) vs mutual-reach reference."""
    from graphview_spark.algorithms import strongly_connected_components

    edges = sorted(set(raw_edges))
    ref_reach, _ = _brute_closure(edges)
    nodes = sorted({x for e in edges for x in e})
    ref_scc = {
        a: min(
            [a] + [b for b in nodes
                   if (a, b) in ref_reach and (b, a) in ref_reach]
        )
        for a in nodes
    }
    ndf = spark.createDataFrame([(n,) for n in nodes], "id long")
    e = spark.createDataFrame(edges, "src long, sink long")
    got = {
        r["id"]: r["scc"]
        for r in strongly_connected_components(ndf, e, budget_factor=2)
        .collect()
    }
    assert got == ref_scc
