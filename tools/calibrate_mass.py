"""Calibrate the closure-mass verdict on the Refers-derived graphs.

Prints, for a given SF dir and graph variant, the forward and reverse
256-seed mass estimates (as multiples of the 32×|E| budget), the
out-degree distribution (the evidence for/against degree-stratified
seeding), and — with --true — the exact closure mass from a full
multi-source BFS (expensive; minutes at sf3).

Usage: python tools/calibrate_mass.py <sf_dir> [scc|closeness] [--true]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_graph(spark, sf_dir: str, variant: str):
    """The two calibration graphs SCALECHECK's round-9 numbers used:
    ``scc`` = Refers + deterministic back-edges (q_graph_scc's frame),
    ``closeness`` = the plain Refers tree (q_graph_closeness's)."""
    from graphview_spark.graph_queries import tpch_graph

    g = tpch_graph(spark, sf_dir)
    key = g.nodes["Customer"].select("GlobalNodeId", "c_custkey")
    refers = (
        g.edge_with_id("Customer.Refers")
        .join(key.select(F.col("GlobalNodeId").alias("src"),
                         F.col("c_custkey").alias("src_key")), "src")
        .join(key.select(F.col("GlobalNodeId").alias("sink"),
                         F.col("c_custkey").alias("sink_key")), "sink")
        .select(F.col("src_key").alias("src"),
                F.col("sink_key").alias("sink"))
    )
    if variant == "closeness":
        return refers
    return refers.unionByName(
        refers.filter(F.col("sink") % 5 == 0)
        .select(F.col("sink").alias("src"), F.col("src").alias("sink"))
    )


def true_mass(e, max_depth: int = 64) -> int:
    """Exact closure pair count (cycle self-pairs included) via
    multi-source BFS — every node is its own seed; O(mass) rows."""
    settled = e.select(F.col("src").alias("s"), F.col("src").alias("id"))
    settled = settled.distinct().localCheckpoint(eager=True)
    frontier = settled
    mass = 0
    for _ in range(max_depth):
        nxt = (
            frontier.join(e, frontier["id"] == e["src"])
            .select("s", F.col("sink").alias("id"))
            .distinct()
            .join(settled, ["s", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        c = nxt.count()
        if c == 0:
            break
        mass += c
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    cyc = (
        settled.join(e, settled["id"] == e["src"])
        .filter(F.col("sink") == F.col("s"))
        .select("s").distinct().count()
    )
    return mass + cyc


def main() -> None:
    sf_dir = sys.argv[1]
    variant = sys.argv[2] if len(sys.argv) > 2 else "scc"
    want_true = "--true" in sys.argv

    import graphview_spark.algorithms as A
    from bench import provenance
    from graphview_spark.session import get_spark

    spark = get_spark("calibrate")
    e = build_graph(spark, sf_dir, variant).distinct()
    e = e.localCheckpoint(eager=True)
    n_e = e.count()
    budget = A._PEEL_BUDGET_FACTOR * n_e

    deg = e.groupBy("src").count()
    deg_stats = deg.agg(
        F.max("count").alias("max"),
        F.expr("percentile_approx(count, 0.99)").alias("p99"),
        F.expr("percentile_approx(count, 0.5)").alias("p50"),
    ).first().asDict()

    fwd = A._closure_mass_estimate(e, budget)
    rev = A._closure_mass_estimate(
        e.select(F.col("sink").alias("src"), F.col("src").alias("sink")),
        budget)

    out = {
        "sf_dir": sf_dir, "variant": variant, "edges": n_e,
        "budget": budget, "out_degree": deg_stats,
        "fwd_x_budget": round(fwd / budget, 3),
        "rev_x_budget": round(rev / budget, 3),
        "max_x_budget": round(max(fwd, rev) / budget, 3),
        "skip_fraction": A._MASS_SKIP_FRACTION,
        "verdict": "skip" if max(fwd, rev) > A._MASS_SKIP_FRACTION * budget
        else "attempt",
        **provenance(),
    }
    if want_true:
        t = true_mass(e)
        out["true_mass"] = t
        out["true_x_budget"] = round(t / budget, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
