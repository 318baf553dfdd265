"""A/B: greedy (root pinned to the first FROM alias) vs the bounded
beam (root-enumerating, MaxStates=100) on the 4-edge cyclic skewed
pattern — the measurement behind PLANS.md's beam note (VERDICT r9
"What's missing #1": close the reference's last optimizer delta with
data, not argument).

Graph: one node table of N ids; four 10-regular circulant edge types
(fanout 10 in BOTH directions, so reverse expansion offers greedy no
escape); predicate C.id <= 2 (selectivity 2/N) on the alias FURTHEST
from the FROM-order root. Greedy must expand A×E1 (N×10 rows) before
the filter is ever reached; the beam roots at C and keeps every
intermediate ≤ ~2×10³.

Usage: python tools/beam_ab.py [N]   (default 20000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    import graphview_spark.matching.planner as planner
    from bench import provenance
    from graphview_spark.graph import GraphDatabase
    from graphview_spark.session import get_spark

    spark = get_spark("beam-ab")
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [T] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Edge",Reference:"T"] E1 VARBINARY(max),
            [ColumnRole:"Edge",Reference:"T"] E2 VARBINARY(max),
            [ColumnRole:"Edge",Reference:"T"] E3 VARBINARY(max),
            [ColumnRole:"Edge",Reference:"T"] E4 VARBINARY(max) )"""
    )
    ids = spark.range(1, n + 1).select(F.col("id").cast("int").alias("id"))
    g.insert_nodes_df("T", ids)
    nodes = g.nodes["T"].select("id", "GlobalNodeId").localCheckpoint()

    # E1 shifts 1..10, E2 11..20, E3 21..30; E4 complements so the
    # 4-cycle closes (s1+s2+s3 ∈ [33,60] → E4 ∈ [n-60, n-51] closes
    # sums 51..60)
    for name, s0 in (("E1", 1), ("E2", 11), ("E3", 21), ("E4", n - 60)):
        shifts = spark.range(s0, s0 + 10).select(F.col("id").alias("s"))
        pairs = (
            nodes.crossJoin(shifts)
            .select(
                F.col("GlobalNodeId").alias("src"),
                (((F.col("id") - 1 + F.col("s")) % n) + 1).alias("sink_id"),
            )
            .join(nodes.select(F.col("id").alias("sink_id"),
                               F.col("GlobalNodeId").alias("sink")),
                  "sink_id")
            .select("src", "sink")
        )
        g.insert_edges_df("T", name, pairs.localCheckpoint())

    query = """SELECT A.id AS a, B.id AS b, C.id AS c, D.id AS d
        FROM T A, T B, T C, T D
        MATCH A-[E1]->B, B-[E2]->C, C-[E3]->D, D-[E4]->A
        WHERE C.id <= 2"""

    g.execute("SELECT COUNT(*) AS n FROM T").collect()  # session warmup

    out = {"n_nodes": n, "fanout": 10, "pred_sel": round(2 / n, 6)}
    for label, min_edges in (("beam", 4), ("greedy", 10**9)):
        planner._BEAM_MIN_EDGES = min_edges
        best, rows = float("inf"), None
        for _ in range(2):
            t0 = time.time()
            rows = g.execute(query).count()
            best = min(best, time.time() - t0)
        out[label] = {"sec": round(best, 2), "rows": rows}
    out["speedup"] = round(out["greedy"]["sec"] / out["beam"]["sec"], 2)
    out.update(provenance())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
