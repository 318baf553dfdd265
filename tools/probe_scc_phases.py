"""Phase breakdown for graph_scc at a given SF dir: wraps the
strategy verdict, trim, FB fixpoint and closure helpers with timers so
the 65 s sf1 reading decomposes into named phases.

Usage: python tools/probe_scc_phases.py /root/repo/.testdata/sf1
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import graphview_spark.algorithms as A
from graphview_spark.session import get_spark

CALLS: dict[str, list[float]] = {}


def wrap(name: str):
    orig = getattr(A, name)

    def timed(*a, **k):
        t0 = time.time()
        try:
            return orig(*a, **k)
        finally:
            CALLS.setdefault(name, []).append(time.time() - t0)

    setattr(A, name, timed)


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark("probe-scc")
    for n in ("_closure_mass_doomed", "_closure_mass_estimate",
              "_scc_trim", "_scc_peel_rounds", "_shortcut_closure",
              "_propagate_fb", "_scc_peel", "_scc_from_closure"):
        if hasattr(A, n):
            wrap(n)
    t0 = time.time()
    n = A.q_graph_scc(spark, sf_dir).count()
    total = time.time() - t0
    print(f"total {total:.2f}s rows={n}")
    for name, times in sorted(CALLS.items()):
        print(f"  {name}: n={len(times)} sum={sum(times):.2f}s "
              f"each={[round(t, 2) for t in times[:12]]}")


if __name__ == "__main__":
    main()
