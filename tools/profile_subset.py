"""Quick per-query timing for a named subset at sf0.1 (min-of-3).

Usage: python tools/profile_subset.py q1 q2 ...
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from graphview_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    qs = dict(entry.queries())
    qs.update(entry.extra_queries())
    # warmup
    qs[names[0]](spark, sf_dir).limit(1).collect()
    from graphview_spark.operators import dedup as _dedup

    out = {}
    for n in names:
        best = None
        for _ in range(3):
            _dedup._SIG_CACHE.clear()
            _dedup._PAIR_CACHE.clear()
            t0 = time.time()
            qs[n](spark, sf_dir).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[n] = round(best, 3)
        print(n, out[n], flush=True)
    print(out)


if __name__ == "__main__":
    main()
