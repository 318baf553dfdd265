"""Dump .explain("formatted") for named queries to plans/r<N>/.

Usage: [GV_PLANS_DIR=r13] python tools/explain_dump.py <suffix> [query ...]

Writes plans/<GV_PLANS_DIR>/<query>_<suffix>.txt for each named query (default:
every registered query). ``suffix`` is typically ``before`` or
``after``. Plans are built under lazy_plans() so checkpoint/pin call
sites expose the full logical pipeline instead of a LogicalRDD scan —
the same discipline as tools/plan_audit.py.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(
    _REPO, "plans", os.environ.get("GV_PLANS_DIR", "r13"))


def main() -> None:
    import __spark_entry__ as entry
    from contextlib import redirect_stdout

    from graphview_spark.plans.lazy import lazy_plans
    from graphview_spark.session import get_spark

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from plan_audit import query_df

    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("explain_dump")
    qs = dict(entry.queries())
    qs.update(entry.extra_queries())
    if not names:
        names = sorted(qs)
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        try:
            with lazy_plans():
                df = query_df(spark, sf_dir, name, qs[name])
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
        except Exception as exc:  # driver loops needing actions, etc.
            print(f"SKIP {name}: {exc}")
            continue
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
