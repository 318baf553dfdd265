"""Scale-ratio bench: time a query subset at a generated SF dir and
append per-query wall seconds to a JSON log — the evidence behind
SCALECHECK's sf1/sf0.1 ratios (VERDICT r7 "What's missing #2").

Usage: python tools/scale_bench.py <sf_dir> <tag> [query ...]
Appends {"tag", "query", "sec", "rows"} lines to .testdata/scale_log.jsonl
(unbuffered, so a hung query is visible and partial runs are kept).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "sketch_cms_counts", "sketch_cms_union", "text_dup_spans",
    "dedup_simhash", "sim_topk", "pipeline_perplexity_bigram",
    "dedup_embed_lsh", "graph_betweenness_bfs", "graph_scc_peel",
    "graph_scc",
]
LOG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".testdata", "scale_log.jsonl")


def main() -> None:
    sf_dir = sys.argv[1]
    tag = sys.argv[2]
    names = sys.argv[3:] or DEFAULT_QUERIES
    import __spark_entry__ as entry
    from bench import provenance
    from graphview_spark.session import get_spark

    spark = get_spark("scalebench")
    stamp = provenance()
    qs = dict(entry.queries())
    qs.update(entry.extra_queries())
    qs[names[0]](spark, sf_dir).limit(1).collect()  # warmup
    with open(LOG, "a") as fh:
        for name in names:
            best, rows = float("inf"), 0
            for _ in range(2):
                t0 = time.time()
                rows = qs[name](spark, sf_dir).count()
                best = min(best, time.time() - t0)
            rec = {"tag": tag, "query": name,
                   "sec": round(best, 2), "rows": rows, **stamp}
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(rec, file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
