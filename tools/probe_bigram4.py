"""Stage-split of the FULL zip-shape bigram query at a given SF.

Usage: python tools/probe_bigram4.py <sf_dir> [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graphview_spark.session import get_spark
from graphview_spark.operators.dedup import read_spread
from graphview_spark.plans import lazy as _lazy


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn, reps):
    best = None
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:46s} {best:7.2f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return best


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("probe_bigram4")
    docs = read_spread(spark, sf_dir, "documents", "doc_id")
    docs.limit(1).collect()

    w = F.split("text", " ")
    bg_arr = F.arrays_zip(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
    )
    bigs = (
        docs.select("doc_id", F.explode(bg_arr).alias("bg"))
        .select("doc_id", F.col("bg.0").alias("prev"),
                F.col("bg.1").alias("cur"))
    )
    timed(spark, "1. bigs noop", lambda: noop(bigs), reps)

    def cb_build():
        return _lazy.pin(
            bigs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cb")))

    t0 = time.time()
    cb = cb_build()
    print(f"{'2. cb pin (first)':46s} {time.time()-t0:7.2f}s", flush=True)
    timed(spark, "2b. cb pin (repeat)", cb_build, max(1, reps - 1))

    cc = cb.groupBy("prev").agg(F.sum("cb").alias("cc"))
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .agg(F.count_distinct("token").alias("V"))
    )
    timed(spark, "3. vocab noop", lambda: noop(vocab), reps)
    nll = F.round(
        -F.log((F.col("cb") + 1) / (F.col("cc") + F.col("V"))) * 1e6, 0
    ).cast("long")
    scored_counts = (
        cb.join(cc, "prev")
        .join(F.broadcast(vocab))
        .select("prev", "cur", nll.alias("nll"))
    )
    timed(spark, "4. scored_counts noop", lambda: noop(scored_counts), reps)
    scored = (
        bigs.join(scored_counts, ["prev", "cur"])
        .select("doc_id", "nll")
    )
    timed(spark, "5. scored join noop", lambda: noop(scored), reps)
    final = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.exp(F.sum("nll") / (F.count(F.lit(1)) * F.lit(1e6))), 4
        ).alias("perplexity"),
    )
    timed(spark, "6. final noop", lambda: noop(final), reps)
    timed(spark, "7. final count()", lambda: final.count(), reps)
    print("final explain:", flush=True)
    final.explain("formatted")


if __name__ == "__main__":
    main()
