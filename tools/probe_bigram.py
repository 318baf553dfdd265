"""Stage-split probe for pipeline_perplexity_bigram (r12 watch item:
13.8x at 10x data). Times each stage with the noop sink, min-of-N.

Usage: python tools/probe_bigram.py <sf_dir> [reps]
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
    print(f"{label:40s} {best:7.2f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return best


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("probe_bigram")

    def build_bigs():
        docs = read_spread(spark, sf_dir, "documents", "doc_id")
        w = F.col("_w")
        return docs, (
            docs.select("doc_id", F.split("text", " ").alias("_w"))
            .filter(F.size(w) >= 2)
            .select(
                "doc_id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size(w) - 1),
                        lambda i: F.struct(
                            F.element_at(w, i).alias("prev"),
                            F.element_at(w, i + 1).alias("cur"),
                        ),
                    )
                ).alias("bg"),
            )
            .select("doc_id", F.col("bg.prev").alias("prev"),
                    F.col("bg.cur").alias("cur"))
        )

    docs, bigs_raw = build_bigs()
    # warmup scan
    docs.limit(1).collect()

    timed(spark, "1. tokenize+bigrams -> noop", lambda: noop(bigs_raw), reps)

    def pin_cost():
        d, b = build_bigs()
        p = b.localCheckpoint(eager=True)
        p.unpersist()

    timed(spark, "2. pin(bigs) materialize", pin_cost, reps)

    bigs = _lazy.pin(bigs_raw)

    timed(spark, "3. cb agg from pinned bigs",
          lambda: noop(bigs.groupBy("prev", "cur").agg(
              F.count(F.lit(1)).alias("cb"))), reps)

    cb = _lazy.pin(
        bigs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cb")))
    cc = cb.groupBy("prev").agg(F.sum("cb").alias("cc"))
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .agg(F.count_distinct("token").alias("V"))
    )
    timed(spark, "4. vocab agg", lambda: noop(vocab), reps)
    nll = F.round(
        -F.log((F.col("cb") + 1) / (F.col("cc") + F.col("V"))) * 1e6, 0
    ).cast("long")
    scored_counts = (
        cb.join(cc, "prev")
        .join(F.broadcast(vocab))
        .select("prev", "cur", nll.alias("nll"))
    )
    scored = (
        bigs.join(scored_counts, ["prev", "cur"])
        .select("doc_id", "nll")
    )
    final = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.exp(F.sum("nll") / (F.count(F.lit(1)) * F.lit(1e6))), 4
        ).alias("perplexity"),
    )
    timed(spark, "5. scored join + doc agg (from pins)",
          lambda: noop(final), reps)

    import __spark_entry__ as entry
    qs = dict(entry.queries()); qs.update(entry.extra_queries())
    timed(spark, "6. FULL query (count)",
          lambda: qs["pipeline_perplexity_bigram"](spark, sf_dir).count(),
          reps)
    print("cb rows:", cb.count(), " docs parts:",
          docs.rdd.getNumPartitions())


if __name__ == "__main__":
    main()
