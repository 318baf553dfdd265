"""Head-to-head bigram tokenize shapes at a given SF (noop sink).

Shapes:
  A. staged projected _w column (pre-r12b shape)
  B. eval_once + inner per-position transform lambda (interpreted HOF)
  C. eval_once + arrays_zip(slice, slice) (no per-position lambda)
  D. plain unigram explode(split) baseline

Usage: python tools/probe_bigram3.py <sf_dir> [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graphview_spark.session import get_spark
from graphview_spark.operators import eval_once
from graphview_spark.operators.dedup import read_spread


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
    print(f"{label:44s} {best:7.2f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return best


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("probe_bigram3")
    docs = read_spread(spark, sf_dir, "documents", "doc_id")
    docs.limit(1).collect()

    # D baseline
    uni = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    timed(spark, "D. unigram explode(split)", lambda: noop(uni), reps)

    # A staged column
    w = F.col("_w")
    bigsA = (
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
    timed(spark, "A. staged _w + transform lambda", lambda: noop(bigsA), reps)

    # B eval_once + transform
    bg_arrB = eval_once(
        F.split("text", " "),
        lambda ww: F.when(
            F.size(ww) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(ww) - 1),
                lambda i: F.struct(
                    F.element_at(ww, i).alias("prev"),
                    F.element_at(ww, i + 1).alias("cur"),
                ),
            ),
        ),
    )
    bigsB = (
        docs.select("doc_id", F.explode(bg_arrB).alias("bg"))
        .select("doc_id", F.col("bg.prev").alias("prev"),
                F.col("bg.cur").alias("cur"))
    )
    timed(spark, "B. eval_once + transform lambda", lambda: noop(bigsB), reps)

    # C eval_once + arrays_zip(slice, slice)
    bg_arrC = eval_once(
        F.split("text", " "),
        lambda ww: F.arrays_zip(
            F.slice(ww, 1, F.size(ww) - 1),
            F.slice(ww, 2, F.size(ww) - 1),
        ),
    )
    bigsC = (
        docs.select("doc_id", F.explode(bg_arrC).alias("bg"))
        .select("doc_id", F.col("bg.0").alias("prev"),
                F.col("bg.1").alias("cur"))
    )
    timed(spark, "C. eval_once + arrays_zip(slice)", lambda: noop(bigsC), reps)

    # C2: plain arrays_zip with repeated split (no eval_once)
    w2 = F.split("text", " ")
    bg_arrC2 = F.arrays_zip(
        F.slice(w2, 1, F.size(w2) - 1),
        F.slice(w2, 2, F.size(w2) - 1),
    )
    bigsC2 = (
        docs.select("doc_id", F.explode(bg_arrC2).alias("bg"))
        .select("doc_id", F.col("bg.0").alias("prev"),
                F.col("bg.1").alias("cur"))
    )
    timed(spark, "C2. arrays_zip(slice) inline split", lambda: noop(bigsC2),
          reps)

    # identity: C vs A
    dAB = bigsA.exceptAll(bigsC).count() + bigsC.exceptAll(bigsA).count()
    print("identity A vs C (exceptAll both ways):", dAB)


if __name__ == "__main__":
    main()
