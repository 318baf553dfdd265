"""End-to-end training-data pipeline: raw corpus → training sequences.

Composes the repo's operators the way a production run chains them —
every stage is a pure DataFrame plan, so the whole pipeline is ONE
lazily-built DAG until the final action (Catalyst sees across stage
boundaries: column pruning reaches the scan even though six operator
modules contributed plans).

    raw documents
      1. exact dedup          keep one doc per md5(text) group
      2. near-dedup           drop non-canonical members of MinHash
                              (T=0.7) duplicate clusters
      3. cross-corpus scrub   drop train docs that near-dup a held-out
                              source (train/eval leak)
      4. decontamination      drop docs sharing a 5-gram with the
                              benchmark slice
      5. quality filter       keep docs at/above the per-lang median
                              quality score
      6. split                LEAKAGE-SAFE 80/10/10: keyed on the
                              near-dup clusters from stage 2, so no
                              near-duplicate pair straddles splits;
                              keep train
      7. pack                 concat-and-chunk into 2048-token
                              sequences over 8 shards
      8. report               per-language vocabulary-size estimate of
                              the packed train set via the
                              deterministic HLL sketch (≤256 register
                              rows/language — no vocab-sized shuffle)

Run: python examples/pipeline_e2e.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def run_pipeline(spark, sf_dir: str) -> dict[str, DataFrame]:
    from graphview_spark.operators.dedup import (
        HELDOUT_SOURCES,
        MINHASH_JACCARD_T,
        N_BANDS,
        _lsh_verified_pairs,
        dedup_clusters,
        q_dedup_cross_corpus,
    )
    from graphview_spark.operators.pipeline import (
        benchmark_docs,
        decontaminate,
        pack_sequences,
    )
    from graphview_spark.operators.sampling import cluster_safe_split
    from graphview_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )
    from graphview_spark.operators.text import quality_milli_col
    from graphview_spark.session import read_table

    stages: dict[str, DataFrame] = {}
    docs = read_table(spark, sf_dir, "documents")
    stages["raw"] = docs

    # 1. exact dedup — keep min doc_id per content hash
    hashed = docs.withColumn("_h", F.md5("text"))
    canon = hashed.groupBy("_h").agg(F.min("doc_id").alias("doc_id"))
    docs = hashed.join(canon, ["_h", "doc_id"], "left_semi").drop("_h")
    stages["exact_dedup"] = docs

    # 2. near-dedup — drop non-canonical cluster members
    pairs = _lsh_verified_pairs(spark, sf_dir, N_BANDS, MINHASH_JACCARD_T)
    clusters = dedup_clusters(pairs)
    drop_near = clusters.filter(~F.col("keep")).select("doc_id")
    docs = docs.join(drop_near, "doc_id", "left_anti")
    stages["near_dedup"] = docs

    # 3. cross-corpus scrub — remove train docs leaking a held-out source
    leaked = q_dedup_cross_corpus(spark, sf_dir).select("doc_id")
    docs = docs.filter(
        ~F.col("source").isin(list(HELDOUT_SOURCES))
    ).join(leaked, "doc_id", "left_anti")
    stages["cross_scrub"] = docs

    # 4. decontamination against the benchmark slice (the operator
    #    returns a per-doc report; drop the contaminated ids)
    report = decontaminate(docs, benchmark_docs(stages["raw"]))
    dirty = report.filter(F.col("contaminated")).select("doc_id")
    docs = docs.join(dirty, "doc_id", "left_anti")
    stages["decontam"] = docs

    # 5. per-language median quality filter (broadcast per-lang medians —
    #    the tiny-dimension variant of the quantile operator's histogram)
    scored = docs.withColumn("_q", quality_milli_col(F.col("text")))
    med = scored.groupBy("lang").agg(
        F.expr("percentile(_q, 0.5)").alias("_med")
    )
    docs = (
        scored.join(F.broadcast(med), "lang")
        .filter(F.col("_q") >= F.col("_med"))
        .drop("_q", "_med")
    )
    stages["quality"] = docs

    # 6. leakage-safe deterministic split: near-dup cluster members
    #    (stage 2's clusters) land in the SAME split, so a train doc
    #    can never be a near-duplicate of an eval doc; keep train
    docs = cluster_safe_split(docs, clusters).filter(
        F.col("split") == "train")
    stages["train_split"] = docs

    # 7. pack into fixed-budget sequences
    stages["packed"] = pack_sequences(docs)

    # 8. data-card report: per-language vocabulary estimate of the
    #    train set (deterministic HLL — bounded register shuffle)
    tok = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    stages["vocab_report"] = hll_estimate(
        hll_registers(tok, ["lang"], "w"), ["lang"])
    return stages


def main() -> None:
    from graphview_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("pipeline_e2e")
    stages = run_pipeline(spark, sf_dir)
    for name, df in stages.items():
        print(f"{name:12s} {df.count():6d} rows")


if __name__ == "__main__":
    main()
