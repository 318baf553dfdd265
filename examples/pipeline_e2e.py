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
      4. decontamination      TWO-TIER: an HLL-auto-sized Bloom bitmap
                              (≥128 KiB) of the
                              benchmark's 5-grams pre-screens every doc
                              with broadcast-only probes (no false
                              negatives, so the definitely-clean
                              majority exits without joining anything);
                              the exact gram join then confirms ONLY
                              the Bloom-flagged sliver, discarding the
                              bitmap's false positives
      5. quality filter       keep docs at/above the per-lang median
                              quality score
      6. split                LEAKAGE-SAFE 80/10/10: keyed on the
                              near-dup clusters from stage 2, so no
                              near-duplicate pair straddles splits;
                              keep train
      6b. token budget        weighted PPS subsample (inclusion ∝
                              n_chars): cap docs/lang while keeping
                              the token mass long documents carry
      7. pack                 concat-and-chunk into 2048-token
                              sequences over 8 shards
      8. report               per-language vocabulary-size estimate of
                              the packed train set via the
                              deterministic HLL sketch (≤256 register
                              rows/language — no vocab-sized shuffle),
                              plus length percentiles from the bounded
                              HDR histogram

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

    # 4. decontamination, two-tier: Bloom pre-screen (broadcast-only
    #    probes against the 128 KiB benchmark bitmap — at 100 TB the
    #    clean majority never joins anything), exact gram join only on
    #    the flagged sliver (kills the bitmap's false positives)
    from graphview_spark.operators.pipeline import DECONTAM_N, _word_ngrams
    from graphview_spark.operators.sketch import (
        bloom_auto_m,
        bloom_probe,
        bloom_words,
    )

    from graphview_spark.plans.lazy import pin

    bench = benchmark_docs(stages["raw"])
    # pinned (ADVICE r11): both the auto-sizing HLL probe and the
    # bitmap build consume this explosion — unpinned, the gram job
    # runs twice per pipeline
    bench_grams = pin(bench.select(
        F.explode(_word_ngrams(F.col("text"), DECONTAM_N)).alias("g")))
    # bitmap sized from the HLL gram-count estimate (never below the
    # 128 KiB default) so a growing benchmark can't silently saturate
    # the pre-screen into flagging the whole corpus
    m_bits = bloom_auto_m(bench_grams, "g")
    bitmap = bloom_words(bench_grams, [], "g", m_bits=m_bits)
    doc_grams = docs.select(
        "doc_id", F.explode(_word_ngrams(F.col("text"), DECONTAM_N)).alias("g"))
    suspects = (
        bloom_probe(doc_grams, ["doc_id"], "g", bitmap, m_bits=m_bits)
        .filter(F.col("present")).select("doc_id").distinct()
    )
    report = decontaminate(
        docs.join(suspects, "doc_id", "left_semi"), bench)
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

    # 6b. token-budget cap: at most 200 docs per language, inclusion
    #     probability ∝ n_chars (sequential Poisson — long docs carry
    #     the tokens, so a token-budgeted subcorpus overrepresents
    #     them in exact proportion); map-side top-k, deterministic
    from graphview_spark.operators.sampling import weighted_sample

    docs = weighted_sample(docs, "doc_id", "n_chars", "lang", k=200).drop(
        "smp_rank")
    stages["token_budget"] = docs

    # 7. pack into fixed-budget sequences
    stages["packed"] = pack_sequences(docs)

    # 8. data-card report: per-language vocabulary estimate of the
    #    train set (deterministic HLL — bounded register shuffle)
    tok = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    stages["vocab_report"] = hll_estimate(
        hll_registers(tok, ["lang"], "w"), ["lang"])

    # 8b. length percentiles of the final train set from the bounded
    #     HDR histogram (p50/p90/p99 in micro-units — the data-card
    #     stat plain averages hide)
    from graphview_spark.operators.sketch import hdr_buckets, hdr_quantiles

    stages["length_report"] = hdr_quantiles(
        hdr_buckets(docs, ["lang"], "n_chars"), ["lang"])

    # 8c. pipeline-exit drift check: PSI between the RAW corpus's and
    #     the final train set's per-language length distributions —
    #     "how much did cleaning + sampling shift what the model will
    #     see?" (large psi_micro on a language = the pipeline reshaped
    #     it, worth a look before training)
    from graphview_spark.operators.pipeline import drift_bucket, drift_report

    raw_cnt = (
        stages["raw"]
        .select("lang", drift_bucket(F.col("n_chars")).alias("bucket"))
        .groupBy("lang", "bucket").agg(F.count(F.lit(1)).alias("ca"))
    )
    fin_cnt = (
        docs.select("lang", drift_bucket(F.col("n_chars")).alias("bucket"))
        .groupBy("lang", "bucket").agg(F.count(F.lit(1)).alias("cb"))
    )
    stages["drift_report"] = drift_report(
        raw_cnt.join(fin_cnt, ["lang", "bucket"], "full_outer").select(
            "lang", "bucket",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
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
