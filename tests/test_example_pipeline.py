"""The end-to-end pipeline example composes seven operators into one
DAG; assert the stage invariants a production run relies on."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
)


def test_pipeline_e2e_stages(spark):
    from pipeline_e2e import run_pipeline

    stages = run_pipeline(spark, "/root/testdata/sf0.001")
    counts = {k: df.count() for k, df in stages.items()}
    # every filtering stage is monotone non-increasing
    order = [
        "raw", "exact_dedup", "near_dedup", "cross_scrub",
        "decontam", "quality", "train_split", "token_budget",
    ]
    for a, b in zip(order, order[1:]):
        assert counts[b] <= counts[a], (a, b, counts)
    assert counts["train_split"] > 0
    # no held-out source survives the scrub
    from graphview_spark.operators.dedup import HELDOUT_SOURCES

    survivors = {
        r["source"] for r in stages["train_split"].select("source").distinct().collect()
    }
    assert survivors.isdisjoint(set(HELDOUT_SOURCES))
    # packing covers every budgeted training doc exactly once
    packed = stages["packed"]
    assert packed.count() == counts["token_budget"]
    assert packed.select("doc_id").distinct().count() == counts["token_budget"]


def test_pipeline_e2e_round7_stages(spark):
    """Round-7 composition: the split is keyed on stage 2's near-dup
    clusters (leakage-safe by construction) and the vocab report is
    the bounded-output HLL sketch."""
    from pipeline_e2e import run_pipeline

    stages = run_pipeline(spark, "/root/testdata/sf0.001")
    splits = {
        r["split"]
        for r in stages["train_split"].select("split").distinct().collect()
    }
    assert splits == {"train"}
    report = stages["vocab_report"].collect()
    assert report, "vocab report must cover at least one language"
    for r in report:
        assert r["est_distinct"] > 0
        assert r["n_registers"] <= 256
    # round-10 stages (assertions promised by the r10 comment, landed
    # r11 per ADVICE): the two-tier Bloom decontam must agree with the
    # exact operator on WHO survives — the exact tier kills the
    # bitmap's false positives, so prescreening is lossless
    from pyspark.sql import functions as F

    from graphview_spark.operators.pipeline import (
        benchmark_docs,
        decontaminate,
    )

    cross = stages["cross_scrub"]
    exact_report = decontaminate(cross, benchmark_docs(stages["raw"]))
    exact_clean = {
        r["doc_id"]
        for r in cross.join(
            exact_report.filter(F.col("contaminated")).select("doc_id"),
            "doc_id", "left_anti",
        ).select("doc_id").collect()
    }
    two_tier = {r["doc_id"] for r in
                stages["decontam"].select("doc_id").collect()}
    assert two_tier == exact_clean
    # and the HDR length report brackets every estimate below the max
    # length (estimates are bucket LOWER bounds in micro-units)
    lengths = stages["length_report"].collect()
    assert lengths
    max_chars = {
        r["lang"]: r["mx"]
        for r in stages["token_budget"]
        .groupBy("lang").agg(F.max("n_chars").alias("mx")).collect()
    }
    for r in lengths:
        assert 0 < r["p50_micro"] <= r["p90_micro"] <= r["p99_micro"]
        assert r["p99_micro"] <= max_chars[r["lang"]] * 1_000_000


def test_pipeline_e2e_drift_report_stage(spark):
    """The exit drift report covers every language that survived to
    the train set, with sane shapes: PSI is non-negative-summable
    integer micros (can be large — the token-budget cap reshapes
    lengths on purpose), masses are in [0, 1000], and a language's
    common-bucket count never exceeds the bucket space."""
    from examples.pipeline_e2e import run_pipeline
    from graphview_spark.operators.pipeline import DRIFT_BUCKETS

    stages = run_pipeline(spark, "/root/testdata/sf0.001")
    rows = stages["drift_report"].collect()
    langs_final = {
        r["lang"]
        for r in stages["token_budget"].select("lang").distinct().collect()
    }
    assert langs_final <= {r["lang"] for r in rows}
    for r in rows:
        assert 0 <= r["n_common"] <= DRIFT_BUCKETS
        assert 0 <= r["new_mass_milli"] <= 1000
        assert 0 <= r["gone_mass_milli"] <= 1000
        # every PSI term (p-q)·ln(p/q) is ≥ 0 (factors share sign), so
        # the rounded-term sum is too
        assert r["psi_micro"] >= 0
