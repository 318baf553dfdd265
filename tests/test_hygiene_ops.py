"""PII scrubbing, per-group deterministic sampling, temperature mixing
— the round-4 additions to the training-data hygiene family. Each is
oracle-checked (same discipline as the gate) plus semantics-asserted."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import assert_df_matches_oracle


def test_pii_scrub_redacts_all_planted_pii(spark, sf_dir):
    from graphview_spark.operators.text import q_text_pii_scrub

    out = q_text_pii_scrub(spark, sf_dir)
    # every doc gets exactly one planted email + phone + IP
    assert out.filter("n_pii <> 3").count() == 0
    leaked = out.filter(
        F.col("clean_text").rlike(r"@example\.com")
        | F.col("clean_text").rlike(r"\+1-555-\d")
        | F.col("clean_text").rlike(r"10\.0\.\d+\.1")
    )
    assert leaked.count() == 0
    r = out.first()
    assert "[EMAIL]" in r["clean_text"] and "[PHONE]" in r["clean_text"]
    assert "[IP]" in r["clean_text"]


def test_pii_scrub_plain_text_untouched(spark):
    from graphview_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [(1, "no pii here at all"), (2, "reach me: bob@corp.io or +44-123-4567")],
        "id long, text string",
    )
    rows = {r["id"]: r for r in scrub_pii(df).collect()}
    assert rows[1]["n_pii"] == 0
    assert rows[1]["clean_text"] == "no pii here at all"
    assert rows[2]["n_pii"] == 2
    assert rows[2]["clean_text"] == "reach me: [EMAIL] or [PHONE]"


def test_sample_group_topk_deterministic(spark, sf_dir, duck):
    from graphview_spark.operators import sampling

    a = {tuple(r) for r in sampling.q_sample_group_topk(spark, sf_dir).collect()}
    b = {tuple(r) for r in sampling.q_sample_group_topk(spark, sf_dir).collect()}
    assert a == b                      # same sample every run
    per_source = {}
    for doc_id, source, rk in a:
        per_source.setdefault(source, set()).add(rk)
    for ranks in per_source.values():  # exactly ranks 1..k per group
        assert ranks == set(range(1, sampling.GROUP_SAMPLE_K + 1))
    assert_df_matches_oracle(
        sampling.q_sample_group_topk(spark, sf_dir),
        duck,
        sampling.EXTRA_ORACLES["sample_group_topk"],
    )


def test_temperature_mix_flattens_distribution(spark):
    from graphview_spark.operators import pipeline

    # heavily skewed synthetic corpus: 900 "web" vs 100 "books" rows.
    # alpha=0.5 weights are 30:10, so the target mix is 75%/25% —
    # much flatter than the 90%/10% input.
    rows = [(i, "web") for i in range(900)] + [
        (1000 + i, "books") for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = pipeline.temperature_mix(docs, budget=400)
    shares = {
        r["source"]: r["c"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    tot = sum(shares.values())
    assert abs(tot - 400) < 400 * 0.25      # roughly on budget
    web_share = shares["web"] / tot
    assert 0.65 < web_share < 0.85          # flattened toward 0.75
    assert shares["books"] / tot > 0.15     # small domain upweighted


def test_temperature_mix_matches_oracle(spark, sf_dir, duck):
    from graphview_spark.operators import pipeline

    assert_df_matches_oracle(
        pipeline.q_pipeline_temperature_mix(spark, sf_dir),
        duck,
        pipeline.EXTRA_ORACLES["pipeline_temperature_mix"],
    )
