"""HLL sketch path for vocabulary counting — approx_count_distinct is the
100 TB variant of text_vocab's exact distinct (one pass, mergeable sketch
state, no exact-distinct shuffle). Approximate values are engine-specific,
so this is pytest-bound (error-margin assert) rather than oracle-gated."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_vocab_within_rsd(spark, sf_dir):
    from graphview_spark.operators.text import q_text_vocab
    from graphview_spark.session import read_table

    exact = {r["lang"]: r["vocab"] for r in q_text_vocab(spark, sf_dir).collect()}

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(F.split("text", " ")).alias("tok"))
    approx = {
        r["lang"]: r["vocab_approx"]
        for r in toks.groupBy("lang")
        .agg(F.approx_count_distinct("tok", rsd=0.02).alias("vocab_approx"))
        .collect()
    }
    assert set(approx) == set(exact)
    for lang, v in exact.items():
        assert abs(approx[lang] - v) / v < 0.10, (lang, approx[lang], v)
