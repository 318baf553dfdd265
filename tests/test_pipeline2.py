"""Tests for the pipeline operators: decontamination, sequence packing,
quality quantile filtering, and domain mixing."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphview_spark.operators import pipeline
from graphview_spark.plans.inspect import plan_facts


def test_decontam_flags_overlapping_doc(spark):
    texts = [
        (1, "a b c d e f g h i j"),            # shares 5-grams with bench
        (2, "k l m n o p q r s t"),            # disjoint
        (3, "z y x w v"),                       # disjoint, exactly 5 words
        (4, "one two three four"),              # too short for a 5-gram
    ]
    train = spark.createDataFrame(texts, ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100, "a b c d e f zz")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: (r["n_shared_ngrams"], r["contaminated"])
        for r in pipeline.decontaminate(train, bench).collect()
    }
    # bench 5-grams: "a b c d e", "b c d e f" — doc 1 contains both
    assert out[1] == (2, True)
    assert out[2] == (0, False)
    assert out[3] == (0, False)
    assert out[4] == (0, False)


def test_decontam_broadcasts_benchmark(spark, sf_dir):
    df = pipeline.q_pipeline_decontam(spark, sf_dir)
    facts = plan_facts(df)
    assert facts.n_broadcast_joins >= 2   # gram probe + flag join-back
    assert facts.n_cartesian == 0
    assert facts.n_python_evals == 0


def test_pack_sequences_offsets(spark):
    # single shard (doc_id % 8 spreads: use ids within one residue class)
    rows = [(8 * i, "w " * 99 + "w") for i in range(25)]  # 100 tokens each
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pipeline.pack_sequences(docs, budget=256, shards=8).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert all(r["shard"] == 0 for r in out)
    # doc 0 starts at 0 → seq 0; doc 16 starts at 200 → seq 0 offset 200;
    # doc 24 starts at 300 → seq 1 offset 44
    assert (by_id[0]["seq_id"], by_id[0]["seq_offset"]) == (0, 0)
    assert (by_id[16]["seq_id"], by_id[16]["seq_offset"]) == (0, 200)
    assert (by_id[24]["seq_id"], by_id[24]["seq_offset"]) == (1, 44)
    # token stream is gap-free per shard
    total = sum(r["n_tokens"] for r in out)
    last = max(out, key=lambda r: r["seq_id"] * 256 + r["seq_offset"])
    assert last["seq_id"] * 256 + last["seq_offset"] + 100 == total


def test_quality_quantile_keeps_top_half(spark, sf_dir):
    out = pipeline.q_pipeline_quality_quantile(spark, sf_dir).collect()
    for lang in {r["lang"] for r in out}:
        rows = [r for r in out if r["lang"] == lang]
        kept = [r for r in rows if r["kept"]]
        # cume_dist >= 0.5 keeps at least half (ties can push above)
        assert len(kept) >= len(rows) / 2
        # every kept score >= every dropped score
        if kept and len(kept) < len(rows):
            assert min(r["quality_score"] for r in kept) >= max(
                r["quality_score"] for r in rows if not r["kept"]
            )


def test_quality_quantile_sketch_path_close(spark, sf_dir):
    """approx_percentile (one-pass, mergeable) lands near the exact
    per-lang median — the scale path when a full sort isn't worth it."""
    from graphview_spark.operators.text import quality_score_col
    from graphview_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang", quality_score_col(F.col("text")).alias("s")
    )
    approx = {
        r["lang"]: r["m"]
        for r in scored.groupBy("lang")
        .agg(F.expr("approx_percentile(s, 0.5, 1000)").alias("m"))
        .collect()
    }
    exact = {
        r["lang"]: r["m"]
        for r in scored.groupBy("lang")
        .agg(F.expr("percentile(s, 0.5)").alias("m"))
        .collect()
    }
    for lang in exact:
        assert abs(approx[lang] - exact[lang]) < 0.05


def test_mix_rates_and_weights(spark, sf_dir):
    out = pipeline.q_pipeline_mix(spark, sf_dir).collect()
    weights = {r["lang"]: r["weight"] for r in out}
    assert weights.get("en") == 1.0
    for lang, rate in pipeline.MIX_RATES.items():
        if lang in weights:
            assert weights[lang] == round(1.0 / rate, 3)
    # en never drops; zh drops ~75%
    from graphview_spark.session import read_table

    totals = {
        r["lang"]: r["n"]
        for r in read_table(spark, sf_dir, "documents")
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    kept = {}
    for r in out:
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
    assert kept["en"] == totals["en"]
    if totals.get("zh", 0) >= 8:
        assert kept.get("zh", 0) < totals["zh"]


def test_pipeline_composes_end_to_end(spark, sf_dir):
    """quality filter → decontam drop → pack, as one DataFrame plan."""
    from graphview_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    flags = pipeline.decontaminate(
        docs.filter(F.col("doc_id") % 97 != 0), pipeline.benchmark_docs(docs)
    )
    clean = (
        docs.join(flags.filter(~F.col("contaminated")).select("doc_id"), "doc_id")
    )
    packed = pipeline.pack_sequences(clean)
    n_docs = clean.count()
    assert packed.count() == n_docs
    assert plan_facts(packed).n_python_evals == 0


def test_chunk_dedup_drops_repeated_chunks(spark, sf_dir, monkeypatch, tmp_path):
    from graphview_spark.operators import pipeline

    # two docs sharing their first 10-word chunk: the later doc loses it
    c1 = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [(1, c1 + " unique tail one two three four five six seven eight"),
         (2, c1 + " different continuation here with more words to fill up"),
         (3, "totally fresh words that appear nowhere else at all right")],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["clean_text"])
        for r in pipeline.q_pipeline_chunk_dedup(spark, str(tmp_path)).collect()
    }
    assert out[1][0] == 2 and out[1][1] == 2          # first owner keeps all
    assert out[2][0] == 2 and out[2][1] == 1          # shared chunk dropped
    assert not out[2][2].startswith("a b c")
    assert out[3] == (1, 1, docs.filter("doc_id=3").first()["text"])


def test_data_card_totals_match_corpus(spark):
    from graphview_spark.operators.pipeline import q_pipeline_data_card
    from graphview_spark.session import read_table

    sf = "/root/testdata/sf0.001"
    card = q_pipeline_data_card(spark, sf)
    docs = read_table(spark, sf, "documents")
    assert card.agg(F.sum("n_docs")).first()[0] == docs.count()
    assert (
        card.agg(F.sum("total_chars")).first()[0]
        == docs.agg(F.sum("n_chars")).first()[0]
    )
    # quality milli-scores live on the 0..1000 scale
    row = card.agg(F.min("mean_quality_milli"), F.max("mean_quality_milli")).first()
    assert 0 <= row[0] <= row[1] <= 1000


def test_cross_corpus_flags_only_train_docs(spark):
    from graphview_spark.operators.dedup import (
        HELDOUT_SOURCES,
        q_dedup_cross_corpus,
    )

    flagged = q_dedup_cross_corpus(spark, "/root/testdata/sf0.001").collect()
    for r in flagged:
        assert r["source"] not in HELDOUT_SOURCES
        assert r["n_matches"] >= 1
