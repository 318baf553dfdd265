"""Streaming near-dup rejection at ingest (MinHash-LSH vs the
accumulating accepted-signature store)."""

from __future__ import annotations


BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = BASE.replace("today", "tonight")          # high-Jaccard variant
OTHER = "completely different words about spark shuffles joins and plans"


def _drain(stream_df, fn):
    q = (
        stream_df.writeStream.foreachBatch(fn)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_streaming_dedup_rejects_near_dups_across_batches(spark, tmp_path):
    from graphview_spark.streaming.dedup_stream import StreamingDeduper

    src = tmp_path / "docs_in"
    src.mkdir()
    spark.createDataFrame(
        [(1, BASE), (2, OTHER)], ["doc_id", "text"]
    ).coalesce(1).write.json(str(src / "b0"))
    # batch 2: a near-dup of doc 1 (reject), a fresh doc (accept),
    # and a short doc (accept unconditionally)
    spark.createDataFrame(
        [(3, NEAR), (4, OTHER + " with several extra unrelated tokens here"),
         (5, "too short")],
        ["doc_id", "text"],
    ).coalesce(1).write.json(str(src / "b1"))

    accepted_ids = []

    def sink(df):
        accepted_ids.extend(r["doc_id"] for r in df.select("doc_id").collect())

    d = StreamingDeduper(spark, sink=sink, compact_every=2)
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .json(str(src) + "/*")
    )
    _drain(stream, d)

    assert d.batches == 2
    assert d.rejected_rows == 1                      # doc 3 only
    assert d.accepted_rows == 4
    assert sorted(accepted_ids) == [1, 2, 4, 5]
    assert sorted(
        r["doc_id"] for r in d.accepted_df().collect()
    ) == [1, 2, 4]                                   # 5 has no signature


def test_streaming_dedup_batch_internal(spark, tmp_path):
    from graphview_spark.streaming.dedup_stream import StreamingDeduper

    src = tmp_path / "docs_in2"
    src.mkdir()
    # near-dups within ONE batch: smallest doc_id wins
    spark.createDataFrame(
        [(10, BASE), (11, NEAR), (12, OTHER)], ["doc_id", "text"]
    ).coalesce(1).write.json(str(src / "b0"))

    d = StreamingDeduper(spark)
    stream = spark.readStream.schema("doc_id LONG, text STRING").json(
        str(src) + "/*"
    )
    _drain(stream, d)

    assert sorted(
        r["doc_id"] for r in d.accepted_df().collect()
    ) == [10, 12]
    assert d.rejected_rows == 1


def test_store_save_load_survives_restart(spark, tmp_path):
    from graphview_spark.streaming.dedup_stream import StreamingDeduper

    src = tmp_path / "docs_in3"
    src.mkdir()
    spark.createDataFrame(
        [(1, BASE), (2, OTHER)], ["doc_id", "text"]
    ).coalesce(1).write.json(str(src / "b0"))

    d1 = StreamingDeduper(spark)
    stream = spark.readStream.schema("doc_id LONG, text STRING").json(
        str(src) + "/*"
    )
    _drain(stream, d1)
    store_path = str(tmp_path / "sig_store")
    d1.save_store(store_path)

    # "restarted" deduper adopts the store; a near-dup of doc 1 arriving
    # in the new run is rejected against the PREVIOUS run's acceptances
    src2 = tmp_path / "docs_in4"
    src2.mkdir()
    spark.createDataFrame(
        [(3, NEAR)], ["doc_id", "text"]
    ).coalesce(1).write.json(str(src2 / "b0"))
    d2 = StreamingDeduper(spark)
    d2.load_store(store_path)
    stream2 = spark.readStream.schema("doc_id LONG, text STRING").json(
        str(src2) + "/*"
    )
    _drain(stream2, d2)
    assert d2.rejected_rows == 1
    assert sorted(r["doc_id"] for r in d2.accepted_df().collect()) == [1, 2]
