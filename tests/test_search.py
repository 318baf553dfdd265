"""Semantics tests for the retrieval operators (operators/search.py):
BM25 against a hand-computed fixture, posting-list sharding/sorting
invariants, and chunk window coverage/overlap."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from graphview_spark.operators.search import (
    bm25_scores,
    build_postings,
    chunk_documents,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "cat dog cat"),
            (2, "dog dog dog dog"),
            (3, "bird bird"),
            (4, "cat bird fish fish fish"),
        ],
        "doc_id long, text string",
    )


def _bm25_ref(tf, dl, df, n, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_matches_hand_computation(spark):
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(_docs(spark), ["cat", "dog"]).collect()
    }
    n, avgdl = 4, (3 + 4 + 2 + 5) / 4
    # df(cat)=2, df(dog)=2
    for doc_id, (tfc, tfd, dl) in {
        1: (2, 1, 3),
        2: (0, 4, 4),
        3: (0, 0, 2),
        4: (1, 0, 5),
    }.items():
        want = _bm25_ref(tfc, dl, 2, n, avgdl) + _bm25_ref(tfd, dl, 2, n, avgdl)
        assert abs(got[doc_id] - round(want, 4)) < 1e-9, doc_id


def test_bm25_zero_when_no_terms_present(spark):
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(_docs(spark), ["zebra"]).collect()
    }
    assert got == {1: 0.0, 2: 0.0, 3: 0.0, 4: 0.0}


def test_postings_sharded_and_sorted(spark):
    rows = build_postings(_docs(spark), vocab=None, n_shards=2).collect()
    by_key = {(r["term"], r["shard"]): r for r in rows}
    # 'cat' in docs 1,4 → shard 1: [1], shard 0: [4]
    assert by_key[("cat", 1)]["postings"] == "1"
    assert by_key[("cat", 0)]["postings"] == "4"
    # 'bird' in docs 3,4 → shard 1: [3], shard 0: [4]
    assert by_key[("bird", 1)]["postings"] == "3"
    # df recoverable as a sum over shards
    df_fish = sum(r["n_docs"] for r in rows if r["term"] == "fish")
    assert df_fish == 1
    # every shard-local list is ascending and duplicate-free
    for r in rows:
        ids = [int(x) for x in r["postings"].split(",")]
        assert ids == sorted(set(ids))
        assert r["n_docs"] == len(ids)


def test_postings_vocab_filter(spark):
    rows = build_postings(_docs(spark), vocab=["dog"], n_shards=1).collect()
    assert len(rows) == 1
    assert rows[0]["term"] == "dog"
    assert rows[0]["postings"] == "1,2"  # tf-dedup: doc 2 appears once


def test_chunks_cover_and_overlap(spark):
    doc = spark.createDataFrame(
        [(7, " ".join(f"w{i}" for i in range(100)))], "doc_id long, text string"
    )
    rows = chunk_documents(doc, chunk_tokens=40, stride=32).collect()
    # starts 0,32,64,96 → 4 chunks; last chunk has 100-96=4 tokens
    assert [r["chunk_idx"] for r in sorted(rows, key=lambda r: r["chunk_idx"])] == [
        0,
        1,
        2,
        3,
    ]
    sizes = {r["chunk_idx"]: r["n_tokens"] for r in rows}
    assert sizes == {0: 40, 1: 40, 2: 36, 3: 4}


def test_chunks_short_doc_single_window(spark):
    doc = spark.createDataFrame([(8, "a b c")], "doc_id long, text string")
    rows = chunk_documents(doc, chunk_tokens=40, stride=32).collect()
    assert len(rows) == 1
    assert rows[0]["n_tokens"] == 3


def test_bm25_plan_is_broadcast_no_shuffle_of_corpus(spark):
    plan = bm25_scores(_docs(spark), ["cat"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_chunks_reject_token_dropping_stride(spark):
    import pytest as _pytest

    doc = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(doc, chunk_tokens=2, stride=3)


def test_hybrid_rerank_is_cosine_ordered_subset_of_bm25(spark):
    from graphview_spark.operators.search import (
        HYBRID_CANDIDATES,
        HYBRID_TOP_K,
        q_search_hybrid,
        q_search_bm25,
        bm25_scores,
    )
    from graphview_spark.session import read_table

    sf = "/root/testdata/sf0.001"
    hybrid = q_search_hybrid(spark, sf).collect()
    assert len(hybrid) == HYBRID_TOP_K
    # reranked rows are ordered by cosine desc
    cosines = [r["cosine"] for r in sorted(hybrid, key=lambda r: r["rerank"])]
    assert cosines == sorted(cosines, reverse=True)
    # every reranked doc came from the BM25 candidate pool
    docs = read_table(spark, sf, "documents")
    from pyspark.sql import functions as F

    cand = {
        r["doc_id"]
        for r in bm25_scores(docs, ["vector", "stream", "merge"])
        .orderBy(F.desc("score"), "doc_id")
        .limit(HYBRID_CANDIDATES)
        .collect()
    }
    assert {r["doc_id"] for r in hybrid} <= cand
