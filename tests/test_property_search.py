"""Property-based tests for the retrieval operators: randomized corpora
checked against pure-Python references computing the same formulas in
the same order (the float-determinism contract the oracles rely on)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphview_spark.operators.search import (
    bm25_scores,
    build_postings,
    chunk_documents,
)

WORDS = ["cat", "dog", "bird", "fish", "ant"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=12),
    min_size=1,
    max_size=6,
)

prop_settings = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, corpus):
    return spark.createDataFrame(
        [(i + 1, " ".join(doc)) for i, doc in enumerate(corpus)],
        "doc_id long, text string",
    )


def _py_bm25(corpus, terms, k1=1.2, b=0.75):
    n = len(corpus)
    dls = [len(d) for d in corpus]
    avgdl = sum(dls) / n
    dfs = [sum(1 for d in corpus if t in d) for t in terms]
    out = {}
    for i, d in enumerate(corpus):
        score = 0.0
        for t, df in zip(terms, dfs):
            tf = d.count(t)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            score = score + idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * dls[i] / avgdl)
            )
        out[i + 1] = round(score, 4)
    return out


@given(corpus=corpus_strategy)
@prop_settings
def test_bm25_matches_python_reference(spark, corpus):
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(_df(spark, corpus), ["cat", "dog"]).collect()
    }
    want = _py_bm25(corpus, ["cat", "dog"])
    assert got == want


@given(corpus=corpus_strategy)
@prop_settings
def test_postings_match_python_reference(spark, corpus):
    rows = build_postings(_df(spark, corpus), vocab=None, n_shards=2).collect()
    got = {}
    for r in rows:
        got.setdefault(r["term"], set()).update(
            int(x) for x in r["postings"].split(",")
        )
    want = {}
    for i, d in enumerate(corpus):
        for w in set(d):
            want.setdefault(w, set()).add(i + 1)
    assert got == want
    # shard-local counts sum to the true df
    df_by_term = {}
    for r in rows:
        df_by_term[r["term"]] = df_by_term.get(r["term"], 0) + r["n_docs"]
    assert df_by_term == {t: len(ids) for t, ids in want.items()}


@given(
    corpus=corpus_strategy,
    chunk=st.integers(min_value=2, max_value=6),
    stride=st.integers(min_value=1, max_value=5),
)
@prop_settings
def test_chunks_cover_every_token(spark, corpus, chunk, stride):
    # the operator rejects stride > chunk (it would drop tokens —
    # found by this very test); stay inside the valid contract
    stride = min(stride, chunk)
    rows = chunk_documents(
        _df(spark, corpus), chunk_tokens=chunk, stride=stride
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, d in enumerate(corpus):
        rs = sorted(by_doc[i + 1], key=lambda r: r["chunk_idx"])
        n = len(d)
        starts = list(range(0, max(n - 1, 0) + 1, stride))
        assert [r["chunk_idx"] for r in rs] == list(range(len(starts)))
        # windows tile the doc: sizes match the slice arithmetic and the
        # union of [start, start+size) covers [0, n)
        covered = set()
        for r, start in zip(rs, starts):
            size = min(chunk, n - start)
            assert r["n_tokens"] == size
            covered.update(range(start, start + size))
        assert covered == set(range(n))
