"""Property-based tests (hypothesis): the temporal joins and sequence
packing checked against brute-force reference implementations on random
inputs — the highest-risk operators get randomized oracles, not just
fixed fixtures."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

BASE = datetime.datetime(2024, 1, 1)


def _ts(sec: int) -> datetime.datetime:
    return BASE + datetime.timedelta(seconds=sec)


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # by key
        st.integers(min_value=0, max_value=120),    # t (seconds)
        st.integers(min_value=0, max_value=99),     # value / id
    ),
    min_size=1,
    max_size=15,
)

prop_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(left=rows_strategy, right=rows_strategy)
@prop_settings
def test_asof_join_matches_bruteforce(spark, left, right):
    from graphview_spark.operators.temporal import asof_join

    ldf = spark.createDataFrame(
        [(k, _ts(t), i) for i, (k, t, _) in enumerate(left)],
        ["k", "ts", "lid"],
    )
    rdf = spark.createDataFrame(
        [(k, _ts(t), v, i) for i, (k, t, v) in enumerate(right)],
        ["k", "ts", "val", "rid"],
    )
    got = {
        r["lid"]: (r["val_r"], r["ts_r"])
        for r in asof_join(
            ldf, rdf, on="ts", by=["k"], right_cols=["val"], tiebreak="rid"
        ).collect()
    }
    for i, (k, t, _) in enumerate(left):
        cands = [
            (rt, v, j)
            for j, (rk, rt, v) in enumerate(right)
            if rk == k and rt <= t
        ]
        if not cands:
            assert got[i] == (None, None)
        else:
            # greatest timestamp; ties resolved to the greatest rid
            rt, v, _ = max(cands, key=lambda c: (c[0], c[2]))
            assert got[i] == (v, _ts(rt))


@given(left=rows_strategy, right=rows_strategy)
@prop_settings
def test_asof_join_forward_matches_bruteforce(spark, left, right):
    from graphview_spark.operators.temporal import asof_join

    ldf = spark.createDataFrame(
        [(k, _ts(t), i) for i, (k, t, _) in enumerate(left)],
        ["k", "ts", "lid"],
    )
    rdf = spark.createDataFrame(
        [(k, _ts(t), v, i) for i, (k, t, v) in enumerate(right)],
        ["k", "ts", "val", "rid"],
    )
    got = {
        r["lid"]: (r["val_r"], r["ts_r"])
        for r in asof_join(
            ldf, rdf, on="ts", by=["k"], right_cols=["val"],
            tiebreak="rid", direction="forward",
        ).collect()
    }
    for i, (k, t, _) in enumerate(left):
        cands = [
            (rt, v, j)
            for j, (rk, rt, v) in enumerate(right)
            if rk == k and rt >= t
        ]
        if not cands:
            assert got[i] == (None, None)
        else:
            # least timestamp; ties resolved to the least rid
            rt, v, _ = min(cands, key=lambda c: (c[0], c[2]))
            assert got[i] == (v, _ts(rt))


@given(left=rows_strategy, right=rows_strategy,
       window=st.integers(min_value=1, max_value=90))
@prop_settings
def test_banded_range_join_matches_bruteforce(spark, left, right, window):
    from graphview_spark.operators.temporal import banded_range_join

    ldf = spark.createDataFrame(
        [(k, _ts(t), i) for i, (k, t, _) in enumerate(left)],
        ["k", "ts", "lid"],
    )
    rdf = spark.createDataFrame(
        [(k, _ts(t), i) for i, (k, t, _) in enumerate(right)],
        ["k", "ts", "rid"],
    )
    got = {
        (r["lid"], r["rid"])
        for r in banded_range_join(
            ldf, rdf, by=["k"], window_seconds=window
        ).collect()
    }
    want = {
        (i, j)
        for i, (lk, lt, _) in enumerate(left)
        for j, (rk, rt, _) in enumerate(right)
        if lk == rk and lt - window <= rt <= lt
    }
    assert got == want


@given(docs=st.lists(st.integers(min_value=1, max_value=50),
                     min_size=1, max_size=20),
       budget=st.integers(min_value=8, max_value=64))
@prop_settings
def test_pack_sequences_stream_invariants(spark, docs, budget):
    """The packed layout is a gap-free chunking of each shard's token
    stream: offsets advance by exactly n_tokens in doc order, and
    seq_id*budget + seq_offset reproduces the running total."""
    from graphview_spark.operators.pipeline import pack_sequences

    df = spark.createDataFrame(
        [(i, "w " * (n - 1) + "w") for i, n in enumerate(docs)],
        ["doc_id", "text"],
    )
    out = sorted(
        pack_sequences(df, budget=budget, shards=4).collect(),
        key=lambda r: (r["shard"], r["doc_id"]),
    )
    stream_pos: dict[int, int] = {}
    for r in out:
        pos = stream_pos.get(r["shard"], 0)
        assert r["seq_id"] == pos // budget
        assert r["seq_offset"] == pos % budget
        stream_pos[r["shard"]] = pos + r["n_tokens"]
    assert sum(stream_pos.values()) == sum(docs)


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # user
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(min_value=0, max_value=50),  # t
        ),
        min_size=1,
        max_size=20,
    )
)
@prop_settings
def test_funnel_matches_bruteforce(spark, events):
    from graphview_spark.operators.temporal import funnel

    df = spark.createDataFrame(
        [(u, s, _ts(t)) for u, s, t in events],
        "user_id long, event_type string, ts timestamp",
    )
    got = {
        r["u"]: (r["t_1"], r["t_2"], r["t_3"])
        for r in funnel(df, ["view", "click", "purchase"]).collect()
    }
    # brute force: strictly-increasing earliest step times per user
    users = {u for u, _, _ in events}
    for u in users:
        mine = sorted((t, s) for uu, s, t in events if uu == u)
        t1 = min((t for t, s in mine if s == "view"), default=None)
        t2 = (
            min((t for t, s in mine if s == "click" and t > t1), default=None)
            if t1 is not None
            else None
        )
        t3 = (
            min((t for t, s in mine if s == "purchase" and t > t2), default=None)
            if t2 is not None
            else None
        )
        if t1 is None:
            assert u not in got
        else:
            g1, g2, g3 = got[u]
            assert g1 == _ts(t1)
            assert g2 == (_ts(t2) if t2 is not None else None)
            assert g3 == (_ts(t3) if t3 is not None else None)
