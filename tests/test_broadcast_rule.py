"""The round-7 broadcast decision rule, executed both ways.

The queries that dropped their forced F.broadcast hints must produce
IDENTICAL results when broadcast joins are disabled entirely
(autoBroadcastJoinThreshold = -1 simulates the 100 TB regime where the
count/cluster tables exceed any broadcast threshold) — proving the
plans genuinely degrade to shuffle joins rather than silently relying
on a broadcast-only shape. A plan assertion confirms the shuffle-join
fallback is what actually runs.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest


@contextmanager
def _no_broadcast(spark):
    conf = spark.conf
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    prev = {k: conf.get(k, None) for k in keys}
    for k in keys:
        conf.set(k, "-1")
    try:
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("qname", [
    "pipeline_perplexity",
    "pipeline_perplexity_bigram",
    "sample_cluster_split",
    "rel_shipping_priority",
    "pipeline_decontam",
])
def test_results_identical_without_broadcast(spark, sf_dir, qname):
    import __spark_entry__ as entry

    qs = dict(entry.queries())
    qs.update(entry.extra_queries())
    fn = qs[qname]
    default = _rows(fn(spark, sf_dir))
    with _no_broadcast(spark):
        forced_shuffle = _rows(fn(spark, sf_dir))
    assert forced_shuffle == default


def test_count_table_join_degrades_to_shuffle_join(spark, sf_dir):
    """With broadcasts off, the unigram count-table join runs as a
    shuffle join (SortMergeJoin/ShuffledHashJoin) — the plan a 100 TB
    vocabulary forces — not a BroadcastHashJoin kept alive by a hint."""
    import __spark_entry__ as entry

    qs = dict(entry.queries())
    qs.update(entry.extra_queries())
    with _no_broadcast(spark):
        plan = (
            qs["pipeline_perplexity"](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
