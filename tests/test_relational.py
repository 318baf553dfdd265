"""Relational surface vs the DuckDB oracle at sf0.001 (fast smoke of the
same contract the driver enforces at sf0.01)."""

from __future__ import annotations

import pytest

from graphview_spark import relational
from tests.conftest import assert_df_matches_oracle


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_query_matches_oracle(name, spark, sf_dir, duck):
    df = relational.QUERIES[name](spark, sf_dir)
    assert_df_matches_oracle(df, duck, relational.ORACLES[name])


@pytest.mark.parametrize("name", sorted(relational.EXTRA_QUERIES))
def test_relational_extra_query_matches_oracle(name, spark, sf_dir, duck):
    # single-operator forms not registered with the (capped) driver gate
    df = relational.EXTRA_QUERIES[name](spark, sf_dir)
    assert_df_matches_oracle(df, duck, relational.EXTRA_ORACLES[name])


def test_percentiles_order_statistic_semantics(spark):
    from graphview_spark.relational import q_percentiles

    rows = q_percentiles(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows:
        # order statistics come from the observed values, so they are
        # monotone and bounded by the group's support
        assert r["p50"] <= r["p90"] <= r["p99"]
        assert r["n_docs"] >= 1
