"""q_sim_topk shared-corpus pin (round 13, VERDICT r12 "Next #7").

The dual-method query pins ONE normalized corpus read and feeds every
leg from it when the corpus row count clears SIM_PIN_ROWS; above the
gate each leg scans the parquet itself (no corpus-sized checkpoint at
100 TB). Both branches must produce the identical declared result.
"""
from __future__ import annotations

from graphview_spark.operators import similarity as S


def test_sim_topk_pin_and_fallback_identical(spark, sf_dir, monkeypatch):
    pinned = S.q_sim_topk(spark, sf_dir)
    monkeypatch.setattr(S, "SIM_PIN_ROWS", 0)  # force the fallback
    fallback = S.q_sim_topk(spark, sf_dir)
    assert pinned.exceptAll(fallback).count() == 0
    assert fallback.exceptAll(pinned).count() == 0


def test_sim_topk_executed_scans_once(spark, sf_dir):
    """Under the pin, the final plan reads only checkpoint RDDs — the
    embeddings parquet is scanned once, in the pin's own job."""
    df = S.q_sim_topk(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan
