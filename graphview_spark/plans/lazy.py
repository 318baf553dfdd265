"""Materialization switch for plan inspection.

Several operators ``localCheckpoint(eager=True)`` a frame that fans out
into multiple consumers — the right call at execution time (the subtree
runs once), but it truncates the plan: an audit of the final DataFrame
sees only a scan of the checkpointed RDD, so PLANS.md would under-report
shuffles and the plan-budget regression gate would be vacuous for those
queries (and the audit itself would execute heavy jobs at plan-build
time).

``pin(df)`` is the checkpoint call sites' entry point: it materializes
normally, but inside a ``lazy_plans()`` context (used by
tools/plan_audit.py and tests/test_plans.py) it returns the frame
unchanged, so the audited plan is the FULL logical pipeline — the
worst-case plan, with every fan-out branch duplicated rather than
shared. Driver loops whose control flow needs materialized counts
(k_truss, k_core, the Pregel-style loops) are outside this mechanism;
their audited plan is the final-round plan, a documented limitation.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_LAZY = False


def is_lazy() -> bool:
    return _LAZY


def pin(df: DataFrame) -> DataFrame:
    """Materialize (localCheckpoint) — or pass through under
    ``lazy_plans()`` so plan audits see the full pipeline."""
    return df if _LAZY else df.localCheckpoint(eager=True)


@contextmanager
def lazy_plans():
    global _LAZY
    prev = _LAZY
    _LAZY = True
    try:
        yield
    finally:
        _LAZY = prev
