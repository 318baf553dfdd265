"""Physical-plan introspection — the testing hook the reference exposes
as ``GraphViewCommand.GetTsqlQuery()`` ("For testing only",
GraphViewCommand.cs:41-65): where GraphView snapshots its translated
T-SQL, we snapshot the Catalyst plan and assert its load-bearing
properties (filters pushed to the scan, columns pruned, joins broadcast,
no accidental cartesian products, codegen coverage).

These checks are what "designed for 100 TB" means concretely: a plan
that reads all columns, misses a pushed filter, or cross-joins two fact
tables is wrong even when the answer is right.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class PlanFacts:
    """Load-bearing properties extracted from one physical plan."""

    pushed_filters: list[str]
    read_schemas: list[str]
    n_broadcast_joins: int
    n_sortmerge_joins: int
    n_shuffle_exchanges: int
    n_cartesian: int
    n_codegen_spans: int
    n_python_evals: int

    @property
    def n_joins(self) -> int:
        return self.n_broadcast_joins + self.n_sortmerge_joins


def plan_facts(df: DataFrame) -> PlanFacts:
    p = physical_plan(df)
    return PlanFacts(
        pushed_filters=[
            m.group(1)
            for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", p)
            if m.group(1).strip()
        ],
        read_schemas=re.findall(r"ReadSchema: (\S+)", p),
        n_broadcast_joins=len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoop", p)),
        n_sortmerge_joins=len(re.findall(r"SortMergeJoin|ShuffledHashJoin", p)),
        n_shuffle_exchanges=len(re.findall(r"Exchange (?:hash|range|Single)", p)),
        n_cartesian=len(re.findall(r"CartesianProduct", p)),
        # codegen stages appear as "WholeStageCodegen (n)" in formatted
        # explain and as "*(n) Operator" markers in plan toString()
        n_codegen_spans=len(re.findall(r"WholeStageCodegen|\*\(\d+\)", p)),
        n_python_evals=len(re.findall(r"(?:Batch|Arrow)?EvalPython|MapInPandas|FlatMapGroupsInPandas", p)),
    )


def scan_reads_only(df: DataFrame, allowed: set[str]) -> bool:
    """True iff every parquet scan's ReadSchema is a subset of
    ``allowed`` column names (column pruning reached the scan)."""
    for schema in plan_facts(df).read_schemas:
        cols = set(re.findall(r"(\w+):", schema))
        if not cols <= allowed:
            return False
    return True
