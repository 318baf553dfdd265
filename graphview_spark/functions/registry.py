"""User-defined function surface (SURVEY.md §2.8).

Reference behavior: ``CREATE FUNCTION`` is parsed and passed through to
SQL Server (WProcedureStatement.cs:150-250); GraphView itself ships only
generated CLR helpers that are obsolete on Spark (binary packing,
estimate hacks — SURVEY §2.8 maps every one of them to "not needed").
What remains to reproduce is the *user* surface: register a scalar
function usable from both the DataFrame API and the SQL dialect.

Two tiers, mirroring SURVEY's UDF guidance:
  - ``register_scalar``: row-at-a-time Python UDF. Correct everywhere,
    slow path — each call crosses the Python boundary per row.
  - ``register_vectorized``: pandas_udf over Arrow batches, the 10-100×
    faster tier for anything numeric/string-vectorizable.
Builtins need no registration: the dialect passes unknown function
calls straight to Spark SQL (the analog of the reference forwarding
them to SQL Server untranslated, WScalarExpression.cs:272-350).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


class FunctionRegistry:
    """Named user functions of one engine session."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.functions: dict[str, str] = {}      # name -> tier

    def register_scalar(
        self, name: str, fn: Callable, return_type: str = "string"
    ) -> None:
        """Row-at-a-time Python UDF (the compatibility tier)."""
        self.spark.udf.register(name, fn, return_type)
        self.functions[name] = "scalar"

    def register_vectorized(
        self, name: str, fn: Callable, return_type: str
    ) -> None:
        """Arrow-batched pandas UDF (the performance tier): ``fn`` maps
        pandas Series → pandas Series."""
        self.spark.udf.register(name, F.pandas_udf(fn, return_type))
        self.functions[name] = "vectorized"

    def list_functions(self) -> dict[str, str]:
        return dict(self.functions)
