"""Shared column-expression helpers for the operator modules."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def eval_once(col: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``col`` to a lambda variable so ``body`` can reference it
    many times while it is EVALUATED once per row.

    Catalyst inlines non-trivial sub-expressions into every reference
    site inside higher-order-function lambdas — ``slice(split(text),
    i, n)`` re-splits the document for every n-gram position, turning
    a linear tokenize into a quadratic one (measured 4× on the 5-gram
    explode at sf0.1, and the factor grows with document length).
    Wrapping the expression as the single element of an array and
    ``transform``-ing over it binds it to a NamedLambdaVariable, which
    is evaluated exactly once per row; ``get(..., 0)`` unwraps the
    result. Pure plan-level rewrite — output values are identical.
    """
    return F.get(F.transform(F.array(col), body), 0)
