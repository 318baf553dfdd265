"""Skew-handling utilities — explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles skewed SHUFFLE
JOINS at runtime, but two shapes still need explicit salting at 100 TB:

  - aggregations with a hot key (one reducer gets the whole key's rows;
    AQE cannot split a single group) → ``salted_aggregate`` does a
    two-level partial/final aggregation over a salted key;
  - broadcast-ineligible joins against a *few* known-hot keys →
    ``salt_explode_join`` replicates the small side per salt so the big
    side's hot key spreads over ``n_salts`` reducers.

Both are pure DataFrame composition — results are exactly equal to the
unsalted forms (asserted in tests/test_skew.py); only the shuffle layout
changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-level aggregation over a salted key.

    ``aggs`` maps output column → (input column, fn) where fn is one of
    ``sum``/``count``/``min``/``max`` (the algebraic aggregates that
    decompose into partial+final; avg = sum/count composed by the
    caller). Level 1 groups on (key, salt) — at most ``n_salts`` groups
    per hot key, each sized 1/n_salts of the key's rows; level 2 merges
    the partials on the key alone, touching only n_salts rows per key."""
    salt = (F.rand(seed=7) * n_salts).cast("int").alias("_salt")
    partial_aggs = []
    final_aggs = []
    for out, (col, fn) in aggs.items():
        p = f"_p_{out}"
        if fn == "count":
            partial_aggs.append(F.count(col).alias(p))
            final_aggs.append(F.sum(p).cast("long").alias(out))
        elif fn == "sum":
            partial_aggs.append(F.sum(col).alias(p))
            final_aggs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(p))
            final_aggs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_aggs.append(F.max(col).alias(p))
            final_aggs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"unsupported salted aggregate fn: {fn}")
    return (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*partial_aggs)
        .groupBy(*key_cols)
        .agg(*final_aggs)
    )


def salt_explode_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed keys: the big side gets a random
    salt in [0, n_salts), the small side is exploded n_salts× (one copy
    per salt value), and the join runs on (key, salt) — a hot key's rows
    spread over n_salts reducers instead of one. Output columns equal the
    plain ``big.join(small, key, how)``."""
    b = big.withColumn("_salt", (F.rand(seed=11) * n_salts).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")
