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


def q_skew_salted_agg(spark, sf_dir: str) -> DataFrame:
    """Oracle-gated form of the salted aggregation: lineitem grouped by
    its (few, hence hot at scale) returnflag/linestatus keys through the
    two-level salted path — results equal the plain GROUP BY by
    construction, which IS the oracle."""
    from graphview_spark.session import read_table

    li = read_table(spark, sf_dir, "lineitem")
    out = salted_aggregate(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "n_rows": ("l_quantity", "count"),
            "sum_qty": ("l_quantity", "sum"),
            "min_price": ("l_extendedprice", "min"),
            "max_price": ("l_extendedprice", "max"),
        },
    )
    return out.select(
        "l_returnflag", "l_linestatus", "n_rows",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("min_price", 2).alias("min_price"),
        F.round("max_price", 2).alias("max_price"),
    )


ORACLE_SKEW_SALTED_AGG = """
SELECT l_returnflag, l_linestatus,
       count(l_quantity) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""

EXTRA_QUERIES = {"skew_salted_agg": q_skew_salted_agg}
EXTRA_ORACLES = {"skew_salted_agg": ORACLE_SKEW_SALTED_AGG}


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
