"""HyperLogLog sketch operators — determinism, mergeability, accuracy.

The estimate itself is deterministic (md5 hash, integer registers,
dyadic-rational sums), so accuracy assertions are exact reruns of a
fixed dataset, not statistical flakes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphview_spark.operators.sketch import (
    HLL_M,
    hll_estimate,
    hll_registers,
)


def _ints(spark, n, label="a"):
    return spark.range(n).select(
        F.lit(label).alias("g"), F.col("id").cast("string").alias("w"))


def test_register_table_is_bounded(spark):
    """10k distinct values collapse to ≤ HLL_M register rows — the
    bounded-output property that replaces the vocabulary-sized shuffle
    at scale."""
    regs = hll_registers(_ints(spark, 10_000), ["g"], "w")
    n = regs.count()
    assert n <= HLL_M
    assert n >= HLL_M * 0.9  # 10k values fill nearly every bucket


def test_estimate_accuracy_deterministic(spark):
    """Relative error on 10k distinct values within the ~6.5% standard
    error band for m=256 (3σ bound: 20%). Deterministic: same data,
    same hash, same estimate every run."""
    est = hll_estimate(
        hll_registers(_ints(spark, 10_000), ["g"], "w"), ["g"]
    ).first()
    assert abs(est["est_distinct"] - 10_000) / 10_000 < 0.20
    again = hll_estimate(
        hll_registers(_ints(spark, 10_000), ["g"], "w"), ["g"]
    ).first()
    assert again["est_distinct"] == est["est_distinct"]


def test_small_range_correction_path(spark):
    """A handful of distinct values takes the m·ln(m/V) branch and
    lands exactly (linear counting is near-exact when V ≈ m)."""
    est = hll_estimate(
        hll_registers(_ints(spark, 5), ["g"], "w"), ["g"]
    ).first()
    assert est["n_registers"] <= 5
    assert est["est_distinct"] == 5


def test_merge_equals_direct(spark):
    """Lossless mergeability: register-wise max over two disjoint
    shards == registers of the union, hence identical estimates —
    the property that lets per-shard sketches roll up without
    re-reading the corpus."""
    a = _ints(spark, 6_000)
    b = spark.range(4_000, 12_000).select(
        F.lit("a").alias("g"), F.col("id").cast("string").alias("w"))
    direct = hll_estimate(
        hll_registers(a.unionByName(b), ["g"], "w"), ["g"]).first()
    ra = hll_registers(a, ["g"], "w")
    rb = hll_registers(b, ["g"], "w")
    merged = (
        ra.unionByName(rb)
        .groupBy("g", "bucket")
        .agg(F.max("m").alias("m"))
    )
    via_merge = hll_estimate(merged, ["g"]).first()
    assert via_merge["est_distinct"] == direct["est_distinct"]
    assert via_merge["n_registers"] == direct["n_registers"]


def test_grouped_estimates_independent(spark):
    """Groups sketch independently: a 100-value group next to a
    10k-value group keeps its small-range-corrected count."""
    df = _ints(spark, 10_000, "big").unionByName(_ints(spark, 100, "small"))
    rows = {
        r["g"]: r["est_distinct"]
        for r in hll_estimate(hll_registers(df, ["g"], "w"), ["g"]).collect()
    }
    assert abs(rows["big"] - 10_000) / 10_000 < 0.20
    assert abs(rows["small"] - 100) / 100 < 0.20
