"""Salting utilities produce exactly the unsalted results — only the
shuffle layout changes."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphview_spark.operators.skew import salt_explode_join, salted_aggregate


def test_salted_aggregate_equals_plain(spark, sf_dir):
    from graphview_spark.session import read_table

    li = read_table(spark, sf_dir, "lineitem")
    plain = {
        r["l_returnflag"]: (r["n"], round(r["qty"], 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("l_quantity").alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], round(r["qty"], 2))
        for r in salted_aggregate(
            li,
            ["l_returnflag"],
            {"n": ("l_quantity", "count"), "qty": ("l_quantity", "sum")},
        ).collect()
    }
    assert salted == plain


def test_salt_explode_join_equals_plain(spark, sf_dir):
    from graphview_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = sorted(
        (r["o_orderkey"], r["c_name"])
        for r in orders.join(cust, "o_custkey").collect()
    )
    salted = sorted(
        (r["o_orderkey"], r["c_name"])
        for r in salt_explode_join(orders, cust, "o_custkey").collect()
    )
    assert salted == plain
