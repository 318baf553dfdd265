"""Result-sink layouts (SURVEY §2.1 result-sink row, scale leg):
partitioned writes must prune at the reader, bucketed tables must join
with zero shuffle exchanges, ORC round-trips through read_input."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from graphview_spark.plans.inspect import physical_plan, plan_facts
from graphview_spark.sources.bulk import read_input
from graphview_spark.sources.sink import write_bucketed_table, write_files


def test_partitioned_write_prunes_at_reader(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 4).cast("int").alias("shard"),
    )
    path = os.path.join(str(tmp_path), "parted")
    write_files(df, path, partition_by=["shard"])
    # hive layout on disk
    assert any(d.startswith("shard=") for d in os.listdir(path))
    back = spark.read.parquet(path).filter(F.col("shard") == 2)
    assert back.count() == 25
    # the partition filter must prune at planning time, not post-scan
    assert "PartitionFilters: [isnotnull(shard" in physical_plan(back)


def test_partition_by_unknown_column_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="partition columns"):
        write_files(spark.range(3), str(tmp_path / "x"), partition_by=["nope"])


def test_max_records_per_file_rolls_files(spark, tmp_path):
    path = os.path.join(str(tmp_path), "rolled")
    write_files(
        spark.range(100).coalesce(1), path, max_records_per_file=30
    )
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) >= 4  # 100 rows / 30-row cap


def test_bucketed_join_has_zero_exchanges(spark, tmp_path):
    """The 100 TB story: two tables bucketed on the join key join
    bucket-aligned — no Exchange in the plan, no shuffle at run time."""
    left = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed_table(left, "sink_buck_l", ["k"], 8, sort_by=["k"])
    write_bucketed_table(right, "sink_buck_r", ["k"], 8, sort_by=["k"])
    try:
        joined = spark.table("sink_buck_l").join(
            spark.table("sink_buck_r"), "k"
        )
        facts = plan_facts(joined)
        assert facts.n_shuffle_exchanges == 0, physical_plan(joined)
        assert joined.count() == 1000
        got = joined.filter(F.col("k") == 7).first()
        assert (got["a"], got["b"]) == (14, 21)
    finally:
        spark.sql("DROP TABLE IF EXISTS sink_buck_l")
        spark.sql("DROP TABLE IF EXISTS sink_buck_r")


def test_orc_roundtrip_via_read_input(spark, tmp_path):
    df = spark.range(10).select(
        F.col("id"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    path = os.path.join(str(tmp_path), "orc_out")
    write_files(df, path, fmt="orc")
    back = read_input(spark, path, fmt="orc")
    assert back.count() == 10
    assert set(back.columns) == {"id", "name"}


def test_unsupported_format_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported sink format"):
        write_files(spark.range(1), str(tmp_path / "y"), fmt="avro")
