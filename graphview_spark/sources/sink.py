"""Result sinks: partitioned files and bucketed tables.

Reference: GraphView materializes query results through SqlBulkCopy /
INSERT..SELECT into SQL Server tables (BulkInsert.cs, the SELECT INTO
path in GraphViewCommand); the storage layout (pages, indexes) is the
server's concern. On Spark the sink layout IS the scale lever, so this
module makes the two layouts that matter at 100 TB first-class:

- **partitioned writes** (``partition_by``): hive-style directory
  partitioning — downstream readers prune partitions at planning time,
  so a date- or corpus-filtered scan never touches excluded files.
- **bucketed tables** (``buckets``/``bucket_by``): pre-shuffled layout
  on the join/agg key. Two tables bucketed on the same key join with
  ZERO exchanges — at 100 TB that removes the dominant cost of every
  fact-fact join that repeats across jobs.

Both are plain ``DataFrameWriter`` plans: the writer shuffles once (or
not at all for partition-only writes) and every executor writes its own
files; nothing passes through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FILE_FORMATS = {"parquet", "orc", "csv", "json"}


def write_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
    **options,
) -> None:
    """Write a result DataFrame to a file sink, optionally hive-partitioned.

    ``max_records_per_file`` caps file size without an extra shuffle
    (a repartition would; the writer just rolls files). For csv/json a
    header/compression can ride in through ``options``.
    """
    if fmt not in _FILE_FORMATS:
        raise ValueError(
            f"unsupported sink format '{fmt}' (one of {sorted(_FILE_FORMATS)})"
        )
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        missing = [c for c in partition_by if c not in df.columns]
        if missing:
            raise ValueError(f"partition columns not in result: {missing}")
        w = w.partitionBy(*partition_by)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    buckets: int,
    sort_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Save a result as a bucketed (and optionally sort-ordered) table.

    Bucketing persists the shuffle: a later equi-join or aggregation on
    ``bucket_by`` between two tables with the same bucket count reads
    bucket-aligned splits and skips the exchange entirely (verified by
    the no-Exchange plan assertion in tests/test_sink.py). ``sort_by``
    additionally pre-orders rows inside each bucket so sort-merge joins
    skip their sort. Bucket count is a layout decision: pick so one
    bucket of the LARGER table fits an executor core's working set
    (at 100 TB / 4096 buckets ≈ 24 GB splits — size accordingly).
    """
    if not bucket_by:
        raise ValueError("bucket_by must name at least one column")
    w = (
        df.write.format(fmt)
        .mode(mode)
        .bucketBy(buckets, *bucket_by)
    )
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def read_bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
