"""Streaming distribution-drift monitoring (PSI between snapshots).

The PSI drift report (operators/pipeline.py q_pipeline_drift) reads a
per-(lang, bucket) count table — and counts SUM-MERGE trivially, so a
``foreachBatch`` sink can maintain each snapshot's bucket histogram in
a store bounded at langs × DRIFT_BUCKETS rows FOREVER (the HDR
rollup's count-sum discipline applied to the drift statistic):

  1. each batch computes its own (lang, bucket) counts — one
     map-side-combinable aggregate over the BATCH only;
  2. batch counts sum-merge into the accumulated store (a groupBy
     over ≤ store + batch-distinct rows, never data);
  3. two snapshot stores (yesterday / today) full-outer-join into the
     (lang, bucket, ca, cb) table ``drift_report`` consumes — the
     "did this week's corpus shift?" alarm WITHOUT re-reading either
     snapshot.

Per-batch cost is O(batch + store); each merge materializes to one
tiny localCheckpoint (mandatory — a foreachBatch frame is only valid
during its batch). The replay row's DuckDB oracle computes the whole
drift report directly from the corpus — equality proves the per-store
count merge AND the cross-store join rollup lose nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from graphview_spark.operators.pipeline import (
    _oracle_drift,
    drift_bucket,
    drift_report,
)
from graphview_spark.plans import lazy as _lazy


class StreamingBucketCounts:
    """``foreachBatch``-compatible bucket-histogram tracker: maintains
    per-(group, bucket) row counts of ``bucket_col`` over everything
    ever seen, in a store bounded at groups × buckets rows.

    Usage::

        s = StreamingBucketCounts(spark, group_cols=["lang"])
        q = (docs_stream.writeStream.foreachBatch(s)
             .outputMode("append").start())
        ... s.counts()   # DataFrame: group..., bucket, c
    """

    def __init__(self, spark, group_cols: list[str],
                 bucket_col: str = "bucket"):
        self.spark = spark
        self.group_cols = list(group_cols)
        self.bucket_col = bucket_col
        self._store: DataFrame | None = None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        keys = [*self.group_cols, self.bucket_col]
        batch_cnt = batch_df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("c"))
        if self._store is None:
            merged = batch_cnt
        else:
            merged = (
                self._store.unionByName(batch_cnt)
                .groupBy(*keys)
                .agg(F.sum("c").alias("c"))
            )
        self._store = _lazy.pin(merged)

    def counts(self) -> DataFrame:
        if self._store is None:
            raise ValueError("no batches processed yet")
        return self._store


DRIFT_REPLAY_BATCHES = 2


def q_stream_drift_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle exposure for the streaming drift rollup: the even/odd
    doc_id halves play the baseline/candidate snapshots, each replayed
    through its OWN StreamingBucketCounts store as deterministic
    micro-batches; the two bounded stores full-outer-join into the
    (lang, bucket, ca, cb) table and ``drift_report`` computes the PSI
    report. The DuckDB oracle computes the same report directly from
    the whole corpus — equality proves the count-sum merge and the
    two-store rollup end to end."""
    from graphview_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", drift_bucket(F.col("n_chars")).alias("bucket"))
    stores = []
    for half in (0, 1):
        st = StreamingBucketCounts(spark, ["lang"])
        half_docs = docs.filter(F.col("doc_id") % 2 == half)
        for b in range(DRIFT_REPLAY_BATCHES):
            st(half_docs.filter(
                (F.col("doc_id") / 2).cast("long")
                % DRIFT_REPLAY_BATCHES == b), b)
        stores.append(st)
    a = stores[0].counts().select(
        "lang", "bucket", F.col("c").alias("ca"))
    b2 = stores[1].counts().select(
        "lang", "bucket", F.col("c").alias("cb"))
    cnt = (
        a.join(b2, ["lang", "bucket"], "full_outer")
        .select(
            "lang", "bucket",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    return drift_report(cnt)


EXTRA_QUERIES = {
    "stream_drift_replay": q_stream_drift_replay,
}
EXTRA_ORACLES = {
    # the batch drift oracle verbatim: the direct whole-corpus report —
    # equality IS the merge/rollup proof
    "stream_drift_replay": _oracle_drift(),
}
