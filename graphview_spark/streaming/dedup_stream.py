"""Streaming near-duplicate rejection at ingest.

Batch MinHash-LSH (operators/dedup.py) finds near-dup PAIRS in a static
corpus; at ingest time the question is different: "is this incoming
document a near-duplicate of ANYTHING accepted so far?" This module
answers it per micro-batch with the same signature math:

  1. the batch's documents get hashed-shingle sets + MinHash signatures
     (one narrow map pass — ``minhash_signatures``);
  2. band keys equi-join against the ACCEPTED signature store → candidate
     (new, old) pairs, verified by exact Jaccard on the hashed shingles;
  3. batch-internal duplicates resolve within the batch the same way
     (self band-join, keep the smallest doc_id of each near-dup group);
  4. survivors append to the store — a lazy union, compacted every
     ``compact_every`` batches.

Scale posture: the store lives PRE-EXPLODED by band key — one row per
(doc, band) — and compaction repartitions it on ``bkey`` before the
checkpoint (localCheckpoint preserves the partitioning), so the
per-batch probe join shuffles only the BATCH side against the settled
store; only the small un-compacted tail repartitions with it. A
deployment persists the same layout as a bucketed table keyed by band
for a fully exchange-free probe. Per-batch cost is O(batch · sig) +
band collisions — never a store rescan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphview_spark.operators.dedup import (
    N_BANDS,
    N_PERM,
    MINHASH_JACCARD_T,
    _jaccard,
    band_keys_col,
    minhash_signatures,
)


class StreamingDeduper:
    """``foreachBatch``-compatible near-dup filter.

    Usage::

        d = StreamingDeduper(spark)
        q = (docs_stream.writeStream.foreachBatch(d)
             .outputMode("append").start())
        ... d.accepted_df()  # the deduplicated corpus signatures

    ``sink`` (optional) receives each batch's ACCEPTED (doc_id, text)
    rows — e.g. a parquet appender."""

    def __init__(self, spark, threshold: float = MINHASH_JACCARD_T,
                 n_bands: int = N_BANDS, compact_every: int = 16,
                 sink=None):
        self.spark = spark
        self.threshold = threshold
        self.n_bands = n_bands
        self.rows = N_PERM // n_bands
        self.compact_every = compact_every
        self.sink = sink
        # pre-exploded band layout: one (doc_id, hs, bkey) row per band,
        # repartitioned on bkey at compaction (see module docstring)
        self.store: DataFrame | None = None
        self.batches = 0
        self.accepted_rows = 0
        self.rejected_rows = 0

    def _exploded(self, sigs: DataFrame) -> DataFrame:
        """(doc_id, hs, bkey) — one row per band of each signature."""
        return sigs.select(
            "doc_id", "hs",
            F.explode(band_keys_col(self.n_bands, self.rows)).alias("bkey"),
        )

    def _near_dup_pairs(self, left: DataFrame, right: DataFrame) -> DataFrame:
        """(l_doc, r_doc) pairs band-colliding AND Jaccard-verified; both
        inputs in the exploded (doc_id, hs, bkey) layout."""
        lb = left.select(
            F.col("doc_id").alias("l_doc"), F.col("hs").alias("l_hs"), "bkey"
        )
        rb = right.select(
            F.col("doc_id").alias("r_doc"), F.col("hs").alias("r_hs"), "bkey"
        )
        return (
            lb.join(rb, "bkey")
            .filter(F.col("l_doc") != F.col("r_doc"))
            .select("l_doc", "r_doc", "l_hs", "r_hs")
            .distinct()
            .filter(_jaccard(F.col("l_hs"), F.col("r_hs")) >= self.threshold)
            .select("l_doc", "r_doc")
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        n_in = batch_df.count()
        sigs = self._exploded(
            minhash_signatures(batch_df.select("doc_id", "text"))
        ).localCheckpoint(eager=True)

        # vs the accepted store
        if self.store is not None:
            hit_store = (
                self._near_dup_pairs(sigs, self.store)
                .select(F.col("l_doc").alias("doc_id"))
                .distinct()
            )
            sigs = sigs.join(hit_store, "doc_id", "left_anti")
        # batch-internal: canonical = smallest doc_id of each pair group
        internal = self._near_dup_pairs(sigs, sigs).filter(
            F.col("l_doc") > F.col("r_doc")
        )
        sigs = sigs.join(
            internal.select(F.col("l_doc").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        ).localCheckpoint(eager=True)

        # documents too short to shingle have no signature: they cannot
        # near-dup-match anything, so they are accepted unconditionally
        # (they never enter the store — nothing can collide with them)
        from graphview_spark.operators.dedup import SHINGLE_N

        short = batch_df.filter(
            F.size(F.split(F.col("text"), " ")) < SHINGLE_N
        ).select("doc_id")
        n_short = short.count()

        n_ok = sigs.select("doc_id").distinct().count() + n_short
        self.accepted_rows += n_ok
        self.rejected_rows += n_in - n_ok
        self.store = (
            sigs if self.store is None else self.store.unionByName(sigs)
        )
        self.batches += 1
        if self.batches % self.compact_every == 0:
            # settle the store on the probe key: subsequent batch joins
            # shuffle only the batch side against this partitioning
            n_part = self.spark.sparkContext.defaultParallelism
            self.store = self.store.repartition(
                n_part, F.col("bkey")
            ).localCheckpoint(eager=True)
        if self.sink is not None:
            keep = sigs.select("doc_id").distinct().unionByName(short)
            self.sink(batch_df.join(keep, "doc_id", "left_semi"))

    def accepted_df(self) -> DataFrame:
        if self.store is None:
            raise ValueError("no batches processed yet")
        return self.store.select("doc_id").distinct()

    # -- restart persistence -------------------------------------------
    # Structured Streaming checkpoints recover the SOURCE offsets, but
    # foreachBatch state is ours to keep: persist the signature store as
    # parquet partitioned-by-write on the probe key so a restarted
    # stream resumes rejecting against everything accepted before.
    def save_store(self, path: str) -> None:
        if self.store is None:
            raise ValueError("no batches processed yet")
        (
            self.store.repartition(
                self.spark.sparkContext.defaultParallelism, F.col("bkey")
            )
            .write.mode("overwrite")
            .parquet(path)
        )

    def load_store(self, path: str) -> None:
        """Adopt a previously saved store (call before starting the
        stream). Counters continue from zero — they are per-run stats."""
        self.store = self.spark.read.parquet(path)
