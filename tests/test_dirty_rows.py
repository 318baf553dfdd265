"""Dirty-row behavior of the functional operator surfaces.

The parquet fixtures are clean, so the oracle gate never exercises
NULL/empty text or NULL embeddings — but at corpus scale dirty rows
are a certainty. Contract probed here: map-only text/dedup transforms
must not crash and must degrade to well-defined values (empty shingle
sets, zero-valued stats, dead-letter diagnostics) instead of killing
the job with an opaque executor traceback.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def dirty_docs(spark):
    rows = [
        (1, "a clean document with several words in it", "en"),
        (2, "", "en"),
        (3, None, "en"),
        (4, "   ", "en"),
        (5, "short", None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_minhash_signatures_survive_dirty_text(spark, dirty_docs):
    from graphview_spark.operators.dedup import minhash_signatures

    sigs = minhash_signatures(dirty_docs)
    got = {r["doc_id"] for r in sigs.collect()}
    # NULL/empty text has no 4-token shingle → no signature row (such
    # docs can't be near-duplicates at shingle granularity). A
    # whitespace-only doc splits into empty tokens and DOES get the
    # all-empty shingle — blank docs dedupe together, which is correct:
    # they are content-identical (and the DuckDB oracle mirrors the
    # same split semantics).
    assert got == {1, 4}


def test_quality_and_stats_zero_valued_on_dirty_text(spark, dirty_docs):
    from graphview_spark.operators.text import quality_milli_col

    out = dirty_docs.select(
        "doc_id", quality_milli_col(F.coalesce("text", F.lit(""))).alias("q")
    ).collect()
    vals = {r["doc_id"]: r["q"] for r in out}
    assert len(vals) == 5  # every row survives
    assert all(v is not None for v in vals.values())


def test_scrub_pii_passes_null_text_through(spark, dirty_docs):
    from graphview_spark.operators.text import scrub_pii

    out = {r["doc_id"]: r["text"] for r in scrub_pii(dirty_docs).collect()}
    assert out[3] is None  # NULL stays NULL, not a crash or ""
    assert out[2] == ""


def test_embed_lsh_bucket_udf_names_dirty_row(spark):
    """ADVICE r6 #4 regression: a NULL or ragged embedding surfaces a
    descriptive ValueError naming the batch position, not an opaque
    numpy vstack traceback."""
    from graphview_spark.operators.dedup import (
        _embed_lsh_planes,
        _table_buckets_col,
    )

    emb = spark.createDataFrame(
        [(1, [0.1] * 8), (2, None), (3, [0.2] * 3)],
        "id long, v array<double>",
    )
    planes = _embed_lsh_planes(8)
    with pytest.raises(Exception, match="filter or impute"):
        emb.select(_table_buckets_col(F.col("v"), planes)).collect()


def test_dedup_clusters_empty_pairs(spark):
    from graphview_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [], "doc_a long, doc_b long, jaccard double")
    assert dedup_clusters(pairs).count() == 0


def test_hll_sketch_skips_nothing_on_empty_group(spark):
    from graphview_spark.operators.sketch import hll_estimate, hll_registers

    df = spark.createDataFrame([], "g string, w string")
    est = hll_estimate(hll_registers(df, ["g"], "w"), ["g"])
    assert est.count() == 0
