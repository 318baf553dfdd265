"""End-to-end flagship: corpus → graph → pipeline, one continuous flow.

The switch-over story in a single test: documents bulk-load into a
property graph through the dialect, quality/dedup pipeline operators
compute keep-decisions as DataFrames, the decisions flow back into the
graph via UPDATE...FROM, MATCH queries answer over the curated graph,
and the survivors pack into training sequences."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphview_spark.graph import GraphDatabase
from graphview_spark.session import read_table


def test_corpus_graph_pipeline_roundtrip(spark, sf_dir):
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [Source] (
            [ColumnRole:"NodeId"] sname varchar(20) )"""
    )
    g.execute(
        """CREATE TABLE [Doc] (
            [ColumnRole:"NodeId"] doc_id BIGINT,
            [ColumnRole:"Property"] lang varchar(8),
            [ColumnRole:"Property"] kept bit,
            [ColumnRole:"Edge",Reference:"Source"] FromSource VARBINARY(max) )"""
    )

    docs = read_table(spark, sf_dir, "documents")
    g.insert_nodes_df(
        "Source", docs.select(F.col("source").alias("sname")).distinct()
    )
    g.insert_nodes_df(
        "Doc",
        docs.select("doc_id", "lang", F.lit(None).cast("boolean").alias("kept")),
    )

    # wire Doc -> Source edges through the dialect (endpoint resolution
    # via a registered staging view)
    docs.select("doc_id", "source").createOrReplaceTempView("doc_src")
    g.execute(
        "INSERT EDGE INTO Doc.FromSource "
        "SELECT d, s FROM Doc d, Source s, doc_src x "
        "WHERE d.doc_id = x.doc_id AND s.sname = x.source"
    )
    n_docs = docs.count()
    assert g.edge_count("Doc.FromSource") == n_docs

    # pipeline decisions: top-half quality AND not an exact duplicate
    from graphview_spark.operators.dedup import q_dedup_exact
    from graphview_spark.operators.pipeline import (
        pack_sequences,
        q_pipeline_quality_quantile,
    )

    quality = q_pipeline_quality_quantile(spark, sf_dir).select(
        "doc_id", F.col("kept").alias("q_keep")
    )
    dups = q_dedup_exact(spark, sf_dir).select(
        "doc_id", F.col("is_dup").alias("d_drop")
    )
    decisions = quality.join(dups, "doc_id").select(
        "doc_id", (F.col("q_keep") & ~F.col("d_drop")).alias("keep")
    )
    decisions.createOrReplaceTempView("decisions")

    # decisions flow back into the graph via UPDATE ... FROM
    g.execute(
        "UPDATE D SET kept = s.keep FROM Doc D JOIN decisions s "
        "ON D.doc_id = s.doc_id"
    )

    # MATCH over the curated graph: kept docs per source
    per_source = {
        r["sname"]: r["n_kept"]
        for r in g.execute(
            """SELECT S.sname AS sname, count(*) AS n_kept
               FROM Doc D, Source S MATCH D-[FromSource]->S
               WHERE D.kept = true
               GROUP BY S.sname"""
        ).collect()
    }
    n_kept_graph = sum(per_source.values())
    n_kept_truth = decisions.filter("keep").count()
    assert n_kept_graph == n_kept_truth > 0

    # survivors pack into training sequences, stream intact per shard
    survivors = docs.join(
        decisions.filter("keep").select("doc_id"), "doc_id"
    )
    packed = pack_sequences(survivors)
    assert packed.count() == n_kept_truth
    total_tokens = packed.agg(F.sum("n_tokens")).first()[0]
    ends = (
        packed.groupBy("shard")
        .agg(F.max(F.col("seq_id") * 2048 + F.col("seq_offset") + F.col("n_tokens")).alias("e"))
        .agg(F.sum("e"))
        .first()[0]
    )
    assert ends == total_tokens
