"""Bulk load: delimited files → node tables / edge columns.

Reference: GraphView/BulkInsert.cs — BulkInsertNode (:486-770) streams a
delimited file through a custom IDataReader with KMP field splitting,
column subsetting and header skip into SqlBulkCopy; BulkInsertEdge
(:771-2350) loads (srcId, sinkId, attrs) rows, joins both sides to their
node tables' NodeId columns to resolve GlobalNodeIds, groups by source
and encodes adjacency blobs, then updates both edge directions.

Spark-native equivalents: the custom reader IS ``spark.read.csv``
(splitting, quoting, header, column subset all built in); the id-
resolution joins are two equi-joins against the node DataFrames; the
Encoder-aggregate/adjacency-update machinery disappears because edges
stay normalized (SURVEY.md §1.4). The reference's error modes are kept:
unknown columns and unresolvable node ids raise.

Scale notes: both loads are pure DataFrame plans — the CSV scan splits
by file blocks, id-resolution joins shuffle on the NodeId columns (or
broadcast when a node table is small), and nothing passes through the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from graphview_spark.graph import GraphDatabase


def read_input(
    spark: SparkSession,
    path: str,
    fmt: str = "csv",
    sep: str = ",",
    header: bool = True,
    columns: list[str] | None = None,
    line_sep: str | None = None,
) -> DataFrame:
    """Read a bulk-load input file: ``csv`` (the reference's delimited
    format), ``jsonl`` (line-delimited JSON — the training-corpus
    interchange staple), or ``parquet``. All three split by file blocks
    and read distributed; csv/jsonl types resolve at the cast below, so
    no inferSchema pass over the data. ``sep``/``line_sep`` are the
    reference's FIELDTERMINATOR/ROWTERMINATOR pair
    (BulkInsert.cs:156-202 — its custom reader KMP-matches arbitrary
    row terminators; Spark's csv lineSep covers the 1-2 char forms,
    which is every terminator the tutorials use)."""
    if fmt == "csv":
        opts = {"lineSep": line_sep} if line_sep else {}
        df = spark.read.options(**opts).csv(
            path, sep=sep, header=header, inferSchema=False)
        if not header:
            if columns is None:
                raise ValueError(
                    "headerless bulk load needs explicit columns=[...]"
                )
            if len(columns) != len(df.columns):
                raise ValueError(
                    f"file has {len(df.columns)} fields, "
                    f"columns names {len(columns)}"
                )
            df = df.toDF(*columns)
        return df
    if fmt == "jsonl":
        # one schema-discovery pass over line heads only; values recast
        # against the node table's declared types by the caller
        return spark.read.json(path)
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    raise ValueError(f"unsupported bulk format '{fmt}'")


def bulk_insert_nodes(
    g: GraphDatabase,
    table_name: str,
    path: str,
    sep: str = ",",
    header: bool = True,
    columns: list[str] | None = None,
    fmt: str = "csv",
    line_sep: str | None = None,
) -> int:
    """Load a delimited/JSONL/parquet file into a node table.

    ``columns`` names the file's fields in order when there is no header
    (the reference's "data column subset" — BulkInsert.cs:520-560);
    fields are matched to node properties case-insensitively, missing
    properties are null-padded, unknown fields raise.
    """
    t = g.catalog.table(table_name)
    df = read_input(g.spark, path, fmt=fmt, sep=sep, header=header,
                    columns=columns, line_sep=line_sep)
    props = {p.lower(): (p, typ) for p, typ in t.properties}
    sel = []
    seen = set()
    for c in df.columns:
        hit = props.get(c.lower())
        if hit is None:
            raise ValueError(
                f"file column '{c}' is not a property of node table '{t.name}'"
            )
        sel.append(F.col(c).cast(hit[1]).alias(hit[0]))
        seen.add(hit[0])
    for p, typ in t.properties:
        if p not in seen:
            sel.append(F.lit(None).cast(typ).alias(p))
    # count the input once instead of scanning the (growing) node union
    # twice — at scale those were two extra full passes
    n = df.count()
    g.insert_nodes_df(t.name, df.select(*sel))
    return n


def bulk_insert_edges(
    g: GraphDatabase,
    source_table: str,
    edge_name: str,
    path: str,
    sep: str = ",",
    header: bool = True,
    src_id_col: str | None = None,
    sink_id_col: str | None = None,
    attr_cols: list[str] | None = None,
    fmt: str = "csv",
    line_sep: str | None = None,
) -> int:
    """Load (srcNodeId, sinkNodeId, attrs...) rows into an edge column.

    NodeIds are the user-facing unique keys (ColumnRole:"NodeId"); both
    endpoints resolve to GlobalNodeIds by joining the node tables —
    exactly the reference's resolution joins (BulkInsert.cs:890-1010).
    Rows whose endpoints don't resolve raise (the reference surfaces a
    SqlBulkCopy FK-style failure).
    """
    e = g.catalog.resolve_edge(source_table, edge_name)
    src_t = g.catalog.table(e.source_table)
    sink_t = g.catalog.table(e.sink_table)
    if src_t.node_id_column is None or sink_t.node_id_column is None:
        raise ValueError("bulk edge load needs NodeId columns on both tables")

    if not header and fmt == "csv" and src_id_col is None:
        # the reference's null columnList (BulkInsertEdge(..., null, ...)):
        # positional file layout (srcId, sinkId, attrs in declared order)
        opts = {"lineSep": line_sep} if line_sep else {}
        raw = g.spark.read.options(**opts).csv(
            path, sep=sep, header=False, inferSchema=False)
        attr_names = [n for n, _ in e.attributes]
        names = ["__file_src", "__file_sink"] + attr_names[: len(raw.columns) - 2]
        if len(names) != len(raw.columns):
            raise ValueError(
                f"edge file has {len(raw.columns)} fields; expected 2 ids "
                f"+ up to {len(attr_names)} declared attributes"
            )
        df = raw.toDF(*names)
    else:
        df = read_input(g.spark, path, fmt=fmt, sep=sep, header=header,
                        line_sep=line_sep)
    cols = df.columns
    src_c = src_id_col or cols[0]
    sink_c = sink_id_col or cols[1]
    attrs = attr_cols if attr_cols is not None else cols[2:]

    # internal names: the file's own columns may be called src/sink
    src_nodes = g.nodes[src_t.name].select(
        F.col(src_t.node_id_column).alias("__src_key"),
        F.col("GlobalNodeId").alias("__src_gid"),
    )
    sink_nodes = g.nodes[sink_t.name].select(
        F.col(sink_t.node_id_column).alias("__sink_key"),
        F.col("GlobalNodeId").alias("__sink_gid"),
    )
    src_key_t = dict(src_t.properties)[src_t.node_id_column]
    sink_key_t = dict(sink_t.properties)[sink_t.node_id_column]

    # left joins + one aggregate compute total and resolved counts in a
    # single pass (the FK check used to cost two full scans)
    joined = (
        df.join(
            src_nodes, df[src_c].cast(src_key_t) == src_nodes["__src_key"], "left"
        ).join(
            sink_nodes,
            df[sink_c].cast(sink_key_t) == sink_nodes["__sink_key"],
            "left",
        )
    )
    ok = F.col("__src_gid").isNotNull() & F.col("__sink_gid").isNotNull()
    row = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(ok, 1)).alias("n_ok"),
    ).first()
    n_rows, n_resolved = row["n"], row["n_ok"]
    if n_resolved < n_rows:
        raise ValueError(
            f"{n_rows - n_resolved} of {n_rows} edge rows reference "
            f"unknown node ids"
        )
    pairs_cols = [
        F.col("__src_gid").alias("src"),
        F.col("__sink_gid").alias("sink"),
    ]
    for expr, (aname, atype) in zip(attrs, e.attributes):
        pairs_cols.append(F.col(expr).cast(atype).alias(aname))
    g.insert_edges_df(e.source_table, e.name, joined.select(*pairs_cols))
    return n_resolved
