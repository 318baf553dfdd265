"""graphview_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Microsoft/GraphView, re-expressed Spark-first.

The reference (/root/reference, C# middleware translating an SQL+MATCH
dialect to T-SQL for SQL Server) defines WHAT we compute: a property-graph
data model over relational node tables, MATCH pattern queries as equi-joins,
graph DML, node/edge views, variable-length paths. Our executor is Spark
SQL / Catalyst / Tungsten; we plan above Catalyst and let AQE pick physical
strategies.

Layout:
  session      — SparkSession factory tuned for local[32] testing / cluster scale
  catalog      — GraphCatalog metadata (analog of the reference's 8 metadata
                 tables, GraphView/GraphViewConnection.cs:287-400)
  ddl          — CREATE TABLE annotation-dialect parser
                 (GraphView/GraphViewParser.cs:559-848)
  graph        — GraphDatabase facade (nodes, edges, DML, views, procs)
  matching/    — MATCH parser, pattern graph, join-DAG planner, BFS paths
  operators/   — dedup, similarity, text analysis, multimodal (scale ops)
  streaming/   — Structured Streaming surface for event tables
  sources/     — bulk CSV node/edge loaders (GraphView/BulkInsert.cs)
"""

from graphview_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
