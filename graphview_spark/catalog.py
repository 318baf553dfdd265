"""GraphCatalog — the metadata layer.

Spark-native analog of the reference's 8 metadata tables
(GraphView/GraphViewConnection.cs:287-400: _NodeTableCollection,
_NodeTableColumnCollection, _EdgeAttributeCollection,
_EdgeAverageDegreeCollection, _StoredProcedureCollection,
_NodeViewColumnCollection, _EdgeViewAttributeCollection,
_NodeViewCollection). One small in-memory catalog, JSON-persistable —
metadata is tiny and read wholesale at planning time, exactly like the
reference loads GraphMetaData (TranslateMatchClauseVisitor.cs:129-146).

GlobalNodeId scheme preserved from the reference
(GraphView/GraphViewConnection.cs:878-886): ``table_id << 48 | seq`` so
every node id is globally unique and encodes its table.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field


TABLE_ID_SHIFT = 48

# Edge-attribute type system of the reference (WGraphTableColumn.cs:57-64):
# Int, Long, Double, String, Bool. Node properties may use any Spark type.
EDGE_ATTR_TYPES = {
    "int": "int",
    "integer": "int",
    "long": "bigint",
    "bigint": "bigint",
    "double": "double",
    "float": "double",
    "string": "string",
    "varchar": "string",
    "nvarchar": "string",
    "bool": "boolean",
    "boolean": "boolean",
    "bit": "boolean",
}


def normalize_sql_type(t: str) -> str:
    """Map a T-SQL-ish declared type to a Spark SQL type string."""
    t = t.strip().lower()
    base = t.split("(")[0].strip()
    mapping = {
        "int": "int",
        "integer": "int",
        "bigint": "bigint",
        "smallint": "smallint",
        "tinyint": "tinyint",
        "float": "double",
        "real": "float",
        "double": "double",
        "varchar": "string",
        "nvarchar": "string",
        "char": "string",
        "nchar": "string",
        "text": "string",
        "string": "string",
        "bit": "boolean",
        "bool": "boolean",
        "boolean": "boolean",
        "date": "date",
        "datetime": "timestamp",
        "datetime2": "timestamp",
        "timestamp": "timestamp",
        "varbinary": "binary",
        "binary": "binary",
    }
    if base in ("decimal", "numeric"):
        # preserve declared precision/scale — mapping to a fixed
        # decimal(18,4) silently re-scaled user columns
        m = re.match(r"(?:decimal|numeric)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", t)
        return f"decimal({m.group(1)},{m.group(2)})" if m else "decimal(18,4)"
    return mapping.get(base, "string")


@dataclass
class EdgeType:
    """A typed, directed edge column declared on its source node table
    (reference: adjacency varbinary column, GraphViewParser.cs:1087-1102).
    Here the edge *is* a normalized DataFrame (src, edge_id, sink, attrs)."""

    name: str                      # edge column name, e.g. "Knows"
    source_table: str
    sink_table: str                # the Reference:"..." annotation
    attributes: list[tuple[str, str]] = field(default_factory=list)  # (name, spark type)

    @property
    def qualified(self) -> str:
        return f"{self.source_table}.{self.name}"


@dataclass
class NodeTable:
    """A node type: one relational table whose rows are nodes
    (reference: GraphViewConnection.cs:823-888)."""

    name: str
    table_id: int
    node_id_column: str | None          # ColumnRole:"NodeId" column
    properties: list[tuple[str, str]]   # (name, spark type) incl. node id col
    edges: dict[str, EdgeType] = field(default_factory=dict)

    def gid_base(self) -> int:
        return self.table_id << TABLE_ID_SHIFT


@dataclass
class NodeView:
    """UNION-ALL view over member node tables with property alignment
    (reference: View.cs:95-137). Missing properties are null-padded;
    `_NodeType` discriminates members."""

    name: str
    members: list[str]
    # property -> {member table -> source column or None}
    prop_map: dict[str, dict[str, str | None]] = field(default_factory=dict)


@dataclass
class EdgeView:
    """A virtual edge merging several physical edge columns
    (reference: View.cs:830-874)."""

    name: str
    members: list[tuple[str, str]]      # (source_table, edge_name)


@dataclass
class StoredProcedure:
    """Named parameterized statement list (reference:
    GraphViewConnection.cs:1619-1698)."""

    name: str
    params: list[str]
    statements: list[str]


class GraphCatalog:
    """All graph metadata for one graph database."""

    def __init__(self) -> None:
        self.tables: dict[str, NodeTable] = {}
        self.node_views: dict[str, NodeView] = {}
        self.edge_views: dict[str, EdgeView] = {}
        self.procedures: dict[str, StoredProcedure] = {}
        self._next_table_id = 1

    # -- case-insensitive lookups (T-SQL identifiers are) ---------------
    def table(self, name: str) -> NodeTable:
        t = self._find(self.tables, name)
        if t is None:
            raise KeyError(f"node table not found: {name}")
        return t

    def has_table(self, name: str) -> bool:
        return self._find(self.tables, name) is not None

    def node_view(self, name: str) -> NodeView | None:
        return self._find(self.node_views, name)

    def edge_view(self, name: str) -> EdgeView | None:
        return self._find(self.edge_views, name)

    @staticmethod
    def _find(d: dict, name: str):
        if name in d:
            return d[name]
        low = name.lower()
        for k, v in d.items():
            if k.lower() == low:
                return v
        return None

    def register_table(
        self,
        name: str,
        node_id_column: str | None,
        properties: list[tuple[str, str]],
        edges: list[EdgeType],
    ) -> NodeTable:
        if self.has_table(name):
            raise ValueError(f"node table already exists: {name}")
        t = NodeTable(
            name=name,
            table_id=self._next_table_id,
            node_id_column=node_id_column,
            properties=properties,
            edges={e.name.lower(): e for e in edges},
        )
        self._next_table_id += 1
        self.tables[name] = t
        return t

    def resolve_edge(self, source_table: str, edge_name: str) -> EdgeType:
        """Validity check per the reference (TranslateMatchClauseVisitor.cs:
        434-517): the edge must be declared on the source table."""
        t = self.table(source_table)
        e = t.edges.get(edge_name.lower())
        if e is None:
            raise ValueError(
                f"edge '{edge_name}' is not declared on node table '{source_table}'"
            )
        return e

    # -- persistence ----------------------------------------------------
    def to_json(self) -> str:
        def enc(o):
            if hasattr(o, "__dict__"):
                return o.__dict__
            return str(o)

        return json.dumps(
            {
                "tables": {k: enc_table(v) for k, v in self.tables.items()},
                "node_views": {k: v.__dict__ for k, v in self.node_views.items()},
                "edge_views": {k: v.__dict__ for k, v in self.edge_views.items()},
                "procedures": {k: v.__dict__ for k, v in self.procedures.items()},
                "next_table_id": self._next_table_id,
            },
            indent=1,
            default=enc,
        )

    @classmethod
    def from_json(cls, s: str) -> GraphCatalog:
        raw = json.loads(s)
        cat = cls()
        cat._next_table_id = raw["next_table_id"]
        for name, t in raw["tables"].items():
            edges = {
                k: EdgeType(
                    name=e["name"],
                    source_table=e["source_table"],
                    sink_table=e["sink_table"],
                    attributes=[tuple(a) for a in e["attributes"]],
                )
                for k, e in t["edges"].items()
            }
            cat.tables[name] = NodeTable(
                name=t["name"],
                table_id=t["table_id"],
                node_id_column=t["node_id_column"],
                properties=[tuple(p) for p in t["properties"]],
                edges=edges,
            )
        for name, v in raw.get("node_views", {}).items():
            cat.node_views[name] = NodeView(**v)
        for name, v in raw.get("edge_views", {}).items():
            ev = EdgeView(name=v["name"], members=[tuple(m) for m in v["members"]])
            cat.edge_views[name] = ev
        for name, p in raw.get("procedures", {}).items():
            cat.procedures[name] = StoredProcedure(**p)
        return cat


def enc_table(t: NodeTable) -> dict:
    return {
        "name": t.name,
        "table_id": t.table_id,
        "node_id_column": t.node_id_column,
        "properties": t.properties,
        "edges": {k: e.__dict__ for k, e in t.edges.items()},
    }
