"""Parser for the annotated CREATE TABLE dialect.

The reference lexes column annotations like
``[ColumnRole:"Edge", Reference:"Book", Attributes:{dist:"int"}]`` with a
regex lexer and token masking (GraphView/GraphViewParser.cs:559-848).
We parse the same surface with a clean grammar instead of token surgery.

Accepted form (square brackets around identifiers optional, case
insensitive, trailing commas tolerated)::

    CREATE TABLE [People] (
        [ColumnRole: "NodeId"] id INT,
        [ColumnRole: "Property"] name varchar(20),
        [ColumnRole: "Edge", Reference: "People"] Knows VARBINARY(max),
        [ColumnRole: "Edge", Reference: "City",
         Attributes: {dist: "int", toll: "bool"}] Road VARBINARY(max)
    )
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from graphview_spark.catalog import EDGE_ATTR_TYPES, normalize_sql_type


@dataclass
class ColumnDef:
    role: str                       # nodeid | property | edge
    name: str
    sql_type: str
    reference: str | None = None    # sink table for edges
    attributes: list[tuple[str, str]] = field(default_factory=list)


@dataclass
class NodeTableDDL:
    table: str
    columns: list[ColumnDef]


_ANNOT_RE = re.compile(r"\[\s*ColumnRole\s*:", re.IGNORECASE)


def _strip_brackets(ident: str) -> str:
    ident = ident.strip()
    if ident.startswith("[") and ident.endswith("]"):
        ident = ident[1:-1]
    return ident.strip()


def _parse_annotation(text: str) -> dict:
    """Parse the inside of ``[ColumnRole:"Edge", Reference:"X",
    Attributes:{a:"int", b:"bool"}]``."""
    out: dict = {}
    # Attributes sub-object first (so the outer key=value scan can skip it)
    m = re.search(r"Attributes\s*:\s*\{(?P<body>[^}]*)\}", text, re.IGNORECASE)
    if m:
        attrs: list[tuple[str, str]] = []
        for pair in m.group("body").split(","):
            pair = pair.strip()
            if not pair:
                continue
            k, _, v = pair.partition(":")
            tname = v.strip().strip("\"'").lower()
            if tname not in EDGE_ATTR_TYPES:
                raise ValueError(
                    f"unsupported edge attribute type '{tname}' "
                    f"(allowed: {sorted(set(EDGE_ATTR_TYPES))})"
                )
            attrs.append((k.strip().strip("\"'"), EDGE_ATTR_TYPES[tname]))
        out["attributes"] = attrs
        text = text[: m.start()] + text[m.end():]
    for pair in re.finditer(
        r"(?P<k>[A-Za-z_]+)\s*:\s*\"(?P<v>[^\"]*)\"", text
    ):
        out[pair.group("k").lower()] = pair.group("v")
    return out


def _split_columns(body: str) -> list[str]:
    """Split the CREATE TABLE body on commas at depth 0 (parens/braces/
    brackets nest)."""
    parts, depth, cur, in_str = [], 0, [], False
    for ch in body:
        if in_str:
            cur.append(ch)
            if ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
            cur.append(ch)
        elif ch in "([{":
            depth += 1
            cur.append(ch)
        elif ch in ")]}":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur and "".join(cur).strip():
        parts.append("".join(cur))
    return parts


def parse_column_def(raw: str) -> ColumnDef:
    """Parse one annotated column definition (``[ColumnRole:...] name
    TYPE``) — shared by CREATE TABLE and ALTER TABLE ... ADD."""
    raw = raw.strip().rstrip(";").rstrip(",")
    am = re.match(
        r"\[(?P<ann>\s*ColumnRole\s*:.*?)\]\s*(?P<rest>.*)$",
        raw,
        re.IGNORECASE | re.DOTALL,
    )
    if not am:
        raise ValueError(
            f"every column needs a [ColumnRole: ...] annotation "
            f"(reference GraphViewParser.cs:1066-1071): {raw!r}"
        )
    ann = _parse_annotation(am.group("ann"))
    rest = am.group("rest").strip()
    rm = re.match(
        r"(?P<col>\[[^\]]+\]|[A-Za-z_]\w*)\s+(?P<type>[A-Za-z]+(\s*\([^)]*\))?)",
        rest,
    )
    if not rm:
        raise ValueError(f"cannot parse column definition: {rest!r}")
    role = ann.get("columnrole", "").lower()
    if role not in ("nodeid", "property", "edge"):
        raise ValueError(f"unknown ColumnRole {role!r}")
    c = ColumnDef(
        role=role,
        name=_strip_brackets(rm.group("col")),
        sql_type=normalize_sql_type(rm.group("type")),
        reference=ann.get("reference"),
        attributes=ann.get("attributes", []),
    )
    if c.role == "edge" and not c.reference:
        raise ValueError(f"edge column '{c.name}' needs Reference:\"SinkTable\"")
    return c


def parse_create_node_table(ddl: str) -> NodeTableDDL:
    ddl = ddl.strip().rstrip(";")
    m = re.match(
        r"CREATE\s+TABLE\s+(?P<name>\[[^\]]+\]|[A-Za-z_][\w.]*)\s*\((?P<body>.*)\)\s*$",
        ddl,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError("not a CREATE TABLE statement")
    table = _strip_brackets(m.group("name")).split(".")[-1]
    cols: list[ColumnDef] = []
    for raw in _split_columns(m.group("body")):
        raw = raw.strip()
        if not raw:
            continue
        cols.append(parse_column_def(raw))
    if sum(1 for c in cols if c.role == "nodeid") > 1:
        raise ValueError("at most one NodeId column per table")
    for c in cols:
        if c.role == "edge" and not c.reference:
            raise ValueError(f"edge column '{c.name}' needs Reference:\"SinkTable\"")
    return NodeTableDDL(table=table, columns=cols)
