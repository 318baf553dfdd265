"""MATCH-clause IR and parser.

Grammar (reference: GraphView/GraphViewParser.cs:105-310):

    MATCH path ("," path)*
    path  := node ("-" "[" edgespec "]" "->" node)+
    node  := identifier (optionally [bracketed])
    edgespec := EdgeName ["*" [min ".." max]] ["AS" alias] ["{" attr ":" value ("," ...)* "}"]
                (AS may come before or after the attribute braces)

Semantics: node aliases bind to FROM entries; the same alias across
paths denotes the same node (the join graph may be cyclic); each
pattern edge is an inner equi-join edge-DF.src = srcNode.GlobalNodeId
AND edge-DF.sink = sinkNode.GlobalNodeId; ``*min..max`` marks a
variable-length path; ``*`` alone means 0..∞ (max_len -1). Attribute
predicates are equality filters on edge attributes
(values: 'string' or number — GraphViewParser.cs:176-191). Edges
without an alias get the auto-alias ``src_edge_sink``
(TranslateMatchClauseVisitor.cs:809-826).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class PatternEdge:
    edge_name: str
    src_alias: str
    sink_alias: str
    alias: str
    min_len: int = 1
    max_len: int = 1                      # -1 = unbounded
    attr_predicates: dict[str, object] = field(default_factory=dict)

    @property
    def is_path(self) -> bool:
        return not (self.min_len == 1 and self.max_len == 1)


@dataclass
class PatternGraph:
    node_aliases: list[str]
    edges: list[PatternEdge]

    def components(self) -> list[list[str]]:
        """Connected components of node aliases (union-find — the
        reference splits MATCH the same way,
        TranslateMatchClauseVisitor.cs:714-1056)."""
        parent = {a: a for a in self.node_aliases}

        def find(x: str) -> str:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for e in self.edges:
            ra, rb = find(e.src_alias), find(e.sink_alias)
            if ra != rb:
                parent[ra] = rb
        groups: dict[str, list[str]] = {}
        for a in self.node_aliases:
            groups.setdefault(find(a), []).append(a)
        return list(groups.values())


class MatchSyntaxError(ValueError):
    pass


def _strip_brackets(s: str) -> str:
    s = s.strip()
    if s.startswith("[") and s.endswith("]"):
        s = s[1:-1]
    return s.strip()


def _parse_attr_value(v: str):
    v = v.strip()
    if (v.startswith("'") and v.endswith("'")) or (
        v.startswith('"') and v.endswith('"')
    ):
        return v[1:-1]
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    return v


def _parse_edge_spec(spec: str, src_alias: str, sink_alias: str) -> PatternEdge:
    """Parse the inside of ``[...]``: name, *min..max, AS alias, {attrs}."""
    text = spec.strip()
    m = re.match(r"^(?P<name>[A-Za-z_]\w*)", text)
    if not m:
        raise MatchSyntaxError(f"bad edge spec: {spec!r}")
    name = m.group("name")
    text = text[m.end():].strip()

    min_len, max_len = 1, 1
    sm = re.match(r"^\*\s*(?:(?P<min>\d+)\s*\.\.\s*(?P<max>\d+))?", text)
    if sm and text.startswith("*"):
        if sm.group("min") is not None:
            min_len = int(sm.group("min"))
            max_len = int(sm.group("max"))
            if max_len < min_len:
                raise MatchSyntaxError(
                    "max length should be no less than min length"
                )
        else:
            min_len, max_len = 0, -1
        text = text[sm.end():].strip()

    alias = None
    attrs: dict[str, object] = {}
    # AS alias may appear before or after the attribute braces
    for _ in range(2):
        am = re.match(r"^AS\s+(?P<a>[A-Za-z_]\w*)", text, re.IGNORECASE)
        if am:
            alias = am.group("a")
            text = text[am.end():].strip()
            continue
        bm = re.match(r"^\{(?P<body>[^}]*)\}", text, re.DOTALL)
        if bm:
            for pair in bm.group("body").split(","):
                pair = pair.strip()
                if not pair:
                    continue
                k, _, v = pair.partition(":")
                # keys are lowercased by the reference lexer
                attrs[k.strip().strip("\"'").lower()] = _parse_attr_value(v)
            text = text[bm.end():].strip()
            continue
        break
    if text:
        raise MatchSyntaxError(f"trailing tokens in edge spec: {text!r}")
    if alias is None:
        alias = f"{src_alias}_{name}_{sink_alias}"
    return PatternEdge(
        edge_name=name,
        src_alias=src_alias,
        sink_alias=sink_alias,
        alias=alias,
        min_len=min_len,
        max_len=max_len,
        attr_predicates=attrs,
    )


# one path: N (-[spec]-> N)+
_PATH_TOKEN_RE = re.compile(
    r"\s*(?P<node>\[[^\]]+\]|[A-Za-z_][\w.]*)"
    r"|\s*-\s*\[(?P<edge>[^\]]*)\]\s*->"
)


def parse_match_paths(match_body: str) -> PatternGraph:
    """Parse the text after the MATCH keyword (comma-separated paths)."""
    aliases: list[str] = []
    edges: list[PatternEdge] = []

    for path in _split_paths(match_body):
        path = path.strip()
        if not path:
            continue
        # tokenize alternating node / edge parts
        parts: list[tuple[str, str]] = []   # ("node"|"edge", text)
        pos = 0
        expect_node = True
        while pos < len(path):
            chunk = path[pos:]
            if expect_node:
                m = re.match(r"\s*(\[[^\]]+\]|[A-Za-z_][\w.]*)", chunk)
                if not m:
                    raise MatchSyntaxError(f"expected node at: {chunk!r}")
                parts.append(("node", _strip_brackets(m.group(1))))
                pos += m.end()
                expect_node = False
            else:
                m = re.match(r"\s*-\s*\[([^\]]*)\]\s*->", chunk)
                if not m:
                    if chunk.strip():
                        raise MatchSyntaxError(f"expected -[edge]-> at: {chunk!r}")
                    break
                parts.append(("edge", m.group(1)))
                pos += m.end()
                expect_node = True
        if expect_node:
            raise MatchSyntaxError(f"path ends with a dangling edge: {path!r}")
        node_parts = [p for k, p in parts if k == "node"]
        edge_parts = [p for k, p in parts if k == "edge"]
        if len(node_parts) < 2 or len(edge_parts) != len(node_parts) - 1:
            raise MatchSyntaxError(f"malformed path: {path!r}")
        for a in node_parts:
            if a not in aliases:
                aliases.append(a)
        for i, espec in enumerate(edge_parts):
            edges.append(_parse_edge_spec(espec, node_parts[i], node_parts[i + 1]))
    if not edges:
        raise MatchSyntaxError("empty MATCH clause")
    return PatternGraph(node_aliases=aliases, edges=edges)


def _split_paths(body: str) -> list[str]:
    """Split on commas outside brackets/braces."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch in "[{(":
            depth += 1
        elif ch in "]})":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts
