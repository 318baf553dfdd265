"""Property-based dialect tests: randomized MATCH/WHERE/CTE/aggregate
compositions executed through the dialect layer and checked row-for-row
against DuckDB running the equivalent ANSI SQL on the same data — the
same oracle discipline as the driver gate, but over generated queries
and generated graphs instead of fixed fixtures."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphview_spark.graph import GraphDatabase

nodes_strategy = st.lists(
    st.integers(min_value=-5, max_value=20),   # x property; index = id
    min_size=2,
    max_size=8,
)
edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),  # src index (mod len)
        st.integers(min_value=0, max_value=7),  # dst index (mod len)
        st.integers(min_value=0, max_value=2),  # w attribute
    ),
    min_size=1,
    max_size=12,
)

prop_settings = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _build(spark, xs, raw_edges):
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [N] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Property"] x INT,
            [ColumnRole:"Edge", Reference:"N",
             Attributes:{w:"int"}] E VARBINARY(max) )"""
    )
    vals = ",".join(f"({i},{x})" for i, x in enumerate(xs))
    g.execute(f"INSERT INTO N(id,x) VALUES{vals}")
    n = len(xs)
    edges = sorted({(s % n, t % n, w) for s, t, w in raw_edges})
    # map NodeIds to their assigned GlobalNodeIds (don't assume the
    # base+id coincidence — gid assignment is positional on this path)
    gid = {r["id"]: r["GlobalNodeId"] for r in g.nodes["N"].collect()}
    pairs = spark.createDataFrame(
        [(gid[s], gid[t], w) for s, t, w in edges],
        "src long, sink long, w int",
    )
    g.insert_edges_df("N", "E", pairs)
    con = duckdb.connect()
    con.execute("CREATE TABLE nodes(id INT, x INT)")
    con.executemany("INSERT INTO nodes VALUES (?,?)", list(enumerate(xs)))
    con.execute("CREATE TABLE edges(s INT, t INT, w INT)")
    if edges:
        con.executemany("INSERT INTO edges VALUES (?,?,?)", edges)
    return g, con


def _compare(df, con, sql):
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want, f"\nspark={got}\nduck={want}\noracle={sql}"


@given(
    xs=nodes_strategy,
    raw_edges=edges_strategy,
    hops=st.integers(min_value=1, max_value=2),
    where_mode=st.integers(min_value=0, max_value=3),
    threshold=st.integers(min_value=-2, max_value=10),
    attr_w=st.one_of(st.none(), st.integers(min_value=0, max_value=2)),
)
@prop_settings
def test_match_where_projection_matches_duckdb(
    spark, xs, raw_edges, hops, where_mode, threshold, attr_w
):
    g, con = _build(spark, xs, raw_edges)
    attr = f" {{w:{attr_w}}}" if attr_w is not None else ""
    if hops == 1:
        frm = f"FROM N a, N b MATCH a-[E{attr}]->b"
        sel = "a.id AS ai, b.id AS bi, a.x + b.x AS sx"
        dfrm = "FROM nodes a JOIN edges e ON e.s = a.id JOIN nodes b ON e.t = b.id"
        dsel = "a.id AS ai, b.id AS bi, a.x + b.x AS sx"
        dattr = f" AND e.w = {attr_w}" if attr_w is not None else ""
        dfrm = dfrm.replace("JOIN edges e ON e.s = a.id",
                            f"JOIN edges e ON e.s = a.id{dattr}")
    else:
        frm = f"FROM N a, N b, N c MATCH a-[E{attr}]->b-[E{attr}]->c"
        sel = "a.id AS ai, c.id AS bi, a.x + c.x AS sx"
        dattr = f" AND e1.w = {attr_w} AND e2.w = {attr_w}" \
            if attr_w is not None else ""
        dfrm = (
            "FROM nodes a JOIN edges e1 ON e1.s = a.id "
            "JOIN nodes b ON e1.t = b.id "
            "JOIN edges e2 ON e2.s = b.id "
            f"JOIN nodes c ON e2.t = c.id WHERE TRUE{dattr}"
        )
        dsel = "a.id AS ai, c.id AS bi, a.x + c.x AS sx"
    conj = "WHERE" if hops == 1 else "AND"
    wh = dwh = ""
    if where_mode == 1:
        wh = f" WHERE a.x >= {threshold}"
        dwh = f" {conj} a.x >= {threshold}"
    elif where_mode == 2:
        wh = f" WHERE b.x < {threshold}" if hops == 1 \
            else f" WHERE c.x < {threshold}"
        dwh = f" {conj} b.x < {threshold}" if hops == 1 \
            else f" {conj} c.x < {threshold}"
    elif where_mode == 3:
        wh = f" WHERE a.x >= {threshold} AND a.id <> {threshold}"
        dwh = f" {conj} a.x >= {threshold} AND a.id <> {threshold}"
    _compare(
        g.execute(f"SELECT {sel} {frm}{wh}"),
        con,
        f"SELECT {dsel} {dfrm}{dwh}",
    )


@given(
    xs=nodes_strategy,
    raw_edges=edges_strategy,
    threshold=st.integers(min_value=-2, max_value=10),
    use_cte=st.booleans(),
    having=st.booleans(),
)
@prop_settings
def test_match_aggregate_cte_matches_duckdb(
    spark, xs, raw_edges, threshold, use_cte, having
):
    g, con = _build(spark, xs, raw_edges)
    inner = (
        "SELECT a.id AS ai, COUNT(*) AS n, SUM(b.x) AS sx "
        "FROM N a, N b MATCH a-[E]->b GROUP BY a.id"
    )
    dinner = (
        "SELECT a.id AS ai, COUNT(*)::BIGINT AS n, SUM(b.x)::BIGINT AS sx "
        "FROM nodes a JOIN edges e ON e.s = a.id "
        "JOIN nodes b ON e.t = b.id GROUP BY a.id"
    )
    if having:
        inner += " HAVING COUNT(*) >= 2"
        dinner += " HAVING COUNT(*) >= 2"
    if use_cte:
        stmt = f"WITH m AS ({inner}) SELECT ai, n, sx FROM m WHERE sx >= {threshold}"
        dsql = f"WITH m AS ({dinner}) SELECT ai, n, sx FROM m WHERE sx >= {threshold}"
    else:
        stmt, dsql = inner, dinner
    _compare(g.execute(stmt), con, dsql)


@given(
    xs=nodes_strategy,
    raw_edges=edges_strategy,
    pivot=st.integers(min_value=0, max_value=5),
)
@prop_settings
def test_match_setops_match_duckdb(spark, xs, raw_edges, pivot):
    g, con = _build(spark, xs, raw_edges)
    stmt = (
        f"SELECT b.id AS i FROM N a, N b MATCH a-[E]->b WHERE a.id < {pivot} "
        f"UNION "
        f"SELECT a.id AS i FROM N a, N b MATCH a-[E]->b WHERE b.x >= {pivot}"
    )
    dsql = (
        f"SELECT b.id AS i FROM nodes a JOIN edges e ON e.s = a.id "
        f"JOIN nodes b ON e.t = b.id WHERE a.id < {pivot} "
        f"UNION "
        f"SELECT a.id AS i FROM nodes a JOIN edges e ON e.s = a.id "
        f"JOIN nodes b ON e.t = b.id WHERE b.x >= {pivot}"
    )
    _compare(g.execute(stmt), con, dsql)


@given(
    xs=nodes_strategy,
    off=st.integers(min_value=0, max_value=9),
    n=st.integers(min_value=1, max_value=9),
    fetch=st.booleans(),
    plural=st.booleans(),
)
@prop_settings
def test_offset_fetch_paging_matches_duckdb(spark, xs, off, n, fetch, plural):
    """Randomized OFFSET/FETCH paging over a deterministic ORDER BY must
    return exactly DuckDB's LIMIT/OFFSET slice of the same rows."""
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [P] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Property"] x INT )"""
    )
    vals = ",".join(f"({i},{x})" for i, x in enumerate(xs))
    g.execute(f"INSERT INTO P(id,x) VALUES{vals}")
    rows = "ROWS" if plural else "ROW"
    clause = f"OFFSET {off} {rows}"
    if fetch:
        clause += f" FETCH NEXT {n} {rows} ONLY"
    got = [
        (r["id"], r["x"])
        for r in g.execute(
            f"SELECT id, x FROM P ORDER BY x DESC, id ASC {clause}"
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE p (id INT, x INT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", list(enumerate(xs)))
    limit = f"LIMIT {n} " if fetch else ""
    want = con.execute(
        f"SELECT id, x FROM p ORDER BY x DESC, id ASC {limit}OFFSET {off}"
    ).fetchall()
    assert got == want
