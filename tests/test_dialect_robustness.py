"""Parser robustness: the same statements in the formatting variants
real T-SQL scripts contain — mixed case, odd whitespace, comments in
awkward places, bracketed identifiers, trailing semicolons."""

from __future__ import annotations

import pytest

from graphview_spark.graph import GraphDatabase


@pytest.fixture()
def g(spark):
    g = GraphDatabase(spark)
    g.execute(
        """create   table [People](
            [ColumnRole:"NodeId"]id INT,
            [ColumnRole : "Property"] name varchar(20),
            [ColumnRole:"Edge",Reference:"People"]Knows VARBINARY(max))"""
    )
    g.execute("insert into People(id,name) values(1,'A'),(2,'B'),(3,'C');")
    g.execute(
        "INSERT\tEDGE INTO People.Knows\nSELECT x,y FROM People x,People y "
        "WHERE x.id=1 AND y.id=2"
    )
    return g


VARIANTS = [
    # mixed case keywords, no spaces around operators
    "select B.name from People A,People B match A-[Knows]->B where A.id=1",
    # newlines everywhere + trailing semicolon
    "SELECT\n  B.name\nFROM People A , People B\nMATCH A-[Knows]->B\n;",
    # comments interleaved (line and block)
    """SELECT B.name -- projection
       FROM People A, /* the source */ People B
       MATCH A-[Knows]->B /* one hop */ WHERE A.id = 1""",
    # bracketed identifiers in FROM and WHERE
    "SELECT B.name FROM [People] A, [People] B MATCH A-[Knows]->B "
    "WHERE A.[id] = 1",
    # DISTINCT + TOP together, parenthesized TOP
    "SELECT DISTINCT TOP (5) B.name FROM People A, People B "
    "MATCH A-[Knows]->B",
]


@pytest.mark.parametrize("sql", VARIANTS)
def test_select_variants(g, sql):
    rows = g.execute(sql).collect()
    assert [r["name"] for r in rows] == ["B"]


def test_whitespace_heavy_dml(g):
    g.execute("  update   People  set name='Z'   where id = 3 ;")
    assert {r["name"] for r in g.execute("SELECT name FROM People").collect()} == {
        "A", "B", "Z",
    }
    g.execute("DELETE\nNODE FROM People\nWHERE People.id = 3")
    assert g.node_count("People") == 2


def test_string_literals_protect_keywords(g):
    # keywords and '--' inside string literals must not confuse parsing
    g.execute("UPDATE People SET name = 'FROM -- WHERE /* x */' WHERE id = 1")
    got = g.execute("SELECT name FROM People WHERE id = 1").collect()[0]["name"]
    assert got == "FROM -- WHERE /* x */"
    # escaped quotes
    g.execute("UPDATE People SET name = 'it''s ok' WHERE id = 2")
    got = g.execute("SELECT name FROM People WHERE id = 2").collect()[0]["name"]
    assert got == "it's ok"


def test_case_insensitive_table_and_edge_names(g):
    rows = g.execute(
        "SELECT b.name FROM people a, PEOPLE b MATCH a-[knows]->b"
    ).collect()
    assert [r["name"] for r in rows] == ["B"]


def test_proc_with_comments_and_nested_if(g):
    g.execute(
        """CREATE PROCEDURE Tag @pid INT, @tag varchar(10) AS
           BEGIN
             -- update the name when the person exists
             UPDATE People SET name = @tag WHERE id = @pid;
           END"""
    )
    g.execute_procedure("Tag", pid=2, tag="tagged")
    assert g.execute(
        "SELECT name FROM People WHERE id = 2"
    ).collect()[0]["name"] == "tagged"
    out = g.execute_script(
        """
        DECLARE @n INT = 0;
        WHILE @n < 3
        BEGIN
            IF @n = 1
            BEGIN
                EXEC Tag @pid = 1, @tag = 'looped';
            END;
            SET @n = @n + 1;
        END;
        SELECT name FROM People WHERE id = 1
        """
    )
    assert out.collect()[0]["name"] == "looped"


def test_insert_negative_and_null_values(g):
    g.execute(
        """CREATE TABLE [Nums] (
            [ColumnRole:"NodeId"] k INT,
            [ColumnRole:"Property"] x FLOAT,
            [ColumnRole:"Property"] note varchar(10) )"""
    )
    g.execute("INSERT INTO Nums(k, x, note) VALUES(-5, -2.5, NULL)")
    r = g.execute("SELECT k, x, note FROM Nums").collect()[0]
    assert (r["k"], r["x"], r["note"]) == (-5, -2.5, None)


def test_merge_bracketed_target(g, spark):
    spark.createDataFrame([(9, "nine")], ["id", "nm"]).createOrReplaceTempView(
        "m_src"
    )
    g.execute(
        """MERGE INTO [People] t USING m_src s ON t.id = s.id
           WHEN NOT MATCHED THEN INSERT ([id], [name]) VALUES (s.id, s.nm)"""
    )
    assert g.execute(
        "SELECT name FROM People WHERE id = 9"
    ).collect()[0]["name"] == "nine"


def test_setops_between_match_queries(g):
    g.execute(
        "INSERT EDGE INTO People.Knows SELECT x,y FROM People x, People y "
        "WHERE x.id = 2 AND y.id = 3"
    )
    # UNION (distinct) across two MATCH queries
    out = g.execute(
        "SELECT b.id AS i FROM People a, People b MATCH a-[Knows]->b "
        "WHERE a.id = 1 "
        "UNION "
        "SELECT b.id AS i FROM People a, People b MATCH a-[Knows]->b "
        "WHERE a.id = 2"
    )
    assert sorted(r["i"] for r in out.collect()) == [2, 3]
    # EXCEPT with a trailing ORDER BY applying to the combined result
    out = g.execute(
        "SELECT a.id AS i FROM People a, People b MATCH a-[Knows]->b "
        "EXCEPT "
        "SELECT b.id AS i FROM People a, People b MATCH a-[Knows]->b "
        "ORDER BY i DESC"
    )
    assert [r["i"] for r in out.collect()] == [1]
    # MATCH branch unioned with a plain-SQL branch
    out = g.execute(
        "SELECT b.id AS i FROM People a, People b MATCH a-[Knows]->b "
        "WHERE a.id = 1 "
        "UNION ALL SELECT 99 AS i"
    )
    assert sorted(r["i"] for r in out.collect()) == [2, 99]


def test_intersect_precedence(g):
    # T-SQL: INTERSECT binds tighter than UNION/EXCEPT, so
    # A UNION B INTERSECT C == A UNION (B INTERSECT C). With
    # left-to-right evaluation ({1}∪{5})∩{7} would be empty.
    out = g.execute(
        "SELECT a.id AS i FROM People a, People b MATCH a-[Knows]->b "
        "UNION SELECT 5 AS i "
        "INTERSECT SELECT 7 AS i"
    )
    assert sorted(r["i"] for r in out.collect()) == [1]
    # a run of INTERSECTs folds into one group
    out = g.execute(
        "SELECT a.id AS i FROM People a, People b MATCH a-[Knows]->b "
        "UNION SELECT 5 AS i "
        "INTERSECT SELECT 5 AS i "
        "INTERSECT SELECT 5 AS i"
    )
    assert sorted(r["i"] for r in out.collect()) == [1, 5]
    # leading INTERSECT group then UNION
    out = g.execute(
        "SELECT a.id AS i FROM People a, People b MATCH a-[Knows]->b "
        "INTERSECT SELECT 1 AS i "
        "UNION SELECT 9 AS i"
    )
    assert sorted(r["i"] for r in out.collect()) == [1, 9]


def test_match_inside_subqueries(g):
    # derived table wrapping a MATCH query
    out = g.execute(
        "SELECT t.i + 10 AS j FROM "
        "(SELECT b.id AS i FROM People a, People b MATCH a-[Knows]->b) t"
    )
    assert [r["j"] for r in out.collect()] == [12]
    # IN-subquery over a MATCH query inside a plain statement
    out = g.execute(
        "SELECT id FROM People WHERE id IN "
        "(SELECT b.id FROM People a, People b MATCH a-[Knows]->b)"
    )
    assert [r["id"] for r in out.collect()] == [2]
    # MATCH statement whose WHERE nests another MATCH subquery
    out = g.execute(
        "SELECT b.id AS i FROM People a, People b MATCH a-[Knows]->b "
        "WHERE b.id IN (SELECT b2.id FROM People a2, People b2 "
        "MATCH a2-[Knows]->b2)"
    )
    assert [r["i"] for r in out.collect()] == [2]


def test_insert_edge_from_match_source(g):
    # materialize friend-of-friend as a new edge type via a MATCH source
    g.execute(
        'ALTER TABLE People ADD '
        '[ColumnRole:"Edge",Reference:"People"] Fof VARBINARY(max)'
    )
    g.execute(
        "INSERT EDGE INTO People.Knows SELECT x,y FROM People x, People y "
        "WHERE x.id = 2 AND y.id = 3"
    )
    g.execute(
        "INSERT EDGE INTO People.Fof SELECT a, c FROM People a, People b, "
        "People c MATCH a-[Knows]->b-[Knows]->c"
    )
    got = g.execute(
        "SELECT a.id AS s, c.id AS t FROM People a, People c MATCH a-[Fof]->c"
    ).collect()
    assert [(r["s"], r["t"]) for r in got] == [(1, 3)]


def test_update_from_match_source(g):
    g.execute(
        'ALTER TABLE People ADD [ColumnRole:"Property"] tag varchar(10)'
    )
    g.execute("UPDATE B SET tag = 'reached' FROM People A, People B "
              "MATCH A-[Knows]->B")
    got = {r["id"]: r["tag"] for r in g.execute(
        "SELECT id, tag FROM People").collect()}
    assert got[2] == "reached" and got[1] is None


def test_select_into_with_union_and_match(g):
    g.execute(
        "SELECT b.id AS i INTO Reached FROM People a, People b "
        "MATCH a-[Knows]->b UNION SELECT 42 AS i"
    )
    got = sorted(
        r["i"] for r in g.execute("SELECT i FROM Reached").collect()
    )
    assert got == [2, 42]


def test_varlen_path_in_subquery(g):
    g.execute(
        "INSERT EDGE INTO People.Knows SELECT x,y FROM People x, People y "
        "WHERE x.id = 2 AND y.id = 3"
    )
    out = g.execute(
        "SELECT max(t.h) AS mx FROM (SELECT p.hops AS h FROM People a, "
        "People b MATCH a-[Knows*1..3 AS p]->b WHERE a.id = 1) t"
    ).collect()
    assert out[0]["mx"] == 2


def test_pivot_unpivot_passthrough(g):
    """T-SQL PIVOT/UNPIVOT shapes reach Spark SQL untranslated (the
    reference passes them through to SQL Server the same way)."""
    rows = g.execute(
        "SELECT * FROM (SELECT name, id FROM People) "
        "PIVOT (sum(id) FOR name IN ('A','B'))"
    ).collect()
    assert [tuple(rows[0])] == [(1, 2)]
    melted = g.execute(
        "SELECT name, metric, v FROM People "
        "UNPIVOT (v FOR metric IN (id)) ORDER BY name"
    ).collect()
    assert [(r["name"], r["metric"], r["v"]) for r in melted] == [
        ("A", "id", 1),
        ("B", "id", 2),
        ("C", "id", 3),
    ]


def test_grouping_sets_passthrough(g):
    """GROUP BY GROUPING SETS reaches Spark SQL untranslated."""
    rows = g.execute(
        "SELECT name, SUM(id) AS s FROM People "
        "GROUP BY GROUPING SETS ((name), ())"
    ).collect()
    by_name = {r["name"]: r["s"] for r in rows}
    assert by_name == {"A": 1, "B": 2, "C": 3, None: 6}


def test_cross_and_outer_apply_rewrite(g):
    """T-SQL CROSS/OUTER APPLY → Spark LATERAL (the reference passes
    APPLY through to SQL Server; Spark spells it LATERAL)."""
    rows = g.execute(
        "SELECT p.name, k.cnt FROM People p "
        "CROSS APPLY (SELECT count(*) AS cnt FROM People q "
        "WHERE q.id > p.id) k ORDER BY p.name"
    ).collect()
    assert [(r["name"], r["cnt"]) for r in rows] == [
        ("A", 2), ("B", 1), ("C", 0),
    ]
    rows = g.execute(
        "SELECT p.name, k.other FROM People p "
        "OUTER APPLY (SELECT max(q.name) AS other FROM People q "
        "WHERE q.id = p.id + 1) k ORDER BY p.name"
    ).collect()
    assert [(r["name"], r["other"]) for r in rows] == [
        ("A", "B"), ("B", "C"), ("C", None),
    ]


def test_top_n_percent(g):
    rows = g.execute(
        "SELECT TOP 34 PERCENT id FROM People ORDER BY id"
    ).collect()
    # 34% of 3 rows → ceil(1.02) = 2
    assert [r["id"] for r in rows] == [1, 2]
    rows = g.execute(
        "SELECT TOP (100) PERCENT id FROM People ORDER BY id DESC"
    ).collect()
    assert [r["id"] for r in rows] == [3, 2, 1]


def test_distinct_top_and_decimal_percent(g):
    rows = g.execute(
        "SELECT DISTINCT TOP 2 id FROM People ORDER BY id"
    ).collect()
    assert [r["id"] for r in rows] == [1, 2]
    rows = g.execute(
        "SELECT DISTINCT TOP 67 PERCENT id FROM People ORDER BY id"
    ).collect()
    assert [r["id"] for r in rows] == [1, 2, 3]  # ceil(2.01) = 3
    rows = g.execute(
        "SELECT TOP 50.5 PERCENT id FROM People ORDER BY id"
    ).collect()
    assert [r["id"] for r in rows] == [1, 2]  # ceil(1.515) = 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="PERCENT"):
        g.execute("SELECT TOP 1.5 id FROM People")
    with _pytest.raises(ValueError, match="APPLY"):
        g.execute(
            "SELECT * FROM People p CROSS APPLY generate_series(1, p.id) s"
        )


def test_string_split_apply(g):
    """CROSS/OUTER APPLY STRING_SPLIT → LATERAL VIEW explode(split(...))
    (the reference forwards TVF APPLY untranslated,
    WTableReference.cs:241-295). Separator is regex-quoted, so regex
    metacharacters split literally."""
    g.execute("UPDATE People SET name = 'a.b.c' WHERE id = 1")
    rows = g.execute(
        "SELECT p.id, s.value FROM People p "
        "CROSS APPLY STRING_SPLIT(p.name, '.') s "
        "WHERE p.id = 1 ORDER BY s.value"
    ).collect()
    assert [(r["id"], r["value"]) for r in rows] == [
        (1, "a"), (1, "b"), (1, "c"),
    ]
    # derived column list renames `value`
    rows = g.execute(
        "SELECT s.tok FROM People p "
        "CROSS APPLY STRING_SPLIT(p.name, '.') AS s(tok) "
        "WHERE p.id = 2"
    ).collect()
    assert [r["tok"] for r in rows] == ["B"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="enable_ordinal"):
        g.execute(
            "SELECT * FROM People p CROSS APPLY STRING_SPLIT(p.name, '.', 1) s"
        )


def test_openjson_apply(g):
    """OPENJSON default schema (scalar key/value subset) and the WITH
    (...) typed-column form → from_json + explode/inline."""
    g.execute("""UPDATE People SET name = '{"x": 1, "y": "two"}' WHERE id = 3""")
    rows = g.execute(
        "SELECT j.key, j.value FROM People p "
        "CROSS APPLY OPENJSON(p.name) j WHERE p.id = 3 ORDER BY j.key"
    ).collect()
    assert [(r["key"], r["value"]) for r in rows] == [("x", "1"), ("y", "two")]
    rows = g.execute(
        "SELECT p.id, j.x, j.y FROM People p "
        "CROSS APPLY OPENJSON(p.name) WITH (x INT '$.x', y VARCHAR(10)) j "
        "WHERE p.id = 3"
    ).collect()
    assert [(r["id"], r["x"], r["y"]) for r in rows] == [(3, 1, "two")]
    # OUTER APPLY keeps rows whose JSON doesn't parse (NULL map → no rows
    # from explode, but LATERAL VIEW OUTER emits one null row)
    rows = g.execute(
        "SELECT p.id, j.key FROM People p "
        "OUTER APPLY OPENJSON(p.name) j ORDER BY p.id, j.key"
    ).collect()
    assert [(r["id"], r["key"]) for r in rows] == [
        (1, None), (2, None), (3, "x"), (3, "y"),
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="nested paths"):
        g.execute(
            "SELECT j.x FROM People p "
            "CROSS APPLY OPENJSON(p.name) WITH (x INT '$.deep.x') j"
        )


@pytest.mark.parametrize("sep", [".", "|", "*", "+", "?", "(", ")", "[", "$"])
def test_string_split_regex_metachar_separators(g, sep):
    """STRING_SPLIT treats the separator as a literal; Spark split()
    takes a regex — the \\Q..\\E quoting must make metacharacters split
    literally."""
    g.execute(f"UPDATE People SET name = 'x{sep}y{sep}z' WHERE id = 1")
    rows = g.execute(
        f"SELECT s.value FROM People p "
        f"CROSS APPLY STRING_SPLIT(p.name, '{sep}') s "
        f"WHERE p.id = 1 ORDER BY s.value"
    ).collect()
    assert [r["value"] for r in rows] == ["x", "y", "z"]


def test_tsql_builtins_iif_stringagg_datepart(g):
    """IIF→if, STRING_AGG→listagg (same WITHIN GROUP clause on Spark 4),
    REPLICATE→repeat, DATEPART(part,…)→date_part('part',…) with T-SQL
    abbreviation mapping."""
    rows = g.execute(
        "SELECT IIF(id > 1, 'big', 'small') AS sz, REPLICATE('x', id) AS xs "
        "FROM People ORDER BY id"
    ).collect()
    assert [(r["sz"], r["xs"]) for r in rows] == [
        ("small", "x"), ("big", "xx"), ("big", "xxx"),
    ]
    rows = g.execute(
        "SELECT STRING_AGG(name, '+') WITHIN GROUP (ORDER BY name DESC) "
        "AS all_names FROM People"
    ).collect()
    assert rows[0]["all_names"] == "C+B+A"
    rows = g.execute(
        "SELECT DATEPART(yy, CAST('2024-03-05 07:08:09' AS TIMESTAMP)) AS y, "
        "DATEPART(mm, CAST('2024-03-05' AS DATE)) AS m, "
        "DATEPART(hour, CAST('2024-03-05 07:08:09' AS TIMESTAMP)) AS h"
    ).collect()
    assert (rows[0]["y"], rows[0]["m"], rows[0]["h"]) == (2024, 3, 7)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="DATEPART"):
        g.execute("SELECT DATEPART(nanosecond, GETDATE()) AS x")


def test_tsql_convert_rewrite(g):
    """CONVERT(type, expr) → CAST(expr AS type) with the argument order
    swapped; nested CONVERTs unwrap; the 3-arg style form raises."""
    rows = g.execute(
        "SELECT CONVERT(VARCHAR(10), id) AS s, "
        "CONVERT(FLOAT, CONVERT(INT, id)) AS f FROM People ORDER BY id"
    ).collect()
    assert [(r["s"], r["f"]) for r in rows] == [
        ("1", 1.0), ("2", 2.0), ("3", 3.0),
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="style"):
        g.execute("SELECT CONVERT(VARCHAR(10), GETDATE(), 120) AS d")


def test_string_split_apply_followed_by_join_and_where(g):
    """The LATERAL VIEW must move to the end of the FROM clause — Spark
    rejects a lateral view before a JOIN; and a missing alias must raise
    the clear diagnostic, not swallow the next keyword."""
    rows = g.execute(
        "SELECT p.id, k.nm, s.value FROM People p "
        "CROSS APPLY STRING_SPLIT(p.name, '.') s "
        "JOIN (SELECT 1 AS jid, 'joined' AS nm) k ON k.jid = p.id "
        "WHERE p.id = 1 ORDER BY s.value"
    ).collect()
    assert [(r["id"], r["nm"], r["value"]) for r in rows] == [(1, "joined", "A")]
    # two APPLYs keep their relative order past the boundary move
    rows = g.execute(
        "SELECT s.value AS v1, t.value AS v2 FROM People p "
        "CROSS APPLY STRING_SPLIT(p.name, '.') s "
        "CROSS APPLY STRING_SPLIT('u.w', '.') t "
        "WHERE p.id = 2 ORDER BY v1, v2"
    ).collect()
    assert [(r["v1"], r["v2"]) for r in rows] == [("B", "u"), ("B", "w")]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="alias"):
        g.execute(
            "SELECT value FROM People p "
            "CROSS APPLY STRING_SPLIT(p.name, '.') WHERE p.id = 1"
        )
    with _pytest.raises(ValueError, match="case-sensitive"):
        g.execute(
            "SELECT j.x FROM People p "
            "CROSS APPLY OPENJSON(p.name) WITH (x INT '$.X') j"
        )
    with _pytest.raises(ValueError, match="DATEPART"):
        g.execute("SELECT DATEPART(wk, GETDATE()) AS w")
    # dw matches T-SQL DATEFIRST 7: Sunday=1 (2023-01-01 is a Sunday)
    rows = g.execute(
        "SELECT DATEPART(dw, CAST('2023-01-01' AS DATE)) AS dw"
    ).collect()
    assert rows[0]["dw"] == 1


def test_offset_fetch_paging(g):
    # T-SQL 2012 paging clause → Spark LIMIT/OFFSET (pure respelling)
    rows = g.execute(
        "SELECT id FROM People ORDER BY id "
        "OFFSET 1 ROWS FETCH NEXT 1 ROWS ONLY"
    ).collect()
    assert [r["id"] for r in rows] == [2]
    # OFFSET without FETCH: skip only
    rows = g.execute(
        "SELECT id FROM People ORDER BY id OFFSET 2 ROWS"
    ).collect()
    assert [r["id"] for r in rows] == [3]
    # singular ROW spelling + FETCH FIRST variant + MATCH context
    rows = g.execute(
        "SELECT B.name FROM People A, People B MATCH A-[Knows]->B "
        "ORDER BY B.name OFFSET 0 ROW FETCH FIRST 5 ROW ONLY"
    ).collect()
    assert [r["name"] for r in rows] == ["B"]
    # literal text containing the clause must not be rewritten
    got = g.execute(
        "SELECT 'OFFSET 9 ROWS' AS s FROM People WHERE id = 1"
    ).collect()[0]["s"]
    assert got == "OFFSET 9 ROWS"


def test_group_by_cube_passthrough(g):
    """GROUP BY CUBE (and ROLLUP) reach Spark SQL verbatim through the
    translator's GROUP BY clause — the CUBE surface of SURVEY §2.4's
    grouping-sets row (VERDICT r6 'What's missing #3')."""
    rows = g.execute(
        "SELECT A.name AS src, COUNT(*) AS n FROM People A, People B "
        "MATCH A-[Knows]->B GROUP BY CUBE (A.name)"
    ).collect()
    got = {(r["src"], r["n"]) for r in rows}
    assert got == {("A", 1), (None, 1)}
    rows = g.execute(
        "SELECT A.name AS src, B.name AS dst, COUNT(*) AS n "
        "FROM People A, People B MATCH A-[Knows]->B "
        "GROUP BY ROLLUP (A.name, B.name)"
    ).collect()
    assert {(r["src"], r["dst"], r["n"]) for r in rows} == {
        ("A", "B", 1), ("A", None, 1), (None, None, 1),
    }
