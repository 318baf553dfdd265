"""Multi-statement scripts — DECLARE / SET / WHILE / IF batches
(reference: WSql.cs:215-313,405-454; README's iterative-computation story
is a T-SQL WHILE loop around graph statements) and SELECT INTO."""

from __future__ import annotations

import pytest

from graphview_spark.graph import GraphDatabase
from graphview_spark.scripting import ScriptError


@pytest.fixture()
def g(spark):
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [Node] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Property"] name varchar(20),
            [ColumnRole:"Edge",Reference:"Node"] Edges VARBINARY(max) )"""
    )
    g.execute("INSERT INTO Node(id,name) VALUES(1,'a'),(2,'b'),(3,'c'),(4,'d')")
    return g


def test_while_loop_builds_chain(g):
    # iterative edge insertion: the reference's WHILE-around-DML pattern
    res = g.execute(
        """DECLARE @i INT = 2;
           WHILE @i <= 4
           BEGIN
               INSERT EDGE INTO Node.Edges
               SELECT s, t FROM Node s, Node t
               WHERE s.id = @i - 1 AND t.id = @i;
               SET @i = @i + 1;
           END;
           SELECT y.id AS reached FROM Node x, Node y
           MATCH x-[Edges*1..10]->y WHERE x.id = 1"""
    )
    assert sorted(r["reached"] for r in res.collect()) == [2, 3, 4]


def test_if_else_with_scalar_subquery(g):
    g.execute(
        """IF (SELECT COUNT(*) FROM Node) > 10
           BEGIN INSERT INTO Node(id,name) VALUES(100,'big') END
           ELSE
           BEGIN INSERT INTO Node(id,name) VALUES(200,'small') END"""
    )
    names = {r["name"] for r in g.execute("SELECT * FROM Node").collect()}
    assert "small" in names and "big" not in names


def test_declare_from_scalar_subquery_and_set(g):
    res = g.execute(
        """DECLARE @top INT = (SELECT MAX(id) FROM Node);
           SET @top = @top + 1;
           SELECT @top AS v FROM Node WHERE id = 1"""
    )
    assert res.collect()[0]["v"] == 5


def test_set_undeclared_raises(g):
    with pytest.raises(ScriptError, match="undeclared"):
        g.execute_script("SET @nope = 1")


def test_select_into_then_query(g):
    assert g.execute("SELECT id, name INTO Snapshot FROM Node WHERE id <= 2") is None
    res = g.execute("SELECT name FROM Snapshot ORDER BY id")
    assert [r["name"] for r in res.collect()] == ["a", "b"]
    # derived table joins against node tables in later statements
    res = g.execute(
        "SELECT n.name AS nm FROM Node n JOIN Snapshot s ON s.id = n.id "
        "WHERE n.id = 2"
    )
    assert [r["nm"] for r in res.collect()] == ["b"]


def test_comments_stripped_outside_strings(g):
    res = g.execute(
        """-- leading comment with a fake DECLARE and a ; semicolon
           SELECT id, name /* block
           comment */ FROM Node
           WHERE name = 'a' -- trailing; comment
        """
    )
    assert [r["name"] for r in res.collect()] == ["a"]
    # comment markers inside string literals survive
    g.execute("INSERT INTO Node(id,name) VALUES(6,'a--b')")
    res = g.execute("SELECT name FROM Node WHERE id = 6")
    assert [r["name"] for r in res.collect()] == ["a--b"]


def test_script_with_string_semicolons(g):
    # semicolons inside string literals must not split statements
    g.execute(
        """INSERT INTO Node(id,name) VALUES(7,'x;y');
           INSERT INTO Node(id,name) VALUES(8,'z')"""
    )
    names = {r["name"] for r in g.execute("SELECT * FROM Node").collect()}
    assert "x;y" in names and "z" in names


def test_go_separators_and_tsql_builtins(spark):
    from graphview_spark.graph import GraphDatabase

    g = GraphDatabase(spark)
    out = g.execute_script(
        """
        CREATE TABLE [T] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Property"] name nvarchar(20) )
        GO
        INSERT INTO T(id, name) VALUES(1, N'it''s'), (2, NULL)
        GO
        SELECT id,
               ISNULL(name, N'missing') AS nm,
               LEN(ISNULL(name, '')) AS l,
               CHARINDEX('t', ISNULL(name, 'x')) AS pos
        FROM T
        """
    )
    rows = {r["id"]: (r["nm"], r["l"], r["pos"]) for r in out.collect()}
    assert rows[1] == ("it's", 4, 2)
    assert rows[2] == ("missing", 0, 0)


def test_dateadd_datediff_mapping(spark):
    from graphview_spark.graph import GraphDatabase

    g = GraphDatabase(spark)
    out = g.execute(
        "SELECT DATEDIFF(day, TIMESTAMP '2024-01-01', "
        "DATEADD(day, 3, TIMESTAMP '2024-01-01')) AS d"
    )
    assert out.collect()[0]["d"] == 3


def test_object_id_preamble_and_drop_if_exists(spark):
    from graphview_spark.graph import GraphDatabase

    g = GraphDatabase(spark)
    script = """
    IF OBJECT_ID(N'T', N'U') IS NOT NULL
    BEGIN
        DROP NODE TABLE T;
    END;
    CREATE TABLE [T] (
        [ColumnRole:"NodeId"] id INT );
    INSERT INTO T(id) VALUES(1);
    SELECT count(*) AS n FROM T
    """
    # runs twice: second pass exercises the conditional drop
    assert g.execute_script(script).collect()[0]["n"] == 1
    assert g.execute_script(script).collect()[0]["n"] == 1
    g.execute("DROP TABLE IF EXISTS NoSuch")
    g.execute("DROP PROCEDURE IF EXISTS NoProc")


def test_print_and_return(spark):
    from graphview_spark.graph import GraphDatabase
    from graphview_spark.scripting import ScriptRunner

    g = GraphDatabase(spark)
    r = ScriptRunner(g)
    out = r.run(
        """
        DECLARE @i INT = 2;
        PRINT concat('i=', @i);
        IF @i > 1
        BEGIN
            RETURN;
        END;
        SET @i = 99;
        """
    )
    assert out is None
    assert r.printed == ["i=2"]
    assert r.variables["i"] == 2  # RETURN skipped the SET


def test_return_delivers_prior_result_set(spark):
    # T-SQL RETURN ends the batch, but result sets produced before it
    # are still delivered to the client — a SELECT before RETURN must
    # not be discarded by the unwind.
    from graphview_spark.graph import GraphDatabase
    from graphview_spark.scripting import ScriptRunner

    g = GraphDatabase(spark)
    r = ScriptRunner(g)
    out = r.run(
        """
        DECLARE @i INT = 7;
        SELECT @i AS v;
        IF @i > 1
        BEGIN
            RETURN;
        END;
        SELECT 99 AS v;
        """
    )
    assert out is not None and out.collect()[0]["v"] == 7


def test_declare_decimal_type(spark):
    from graphview_spark.graph import GraphDatabase

    g = GraphDatabase(spark)
    out = g.execute_script(
        "DECLARE @r DECIMAL(10,2) = 3.5; SELECT @r * 2 AS v"
    )
    assert float(out.collect()[0]["v"]) == 7.0


def test_try_catch_runs_catch_on_error(g):
    res = g.execute(
        """DECLARE @status VARCHAR(200) = 'untouched';
           BEGIN TRY
               SET @status = 'tried';
               SELECT boom FROM NoSuchTable;
           END TRY
           BEGIN CATCH
               SET @status = 'caught';
           END CATCH;
           SELECT @status AS s"""
    )
    assert res.collect()[0]["s"] == "caught"


def test_try_catch_skips_catch_without_error(g):
    res = g.execute(
        """BEGIN TRY
               UPDATE Node SET name = 'z' WHERE id = 1;
           END TRY
           BEGIN CATCH
               UPDATE Node SET name = 'should-not-run' WHERE id = 2;
           END CATCH;
           SELECT name FROM Node WHERE id <= 2 ORDER BY id"""
    )
    assert [r["name"] for r in res.collect()] == ["z", "b"]


def test_error_message_and_print(g):
    from graphview_spark.scripting import ScriptRunner

    r = ScriptRunner(g)
    r.run(
        """BEGIN TRY
               RAISERROR('custom failure', 16, 1);
           END TRY
           BEGIN CATCH
               PRINT ERROR_MESSAGE();
           END CATCH"""
    )
    assert r.printed == ["custom failure"]


def test_throw_statement_and_bare_rethrow(g):
    with pytest.raises(ScriptError, match="explicit throw"):
        g.execute("THROW 50001, 'explicit throw', 1")
    # bare THROW inside CATCH re-raises the original error
    with pytest.raises(ScriptError, match="original"):
        g.execute(
            """BEGIN TRY
                   RAISERROR('original', 16, 1);
               END TRY
               BEGIN CATCH
                   THROW;
               END CATCH"""
        )


def test_throw_and_raiserror_with_variable_message(g):
    # T-SQL allows @variable message arguments (THROW 50001, @msg, 1 /
    # RAISERROR(@msg, 16, 1)) — must raise the variable's VALUE, not
    # fall through to the SQL executor
    with pytest.raises(ScriptError, match="boom from var"):
        g.execute(
            """DECLARE @msg VARCHAR(100) = 'boom from var';
               THROW 50001, @msg, 1"""
        )
    with pytest.raises(ScriptError, match="raise from var"):
        g.execute(
            """DECLARE @msg VARCHAR(100) = 'raise from var';
               RAISERROR(@msg, 16, 1)"""
        )
    with pytest.raises(ScriptError, match="undeclared variable @nope"):
        g.execute("THROW 50001, @nope, 1")


def test_try_catch_with_while_inside(g):
    res = g.execute(
        """DECLARE @i INT = 0;
           BEGIN TRY
               WHILE @i < 3
               BEGIN
                   SET @i = @i + 1;
               END;
               RAISERROR('late failure', 16, 1);
           END TRY
           BEGIN CATCH
               SET @i = @i + 100;
           END CATCH;
           SELECT @i AS n"""
    )
    assert res.collect()[0]["n"] == 103


def test_dynamic_sql_exec_string(g):
    res = g.execute("EXEC('SELECT name FROM Node WHERE id = 1')")
    assert res.collect()[0]["name"] == "a"
    # concatenated literals + doubled quotes; N'' prefix
    res = g.execute(
        "EXECUTE(N'SELECT name FROM Node ' + 'WHERE name = ''b''')"
    )
    assert res.collect()[0]["name"] == "b"
    # dynamic DML executes too
    g.execute("EXEC('UPDATE Node SET name = ''dyn'' WHERE id = 4')")
    got = g.execute("SELECT name FROM Node WHERE id = 4").collect()
    assert got[0]["name"] == "dyn"


def test_dynamic_sql_exec_variable(g):
    # EXEC(@var): substitution renders the value as a quoted literal,
    # which the dynamic-EXEC path then runs as its own batch
    res = g.execute(
        """DECLARE @q VARCHAR(100) =
               'SELECT name FROM Node WHERE name = ''b''';
           EXEC(@q)"""
    )
    assert res.collect()[0]["name"] == "b"
