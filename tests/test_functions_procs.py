"""UDF registry (§2.8), stored procedures (GraphViewConnection.cs:
1619-1698 / StoredProcedureTutorial.cs), and graph persistence."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from graphview_spark.functions.registry import FunctionRegistry
from graphview_spark.graph import GraphDatabase


@pytest.fixture()
def people(spark):
    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [People] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Property"] name varchar(20),
            [ColumnRole:"Edge", Reference:"People"] Knows VARBINARY(max) )"""
    )
    for i, name in [(1, "Alice"), (2, "Bob"), (3, "Caven")]:
        g.execute(f"INSERT INTO People(id,name) VALUES({i},'{name}')")
    g.execute(
        """INSERT EDGE INTO People.Knows
           SELECT x,y FROM People x, People y
           WHERE x.name='Alice' AND y.name='Bob'"""
    )
    return g


def test_scalar_udf_in_dialect(people, spark):
    reg = FunctionRegistry(spark)
    reg.register_scalar("shout", lambda s: (s or "").upper() + "!", "string")
    res = people.execute(
        """SELECT shout(y.name) AS loud FROM People x, People y
           MATCH x-[Knows]->y"""
    )
    assert [r["loud"] for r in res.collect()] == ["BOB!"]
    assert reg.list_functions() == {"shout": "scalar"}


def test_vectorized_udf_matches_builtin(spark, sf_dir):
    reg = FunctionRegistry(spark)
    reg.register_vectorized("vlen", lambda s: s.str.len(), "int")
    from graphview_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("docs_v")
    got = spark.sql("SELECT doc_id, vlen(text) AS n FROM docs_v").collect()
    want = {r["doc_id"]: r["n"] for r in
            docs.select("doc_id", F.length("text").alias("n")).collect()}
    assert len(got) == len(want)
    for r in got:
        assert r["n"] == want[r["doc_id"]]


def test_builtin_passthrough(people):
    """Unknown functions flow to Spark SQL untranslated — the analog of
    the reference's T-SQL passthrough (WScalarExpression.cs:272-350)."""
    res = people.execute(
        "SELECT upper(name) AS u, length(name) AS l FROM People WHERE id = 1"
    )
    assert [(r["u"], r["l"]) for r in res.collect()] == [("ALICE", 5)]


def test_stored_procedure(people):
    people.create_procedure(
        "FriendsOf",
        ["name"],
        [
            """SELECT y.name AS friend FROM People x, People y
               MATCH x-[Knows]->y WHERE x.name = @name"""
        ],
    )
    res = people.execute_procedure("FriendsOf", name="Alice")
    assert [r["friend"] for r in res.collect()] == ["Bob"]
    with pytest.raises(ValueError, match="missing params"):
        people.execute_procedure("FriendsOf")


def test_procedure_with_dml(people):
    people.create_procedure(
        "AddPerson",
        ["id", "name"],
        ["INSERT INTO People(id,name) VALUES(@id, @name)"],
    )
    people.execute_procedure("AddPerson", id=9, name="Dana")
    names = {r["name"] for r in people.execute("SELECT * FROM People").collect()}
    assert "Dana" in names


def test_save_load_roundtrip(people, spark, tmp_path):
    path = os.path.join(str(tmp_path), "gdb")
    people.save(path)
    g2 = GraphDatabase.load(spark, path)
    res = g2.execute(
        """SELECT x.name AS a, y.name AS b FROM People x, People y
           MATCH x-[Knows]->y"""
    )
    assert [(r["a"], r["b"]) for r in res.collect()] == [("Alice", "Bob")]
    # inserts continue the id sequence after reload
    g2.execute("INSERT INTO People(id,name) VALUES(4,'Dave')")
    gids = [r["GlobalNodeId"] for r in g2.nodes["People"].collect()]
    assert len(set(gids)) == 4


def test_select_into(people, spark, tmp_path):
    """SELECT INTO → saveAsTable/parquet materialization (SURVEY §2.1)."""
    res = people.execute("SELECT id, name FROM People WHERE id <= 2")
    out = os.path.join(str(tmp_path), "mat")
    res.write.parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert set(back.columns) == {"id", "name"}


def test_create_function_dialect(spark):
    from graphview_spark.graph import GraphDatabase

    g = GraphDatabase(spark)
    g.execute(
        """CREATE TABLE [N] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Property"] price float )"""
    )
    g.execute("INSERT INTO N(id, price) VALUES(1, 10.0),(2, 20.0)")
    g.execute(
        "CREATE FUNCTION WithTax(@p FLOAT) RETURNS FLOAT AS "
        "BEGIN RETURN @p * 1.1 END"
    )
    got = {
        r["id"]: r["t"]
        for r in g.execute("SELECT id, WithTax(price) AS t FROM N").collect()
    }
    assert got == {1: 11.0, 2: pytest.approx(22.0)}
    # multi-statement body: DECLARE + RETURN compile to one expression
    g.execute(
        "CREATE FUNCTION PlusOne(@x INT) RETURNS INT AS "
        "BEGIN DECLARE @y INT = 1; RETURN @x + @y END"
    )
    assert g.execute("SELECT PlusOne(41) AS v").collect()[0]["v"] == 42


def test_create_function_multi_statement_bodies(spark):
    from graphview_spark.graph import GraphDatabase

    g = GraphDatabase(spark)
    # IF/ELSE with SET and a trailing shared RETURN
    g.execute(
        """CREATE FUNCTION Grade(@s INT) RETURNS VARCHAR(2) AS
           BEGIN
             DECLARE @g VARCHAR(2);
             IF @s >= 90 BEGIN SET @g = 'A' END
             ELSE BEGIN
               IF @s >= 80 BEGIN SET @g = 'B' END
               ELSE BEGIN SET @g = 'C' END;
             END;
             RETURN @g
           END"""
    )
    got = g.execute(
        "SELECT Grade(95) AS a, Grade(85) AS b, Grade(42) AS c"
    ).collect()[0]
    assert (got["a"], got["b"], got["c"]) == ("A", "B", "C")
    # early RETURN in one branch, fall-through in the other
    g.execute(
        """CREATE FUNCTION Clip(@x INT, @hi INT) RETURNS INT AS
           BEGIN
             IF @x > @hi BEGIN RETURN @hi END;
             SET @x = @x + 0;
             RETURN @x
           END"""
    )
    r = g.execute("SELECT Clip(15, 10) AS a, Clip(5, 10) AS b").collect()[0]
    assert (r["a"], r["b"]) == (10, 5)
    # sequential SET reassignments fold left-to-right
    g.execute(
        """CREATE FUNCTION Poly(@x INT) RETURNS INT AS
           BEGIN
             DECLARE @acc INT = @x;
             SET @acc = @acc * 2;
             SET @acc = @acc + 3;
             RETURN @acc
           END"""
    )
    assert g.execute("SELECT Poly(4) AS v").collect()[0]["v"] == 11
    # WHILE is procedural — clear refusal naming the supported subset
    with pytest.raises(ValueError, match="CREATE PROCEDURE"):
        g.execute(
            """CREATE FUNCTION Loops(@x INT) RETURNS INT AS
               BEGIN
                 WHILE @x < 10 BEGIN SET @x = @x + 1 END;
                 RETURN @x
               END"""
        )


def test_create_function_decimal_params(spark):
    from graphview_spark.graph import GraphDatabase

    g = GraphDatabase(spark)
    g.execute(
        "CREATE FUNCTION Pct(@x DECIMAL(10,2), @p DECIMAL(5,2)) "
        "RETURNS DECIMAL(12,4) AS BEGIN RETURN @x * @p / 100 END"
    )
    v = g.execute("SELECT Pct(CAST(200 AS DECIMAL(10,2)), "
                  "CAST(12.5 AS DECIMAL(5,2))) AS v").collect()[0]["v"]
    assert float(v) == 25.0


def test_save_load_preserves_procs_and_views(people, spark, tmp_path):
    people.execute(
        "CREATE PROCEDURE Hello @n INT AS BEGIN SELECT @n * 2 AS v END"
    )
    people.create_node_view("Everyone", ["People"])
    path = os.path.join(str(tmp_path), "gdb2")
    people.save(path)
    g2 = GraphDatabase.load(spark, path)
    assert g2.execute_procedure("Hello", n=21).collect()[0]["v"] == 42
    got = g2.execute(
        "SELECT x.name AS n FROM Everyone x, People y MATCH x-[Knows]->y"
    ).collect()
    assert [r["n"] for r in got] == ["Alice"]


def test_create_function_multi_variable_declare(people, spark):
    people.execute(
        """CREATE FUNCTION MultiVarFn(@x INT) RETURNS INT AS BEGIN
           DECLARE @a INT = 1, @b DECIMAL(10,2) = 2, @c INT;
           SET @c = @a + @b;
           RETURN @c + @x
        END"""
    )
    assert spark.sql("SELECT MultiVarFn(10) AS v").first()["v"] == 13
