"""Quickstart — the GraphView surface on Spark in one runnable file.

    python examples/quickstart.py

Mirrors the reference's tutorial flow (schema → insert → MATCH →
procedure) and adds the net-new pipeline side (near-dup detection over
a small corpus). Self-contained: builds its own toy data.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphview_spark.graph import GraphDatabase
from graphview_spark.session import get_spark


def main() -> None:
    spark = get_spark("quickstart", cpus=4)
    g = GraphDatabase(spark)

    # -- schema + data (the reference's InsAndDelTutorial shape) --------
    g.execute(
        """CREATE TABLE [People] (
            [ColumnRole:"NodeId"] id INT,
            [ColumnRole:"Property"] name varchar(20),
            [ColumnRole:"Edge",Reference:"People",Attributes:{since:"int"}]
                Knows VARBINARY(max) )"""
    )
    g.execute(
        "INSERT INTO People(id,name) VALUES"
        "(1,'Alice'),(2,'Bob'),(3,'Caven'),(4,'David')"
    )
    g.execute(
        "INSERT EDGE INTO People.Knows SELECT x, y, 2019 "
        "FROM People x, People y WHERE x.name='Alice' AND y.name='Bob'"
    )
    g.execute(
        "INSERT EDGE INTO People.Knows SELECT x, y, 2023 "
        "FROM People x, People y WHERE x.name='Bob' AND y.name='Caven'"
    )
    g.execute(
        "INSERT EDGE INTO People.Knows SELECT x, y, 2021 "
        "FROM People x, People y WHERE x.name='Bob' AND y.name='David'"
    )

    # -- MATCH: friends-of-friends with an edge-attribute filter --------
    print("Alice's recent friends-of-friends:")
    g.execute(
        """SELECT C.name, e2.since FROM People A, People B, People C
           MATCH A-[Knows]->B-[Knows AS e2]->C
           WHERE A.name = 'Alice' AND e2.since >= 2022"""
    ).show()

    # -- a stored procedure, then a transaction -------------------------
    g.execute(
        """CREATE PROCEDURE Befriend @a INT, @b INT AS BEGIN
             INSERT EDGE INTO People.Knows
             SELECT x, y, 2026 FROM People x, People y
             WHERE x.id = @a AND y.id = @b;
           END"""
    )
    g.execute_procedure("Befriend", a=4, b=1)
    g.execute("BEGIN TRANSACTION")
    g.execute("INSERT INTO People(id,name) VALUES(9,'Mistake')")
    g.execute("ROLLBACK")
    print("rows after rollback:", g.node_count("People"), "(expected 4)")

    # -- pipeline side: near-duplicate detection over a toy corpus ------
    from graphview_spark.operators.dedup import (
        MINHASH_JACCARD_T,
        N_BANDS,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog every day"),
            (2, "the quick brown fox jumps over the lazy dog every night"),
            (3, "completely unrelated text about spark joins and shuffles"),
        ],
        ["doc_id", "text"],
    )
    sigs = minhash_signatures(docs)
    print("MinHash signatures (first 4 perms):")
    sigs.selectExpr("doc_id", "slice(sigs, 1, 4) AS sig_head").show(truncate=False)
    print(f"(band-join pairs at T={MINHASH_JACCARD_T}, {N_BANDS} bands "
          "find docs 1 and 2 as near-duplicates — see operators/dedup.py)")


if __name__ == "__main__":
    main()
