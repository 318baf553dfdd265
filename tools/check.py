"""Local emulation of the driver's t2 correctness gate.

Runs every ``queries()`` entry from __spark_entry__ at a given SF dir,
runs the matching ``oracle_sql()`` in DuckDB over the same parquet
tables, and compares row count + order-insensitive value hash with
columns sorted by name. Not byte-identical to the driver, but close
enough to catch real mismatches before the round gate does.

Usage: python tools/check.py [sf_dir] [only_prefix]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck_canon(t: str) -> str:
    """Canonical value-rendering class for a DuckDB type.

    The driver's hasher renders values through a type-sensitive path
    (HUGEINT → float64, DECIMAL → Decimal), so types that change the
    rendered value must match the Spark side exactly. Int widths within
    int64 all render identically, so they share one class."""
    t = str(t).upper().strip()
    if t.endswith("[]"):
        return "list<" + _duck_canon(t[:-2]) + ">"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "int"
    if t in ("HUGEINT", "UBIGINT", "UHUGEINT"):
        return "hugeint"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    if t == "VARCHAR":
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("TIMESTAMP"):
        return "ts"
    return t.lower()


def _spark_canon(t: str) -> str:
    t = t.lower().strip()
    if t.startswith("array<") and t.endswith(">"):
        return "list<" + _spark_canon(t[6:-1]) + ">"
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if t in ("double", "float"):
        return "float"
    if t.startswith("decimal"):
        return t.replace(" ", "")
    if t == "string":
        return "str"
    if t == "boolean":
        return "bool"
    if t.startswith("timestamp"):
        return "ts"
    return t


def type_mismatches(spark_dtypes, duck_cols, duck_types):
    """Per-column canonical-type comparison; returns list of problem strs."""
    duck = {c: _duck_canon(t) for c, t in zip(duck_cols, duck_types)}
    out = []
    for col, st in spark_dtypes:
        sc = _spark_canon(st)
        dc = duck.get(col)
        if dc is not None and sc != dc:
            out.append(f"type[{col}] spark={st}({sc}) duck≠({dc})")
    return out


def _norm_cell(v):
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def rows_fingerprint(col_names, rows):
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    import hashlib

    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else ""

    import duckdb

    import __spark_entry__ as entry
    from graphview_spark.session import get_spark

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    if hasattr(entry, "extra_queries"):
        qs = {**qs, **entry.extra_queries()}
        oracles = {**oracles, **entry.extra_oracle_sql()}
    ok = bad = weak = 0
    for name, fn in qs.items():
        if only and not name.startswith(only):
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            bad += 1
            continue
        if name not in oracles:
            print(f"weak {name}: rows={len(spark_rows)} ({time.time()-t0:.1f}s, no oracle)")
            weak += 1
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = list(rel.columns)
            duck_types = [str(t) for t in rel.types]
            duck_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            bad += 1
            continue
        problems = []
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        problems += type_mismatches(df.dtypes, duck_cols, duck_types)
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rows spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            hs = rows_fingerprint(spark_cols, spark_rows)
            hd = rows_fingerprint(duck_cols, duck_rows)
            if hs != hd:
                problems.append("value-hash mismatch")
                sset = {tuple(_norm_cell(c) for c in r) for r in spark_rows}
                dset = {tuple(_norm_cell(c) for c in r) for r in duck_rows}
                so = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
                do = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
                sset = {tuple(r[i] for i in so) for r in sset}
                dset = {tuple(r[i] for i in do) for r in dset}
                only_s = list(sset - dset)[:3]
                only_d = list(dset - sset)[:3]
                if only_s:
                    problems.append(f"spark-only: {only_s}")
                if only_d:
                    problems.append(f"duck-only: {only_d}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(str(p) for p in problems))
            bad += 1
        else:
            print(f"ok   {name}: rows={len(spark_rows)} ({time.time()-t0:.1f}s)")
            ok += 1
    from bench import provenance

    print(f"\n{ok} ok, {weak} weak (rows-only), {bad} FAIL")
    print(f"provenance: {provenance()} sf_dir={sf_dir}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
