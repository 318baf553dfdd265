"""Deterministic synthetic-table generator for SCALE testing.

The driver ships read-only parquet at sf∈{0.001, 0.01, 0.1}
(TESTDATA.md). Scale evidence beyond sf0.1 (VERDICT r7 "What's missing
#2") needs an sf1 set; this generator reproduces the SAME schema and
the sf0.1 distributions (measured with DuckDB: language/source mixes,
doc length 10-100 words over the 31-word vocabulary, near-dup mass,
10 embedding labels at dim 64, 5 event types over a 30-day window,
TPC-H-ish key ranges and lineitem fan-out) at any scale factor, from
seed 42. It is NOT the driver's generator — timings on its output are
comparable across OUR sf0.1/sf1 runs (both generated here for the
scaling ratio), not bit-identical to the driver's tables.

Usage:  python tools/gen_testdata.py 1.0 /root/repo/.testdata/sf1
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "a", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "join", "shuffle", "plan", "stage", "task",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
P_NAMES_A = ["large", "hot", "blue", "red", "small", "green", "dim", "metal"]
P_NAMES_B = ["ring", "bolt", "plate", "cog", "rod", "wheel", "case", "tube"]
P_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _texts(rng: np.random.Generator, n: int) -> list[str]:
    """Doc corpus with the sf0.1 near-dup structure: ~10% of docs are
    light mutations of an earlier doc (1-3 word substitutions), a
    handful are exact copies."""
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.002:                       # exact duplicate
            texts.append(texts[int(rng.integers(0, i))])
            continue
        if i > 10 and r < 0.10:                        # near duplicate
            base = texts[int(rng.integers(0, i))].split(" ")
            for _ in range(int(rng.integers(1, 4))):
                base[int(rng.integers(0, len(base)))] = VOCAB[
                    int(rng.integers(0, len(VOCAB)))]
            texts.append(" ".join(base))
            continue
        ln = int(rng.integers(10, 101))
        texts.append(" ".join(
            VOCAB[j] for j in rng.integers(0, len(VOCAB), ln)))
    return texts


def generate(sf: float, out_dir: str) -> None:
    rng = np.random.default_rng(42)
    os.makedirs(out_dir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i:02d}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)],
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    }))
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{P_NAMES_A[i % 8]} {P_NAMES_B[(i // 8) % 8]}"
                   for i in range(n_part)],
        "p_brand": [f"Brand#{int(b)}" for b in rng.integers(1, 26, n_part)],
        "p_type": [P_TYPES[i] for i in rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900 + 0.1 * np.arange(n_part) % 1000, 2),
    }))
    base = np.datetime64("1995-01-01")
    odate = base + rng.integers(0, 2400, n_ord).astype("timedelta64[D]")
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [STATUSES[i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(900, 500_000, n_ord), 2),
        "o_orderdate": pa.array(odate.astype("datetime64[us]")),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)],
    }))
    lkey = rng.integers(0, n_ord, n_li)
    lkey.sort()
    sdate = (base + rng.integers(1, 2500, n_li).astype("timedelta64[D]"))
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(lkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100_000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": [["A", "N", "R"][i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [["F", "O"][i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(sdate.astype("datetime64[us]")),
    }))
    ev_ts = (np.datetime64("2024-01-01")
             + rng.integers(0, 30 * 86_400_000, n_ev)
             .astype("timedelta64[ms]"))
    ev_ts.sort()
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ev_ts.astype("datetime64[us]")),
        "user_id": pa.array(
            rng.integers(0, max(n_cust // 10, 1), n_ev), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50, n_ev), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, n_ev)],
    }))
    texts = _texts(rng, n_doc)
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.choice(5, n_doc, p=LANG_P)],
        "source": [f"src{int(s)}" for s in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))
    emb = rng.normal(0, 0.15, (n_emb, 64)).astype(np.float32)
    for i in range(20, n_emb):                        # ~2% near-copies
        if rng.random() < 0.02:
            j = int(rng.integers(0, i))
            emb[i] = emb[j] + rng.normal(0, 0.001, 64).astype(np.float32)
    labels = rng.integers(0, 10, n_emb).astype(np.int32)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else (
        f"/root/repo/.testdata/sf{sys.argv[1] if len(sys.argv) > 1 else '1'}")
    print(f"generating sf={sf} -> {out}")
    generate(sf, out)
