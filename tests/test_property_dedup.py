"""Property tests for the MinHash dedup chain — signatures, band keys,
exact-Jaccard verification and cluster assignment each checked against
a plain-Python reference on randomized corpora. The md5-based hashing
is deterministic, so every assertion is exact.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from graphview_spark.operators.dedup import (
    MINHASH_COEFFS,
    MINHASH_P,
    N_BANDS,
    N_PERM,
    SHINGLE_N,
    _MINHASH_MASK,
    _jaccard,
    band_keys_col,
    dedup_clusters,
    minhash_signatures,
)

# small alphabet → near-duplicate documents arise naturally
words_strategy = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e", "f"]),
    min_size=0, max_size=12,
)
corpus_strategy = st.lists(words_strategy, min_size=1, max_size=8)

prop_settings = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_shingles(ws: list[str]) -> list[int]:
    if len(ws) < SHINGLE_N:
        return []
    seen: dict[int, None] = {}
    for i in range(len(ws) - SHINGLE_N + 1):
        seen.setdefault(_h60(" ".join(ws[i:i + SHINGLE_N])), None)
    return list(seen)


def _ref_sigs(hs: list[int]) -> list[int]:
    return [
        min(((a * (h % _MINHASH_MASK) + b) % MINHASH_P for h in hs),
            default=MINHASH_P)
        for a, b in MINHASH_COEFFS[:N_PERM]
    ]


@given(corpus_strategy)
@prop_settings
def test_minhash_signatures_match_python(spark, corpus):
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (sorted(r["hs"]), list(r["sigs"]))
        for r in minhash_signatures(docs).collect()
    }
    for i, ws in enumerate(corpus):
        hs = _ref_shingles(ws)
        if not hs:
            assert i not in got  # sub-shingle docs have no signature row
            continue
        assert got[i][0] == sorted(hs), ("hs", i)
        assert got[i][1] == _ref_sigs(hs), ("sigs", i)


@given(corpus_strategy)
@prop_settings
def test_band_keys_and_jaccard_match_python(spark, corpus):
    rows = N_PERM // N_BANDS
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs)
    got_bands = {
        r["doc_id"]: list(r["b"])
        for r in sigs.select(
            "doc_id", band_keys_col(N_BANDS, rows).alias("b")).collect()
    }
    ref = {
        i: _ref_sigs(_ref_shingles(ws))
        for i, ws in enumerate(corpus) if _ref_shingles(ws)
    }
    for i, s in ref.items():
        want = [
            "|".join(str(v) for v in s[b * rows:(b + 1) * rows])
            for b in range(N_BANDS)
        ]
        assert got_bands[i] == want, i
    # exact-Jaccard column vs Python set math on every doc pair
    pairs = [
        (a, b) for a in ref for b in ref if a < b
    ]
    if pairs:
        hs = {i: set(_ref_shingles(ws)) for i, ws in enumerate(corpus)}
        pdf = spark.createDataFrame(pairs, "da long, db long")
        sh = sigs.select("doc_id", "hs")
        j = (
            pdf.join(sh.select(F.col("doc_id").alias("da"),
                               F.col("hs").alias("ha")), "da")
            .join(sh.select(F.col("doc_id").alias("db"),
                            F.col("hs").alias("hb")), "db")
            .select("da", "db",
                    F.round(_jaccard(F.col("ha"), F.col("hb")), 6)
                    .alias("j"))
        )
        for r in j.collect():
            inter = len(hs[r["da"]] & hs[r["db"]])
            union = len(hs[r["da"]] | hs[r["db"]])
            want = round(inter / union, 6) if union else 0.0
            assert abs(r["j"] - want) < 1e-9, (r["da"], r["db"])


pairs_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda t: t[0] != t[1]),
    min_size=0, max_size=15,
)


@given(pairs_strategy)
@prop_settings
def test_dedup_clusters_match_union_find(spark, raw_pairs):
    pairs = sorted({(min(a, b), max(a, b)) for a, b in raw_pairs})
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(parent)
    ref_cluster = {n: find(n) for n in nodes}
    ref_sizes = {}
    for n in nodes:
        ref_sizes[ref_cluster[n]] = ref_sizes.get(ref_cluster[n], 0) + 1

    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs],
        "doc_a long, doc_b long, jaccard double",
    )
    got = {r["doc_id"]: r for r in dedup_clusters(df).collect()}
    assert set(got) == set(nodes)
    for n in nodes:
        assert got[n]["cluster_id"] == ref_cluster[n], n
        assert got[n]["cluster_size"] == ref_sizes[ref_cluster[n]], n
        assert got[n]["keep"] == (n == ref_cluster[n]), n


@given(corpus_strategy)
@prop_settings
def test_simhash_fingerprints_match_python(spark, corpus):
    """SimHash fingerprints (per-bit strict word-hash majority) vs a
    plain-Python reference — including empty/short docs (all-zero
    fingerprint: no bit reaches strict majority of zero hashes)."""
    from graphview_spark.operators.dedup import (
        SIMHASH_BITS,
        simhash_from_hashes,
        word_hashes_col,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id", simhash_from_hashes(
                word_hashes_col(F.col("text"))).alias("fp")
        ).collect()
    }
    for i, ws in enumerate(corpus):
        # split(text, ' ') on "" yields one empty token — mirror that
        tokens = " ".join(ws).split(" ")
        hs = [_h60(w) for w in tokens]
        fp = 0
        for j in range(SIMHASH_BITS):
            ones = sum(1 for h in hs if h & (1 << j))
            if 2 * ones > len(hs):
                fp |= 1 << j
        assert got[i] == fp, (i, got[i], fp)


def test_lsh_shape_formula_and_hi_row_pin():
    """The density-adaptive shape formula's contract (VERDICT r11
    "Next #2"): default (12, 8) for every label the gate SFs produce,
    (15, 9) at the sf10 rung's ~40k-row labels — the exact shape the
    dedup_embed_lsh_hi oracle row forces, so the row tracks the
    production formula, not a hardcoded pair. Occupancy invariant:
    above the default, expected rows per sign bucket stays ≤ TARGET_OCC
    (the property that makes random collision mass linear in rows)."""
    from graphview_spark.operators.dedup import (
        EMBED_LSH_BITS,
        EMBED_LSH_HI_LABEL_ROWS,
        EMBED_LSH_TABLES,
        EMBED_LSH_TARGET_OCC,
        _lsh_shape,
    )

    assert _lsh_shape(None) == (EMBED_LSH_BITS, EMBED_LSH_TABLES)
    assert _lsh_shape(50) == (EMBED_LSH_BITS, EMBED_LSH_TABLES)
    assert _lsh_shape(8192) == (EMBED_LSH_BITS, EMBED_LSH_TABLES)
    assert _lsh_shape(EMBED_LSH_HI_LABEL_ROWS) == (15, 9)
    for n in (10_000, 40_000, 100_000, 10_000_000):
        bits, tables = _lsh_shape(n)
        if bits > EMBED_LSH_BITS:
            assert n / (1 << bits) <= EMBED_LSH_TARGET_OCC
        assert tables >= EMBED_LSH_TABLES


def test_embed_forced_shape_is_result_invariant(spark):
    """Forcing a bigger (bits, tables) shape must not change WHICH
    pairs come out — sign(w·v) is deterministic, so identical vectors
    collide at any shape and near-orthogonal ones are filtered by the
    exact verify. The hi gate row's whole claim, on a local fixture."""
    from graphview_spark.operators.dedup import embed_cosine_pairs

    rows = []
    for i in range(40):
        base = [float((i * 7 + j * 13) % 11 - 5) for j in range(8)]
        rows.append((i, base, "g"))
        rows.append((1000 + i, base, "g"))  # exact clone
    emb = spark.createDataFrame(
        rows, "vec_id long, v array<double>, label string")
    kw = dict(label_threshold=4, dim=8, stats=(80, 8))
    got_default = sorted(
        tuple(r) for r in embed_cosine_pairs(
            emb, 0.99, **kw).collect())
    got_hi = sorted(
        tuple(r) for r in embed_cosine_pairs(
            emb, 0.99, shape=(15, 9), **kw).collect())
    assert got_hi == got_default
    assert len(got_hi) >= 40  # every clone pair found at both shapes


def test_incremental_verdicts_agree_with_pair_graph(spark, sf_dir):
    """Every T=0.7 verified pair that straddles the index/batch split
    must flag its odd (batch) doc as a duplicate, the reported best
    match must itself be a verified pair at least as similar, and docs
    with no straddling pair must come back clean — the incremental
    ingest operator is exactly the cross-half slice of the symmetric
    pair graph."""
    from pyspark.sql import functions as F

    from graphview_spark.operators.dedup import (
        q_dedup_incremental,
        q_dedup_minhash_lsh,
    )

    verdicts = {r["doc_id"]: r
                for r in q_dedup_incremental(spark, sf_dir).collect()}
    pairs = q_dedup_minhash_lsh(spark, sf_dir).collect()
    straddle: dict[int, list[tuple[int, float]]] = {}
    for p in pairs:
        a, b, j = p["doc_a"], p["doc_b"], p["jaccard"]
        for new, idx in ((a, b), (b, a)):
            if new % 2 == 1 and idx % 2 == 0:
                straddle.setdefault(new, []).append((idx, j))
    for new, matches in straddle.items():
        v = verdicts[new]
        assert v["is_dup"], new
        best_j = max(j for _, j in matches)
        assert v["jaccard"] >= best_j, (new, v["jaccard"], best_j)
        assert (v["matched_id"], v["jaccard"]) in [
            (i, j) for i, j in matches] or v["jaccard"] > best_j
    for doc_id, v in verdicts.items():
        if doc_id not in straddle:
            assert not v["is_dup"], doc_id
            assert v["matched_id"] is None and v["jaccard"] is None
