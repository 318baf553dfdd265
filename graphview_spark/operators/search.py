"""Full-text retrieval operators for training-data / RAG pipelines:
BM25 keyword ranking, sharded inverted-index postings, and
sliding-window document chunking (SURVEY.md §7 phase 7 parity-plus,
same family as ``operators/text.py``).

Scale design:

* **BM25** never explodes the corpus. Term frequencies for the (small,
  fixed) query vocabulary are computed as per-row array expressions
  (map-only, whole-stage codegen); the only shuffle is ONE 1-row global
  aggregate (N, Σdl, per-term df) that is broadcast back. Scoring is a
  fixed-order arithmetic expression, so results are deterministic and
  oracle-checkable; top-k goes through ``orderBy().limit()`` which
  Spark executes as TakeOrderedAndProject (per-partition heap + driver
  merge — no global sort shuffle).
* **Postings** are sharded: a posting list for a hot term ("the" at
  100 TB) cannot fit one reducer row, so lists are built per
  ``(term, doc_id % n_shards)`` group. Shard count scales with the
  corpus; each output row is bounded by corpus_size / n_shards.
  This is the textbook MapReduce inverted-index build, expressed as
  explode → distinct → groupBy with ``sort_array(collect_list())``.
* **Chunking** is map-side only: per row, generate the chunk start
  offsets with ``sequence()`` and ``posexplode`` — output rows scale
  with token count / stride, no shuffle at all.

Float determinism notes (oracle hash-compat): every BM25 constant is
written so both engines compute in DOUBLE (DuckDB types bare decimal
literals as DECIMAL, so the oracle divides early or casts); the
per-document score sums the per-term contributions in one fixed
left-to-right expression (never a float SUM aggregate, whose addition
order is nondeterministic under parallelism).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from graphview_spark.operators.text import TOKEN_PATTERN
from graphview_spark.plans import lazy as _lazy
from graphview_spark.session import read_table

# fixed demo query / vocabulary — operator parameters in a real pipeline
BM25_QUERY = ["vector", "stream", "merge"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 15

POSTINGS_VOCAB = ["vector", "stream", "merge", "spark", "window"]
POSTINGS_SHARDS = 4

CHUNK_TOKENS = 40
CHUNK_STRIDE = 32


def _tok_col(colname: str) -> Column:
    """Lowercased BPE-ish token array (JVM regexp, codegen-friendly)."""
    return F.expr(f"regexp_extract_all(lower({colname}), '{TOKEN_PATTERN}', 0)")


def _eq(term: str):
    # closure factory: a bare `lambda w, t=term:` would make F.filter
    # treat the second parameter as the element-index argument
    return lambda w: w == F.lit(term)


# --------------------------------------------------------------------------
# BM25 ranking
# --------------------------------------------------------------------------

def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Score every document against ``terms`` with BM25
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5)), the Robertson/Sparck-Jones
    variant that is always positive).

    Plan shape: one map pass computing dl + per-term tf as array
    expressions (materialized — it feeds BOTH the 1-row stats aggregate
    and the scoring join, and uncheckpointed the corpus tokenization
    would run twice), one 1-row aggregate for (N, Σdl, df_i) broadcast
    back, one final map pass for the score. The corpus is never
    shuffled.
    """
    d = docs.select(
        "doc_id",
        _tok_col(text_col).alias("_toks"),
    ).select(
        "doc_id",
        F.size("_toks").cast("long").alias("dl"),
        *[
            F.size(F.filter("_toks", _eq(t))).cast("long").alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    d = _lazy.pin(d)
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    j = d.join(F.broadcast(stats))
    avgdl = F.col("sum_dl") / F.col("n_docs")  # double division, exact inputs

    def contrib(i: int) -> Column:
        tf = F.col(f"tf{i}")
        df = F.col(f"df{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        return idf * (tf * F.lit(k1 + 1.0)) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
        )

    score = contrib(0)
    for i in range(1, len(terms)):        # fixed-order sum — deterministic
        score = score + contrib(i)
    return j.select("doc_id", "dl", F.round(score, 4).alias("score"))


def q_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k documents for a 3-term keyword query, BM25-ranked."""
    docs = read_table(spark, sf_dir, "documents")
    scored = bm25_scores(docs, BM25_QUERY)
    return (
        scored.orderBy(F.desc("score"), "doc_id")  # TakeOrderedAndProject
        .limit(BM25_TOP_K)
    )


def _oracle_bm25(limit: int = BM25_TOP_K) -> str:
    n = len(BM25_QUERY)
    tf_cols = ",\n         ".join(
        "len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), "
        f"w -> w = '{t}'))::BIGINT AS tf{i}"
        for i, t in enumerate(BM25_QUERY)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)::BIGINT AS df{i}"
        for i in range(n)
    )
    # constants divide DOUBLEs (sum_dl/n_docs is DOUBLE) or are cast, so
    # DuckDB never falls into DECIMAL arithmetic (bare 0.5 is DECIMAL).
    k1p1 = BM25_K1 + 1.0
    one_minus_b = 1.0 - BM25_B
    contribs = " + ".join(
        f"(ln(1.0 + (n_docs - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (tf{i} * {k1p1}::DOUBLE))"
        f" / (tf{i} + {BM25_K1}::DOUBLE * ({one_minus_b}::DOUBLE"
        f" + {BM25_B}::DOUBLE * dl / (sum_dl / n_docs)))"
        for i in range(n)
    )
    return f"""
WITH d AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS dl,
         {tf_cols}
  FROM documents
), s AS (
  SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl, {df_cols}
  FROM d
)
SELECT doc_id, dl, round({contribs}, 4) AS score
FROM d, s
ORDER BY score DESC, doc_id
LIMIT {limit}
"""


# --------------------------------------------------------------------------
# sharded inverted-index postings
# --------------------------------------------------------------------------

def build_postings(
    docs: DataFrame,
    vocab: list[str] | None = None,
    n_shards: int = POSTINGS_SHARDS,
    text_col: str = "text",
) -> DataFrame:
    """Inverted index: term → sharded, sorted posting lists.

    Sharding on ``doc_id % n_shards`` bounds every reducer row (a hot
    term's postings split across n_shards rows instead of one unbounded
    ``collect_list``); the shard-local lists stay sorted so a consumer
    can merge shards streamingly. ``vocab=None`` indexes every term.
    """
    toks = docs.select("doc_id", F.explode(_tok_col(text_col)).alias("term"))
    if vocab is not None:
        toks = toks.filter(F.col("term").isin(vocab))
    return (
        toks.distinct()  # map-side combine: (term, doc) pairs
        .groupBy(
            "term", (F.col("doc_id") % n_shards).cast("long").alias("shard")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
    )


def q_search_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded posting lists for a 5-term vocabulary."""
    docs = read_table(spark, sf_dir, "documents")
    return build_postings(docs, POSTINGS_VOCAB, POSTINGS_SHARDS)


def _oracle_postings() -> str:
    vocab = ", ".join(f"'{t}'" for t in POSTINGS_VOCAB)
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
)
SELECT term, (doc_id % {POSTINGS_SHARDS})::BIGINT AS shard,
       count(*)::BIGINT AS n_docs,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
FROM tok
WHERE term IN ({vocab})
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# sliding-window chunking (RAG prep)
# --------------------------------------------------------------------------

def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
    text_col: str = "text",
) -> DataFrame:
    """Overlapping fixed-size token windows per document (RAG chunk
    prep). Entirely map-side: ``sequence()`` generates the start
    offsets, ``posexplode`` emits one row per chunk, ``slice()`` cuts
    the window — no shuffle, output rows ∝ tokens/stride.

    Requires ``stride <= chunk_tokens`` (overlap ≥ 0): a larger stride
    would silently drop the tokens between windows."""
    if stride > chunk_tokens:
        raise ValueError(
            f"stride ({stride}) must be <= chunk_tokens ({chunk_tokens}); "
            "a larger stride silently drops tokens between windows"
        )
    words = F.split(F.col(text_col), " ")
    return (
        docs.select("doc_id", words.alias("_w"))
        .select(
            "doc_id",
            "_w",
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size("_w") - 1, F.lit(0)),
                    F.lit(stride),
                )
            ).alias("chunk_idx", "_start"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size(F.slice("_w", F.col("_start") + 1, chunk_tokens))
            .cast("long")
            .alias("n_tokens"),
            F.md5(
                F.concat_ws(" ", F.slice("_w", F.col("_start") + 1, chunk_tokens))
            ).alias("chunk_hash"),
        )
    )


def q_search_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk the corpus into 40-token windows with stride 32; return
    per-chunk token counts and content hashes."""
    docs = read_table(spark, sf_dir, "documents")
    return chunk_documents(docs, CHUNK_TOKENS, CHUNK_STRIDE)


def _oracle_chunks() -> str:
    return f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), s AS (
  SELECT doc_id, words,
         unnest(generate_series(0, greatest(len(words) - 1, 0),
                                {CHUNK_STRIDE})) AS start
  FROM w
)
SELECT doc_id,
       (start // {CHUNK_STRIDE})::BIGINT AS chunk_idx,
       len(list_slice(words, start + 1, start + {CHUNK_TOKENS}))::BIGINT
         AS n_tokens,
       md5(array_to_string(list_slice(words, start + 1,
                                      start + {CHUNK_TOKENS}), ' '))
         AS chunk_hash
FROM s
"""


# --------------------------------------------------------------------------
# hybrid two-stage retrieval: BM25 candidates → embedding cosine re-rank
# --------------------------------------------------------------------------

HYBRID_CANDIDATES = 50
HYBRID_TOP_K = 10
HYBRID_QUERY_VEC_ID = 0   # the query embedding (a row of the embeddings table)


def q_search_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard RAG retrieval layout: a cheap lexical stage (BM25
    top-N over the whole corpus) produces candidates; an expensive
    vector stage (cosine against the query embedding) re-ranks only
    those N. The corpus-wide work stays map-only + one broadcast
    aggregate; the vector math runs on N rows, not the corpus; the
    query embedding rides along as a broadcast 1-row frame (never
    collected to the driver)."""
    from graphview_spark.operators.dedup import cosine_col

    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    qvec = emb.filter(F.col("doc_id") == HYBRID_QUERY_VEC_ID).select(
        F.col("v").alias("qv")
    )
    cand = (
        bm25_scores(docs, BM25_QUERY)
        .orderBy(F.desc("score"), "doc_id")
        .limit(HYBRID_CANDIDATES)
    )
    rescored = (
        cand.join(emb, "doc_id")
        .join(F.broadcast(qvec))
        .select(
            "doc_id",
            F.col("score").alias("bm25"),
            F.round(cosine_col(F.col("v"), F.col("qv")), 6).alias("cosine"),
        )
    )
    # ≤ HYBRID_CANDIDATES rows by construction; pinned because both
    # sides of the rank join below read it
    rescored = _lazy.pin(rescored)
    # rank without a global window: an unpartitioned row_number() drags
    # every row to one partition (Spark's WindowExec warning). On this
    # bounded candidate set, rerank = 1 + |rows strictly ahead| via a
    # broadcast nested-loop self-join — no single-partition exchange,
    # and (cosine desc, doc_id) is a total order so it equals row_number.
    other = rescored.select(
        F.col("cosine").alias("_c"), F.col("doc_id").alias("_d")
    )
    ahead = (F.col("_c") > F.col("cosine")) | (
        (F.col("_c") == F.col("cosine")) & (F.col("_d") < F.col("doc_id"))
    )
    return (
        rescored.join(F.broadcast(other), ahead, "left")
        .groupBy("doc_id", "bm25", "cosine")
        .agg((F.count("_d") + 1).cast("long").alias("rerank"))
        .filter(F.col("rerank") <= HYBRID_TOP_K)
    )


def _oracle_hybrid() -> str:
    dot = " + ".join(f"e.v[{i}] * q.qv[{i}]" for i in range(1, 65))
    nv = " + ".join(f"e.v[{i}] * e.v[{i}]" for i in range(1, 65))
    nq = " + ".join(f"q.qv[{i}] * q.qv[{i}]" for i in range(1, 65))
    return f"""
WITH bm25 AS MATERIALIZED ({_oracle_bm25(limit=HYBRID_CANDIDATES)}),
e AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
      WHERE vec_id = {HYBRID_QUERY_VEC_ID}),
rescored AS (
  SELECT b.doc_id, b.score AS bm25,
         round(({dot}) / (sqrt({nv}) * sqrt({nq})), 6) AS cosine
  FROM bm25 b JOIN e USING (doc_id) CROSS JOIN q
),
ranked AS (
  SELECT doc_id, bm25, cosine,
         row_number() OVER (ORDER BY cosine DESC, doc_id) AS rerank
  FROM rescored
)
SELECT doc_id, bm25, cosine, rerank FROM ranked WHERE rerank <= {HYBRID_TOP_K}
"""


# search_bm25 rotated INTO the driver gate in round 4
QUERIES = {"search_bm25": q_search_bm25}
ORACLES = {"search_bm25": _oracle_bm25()}
EXTRA_QUERIES = {
    "search_postings": q_search_postings,
    "search_chunks": q_search_chunks,
    "search_hybrid": q_search_hybrid,
}
EXTRA_ORACLES = {
    "search_postings": _oracle_postings(),
    "search_chunks": _oracle_chunks(),
    "search_hybrid": _oracle_hybrid(),
}
