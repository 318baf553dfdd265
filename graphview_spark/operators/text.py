"""Text-analysis operators for training-data pipelines (SURVEY.md §7
phase 7): token counting, quality scoring, lexicon language-ID, and
document fingerprinting. All pure column expressions (JVM-side, inside
whole-stage codegen) — no UDFs, no shuffle except the final aggregates —
and each has an exact DuckDB oracle.

Scale notes: every operator here is embarrassingly per-row; at 100 TB
these run map-only over the parquet scan with column pruning (only
``doc_id``/``text`` read). The fingerprint groupBy shuffles on an
8-char key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from graphview_spark.session import read_table

# tiny built-in stopword lexicon (operator parameter in a real pipeline)
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# lexicon profiles for language ID — deterministic scoring; precedence
# order breaks ties (first profile wins). In a real pipeline these are
# per-language frequency profiles; the operator shape is the same.
LANG_PROFILES: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "is", "and", "of"]),
    ("de", ["der", "die", "und", "ist", "das"]),
    ("es", ["el", "la", "que", "de", "es"]),
    ("fr", ["le", "la", "et", "est", "les"]),
    ("zh", ["de5", "shi4", "le5", "zai4", "he2"]),
]

TOKEN_PATTERN = "[a-z0-9]+"     # BPE-ish word/number pieces, lowercase corpus


def _words(text: Column) -> Column:
    return F.split(text, " ")


def _count_in(words: Column, vocab: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))


def _ratio_r(num: Column, den: Column, dp: int = 3) -> Column:
    """``round(num/den, dp)`` computed in EXACT integer arithmetic:
    ``floor((2·10^dp·num + den) / (2·den)) / 10^dp`` (round-half-up).

    Rounding the binary-double quotient is engine-dependent exactly at
    halfway points (e.g. 8743/14000 = 0.6245 → Spark 0.624, DuckDB
    0.625 — a real sf0.1 divergence); integer math makes Spark and the
    oracle agree by construction. Positive integer inputs only."""
    scale = 10 ** dp
    return F.floor((2 * scale * num + den) / (2 * den)) / F.lit(float(scale))


def _sql_ratio_r(num: str, den: str, dp: int = 3) -> str:
    """DuckDB mirror of ``_ratio_r`` (``//`` floors on positive ints)."""
    scale = 10 ** dp
    return f"((({2 * scale} * ({num}) + ({den})) // (2 * ({den}))) / {scale}.0)"


# --------------------------------------------------------------------------
# token counting
# --------------------------------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: whitespace tokens, regex tokens,
    character counts, average word length."""
    docs = read_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    chars_no_space = F.length(F.regexp_replace(F.col("text"), " ", ""))
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_PATTERN), 0)).alias(
            "n_tokens"
        ),
        F.length("text").alias("len_chars"),
        _ratio_r(chars_no_space, F.size(words)).alias("avg_word_len"),
    )


ORACLE_TEXT_STATS = f"""
SELECT doc_id,
       len(string_split(text, ' '))                       AS n_words,
       len(regexp_extract_all(text, '{TOKEN_PATTERN}'))   AS n_tokens,
       length(text)                                       AS len_chars,
       {_sql_ratio_r("length(replace(text, ' ', ''))",
                     "len(string_split(text, ' '))")}     AS avg_word_len
FROM documents
"""


# --------------------------------------------------------------------------
# quality scoring
# --------------------------------------------------------------------------

def quality_milli_col(text: Column) -> Column:
    """1000× the heuristic quality score as an exact integer.

    score = 0.5·u/n + 0.3·(n-s)/n + 0.2·min(n,100)/100
          = N / (1000·n) with N = 100·(5u + 3(n-s)) + 2·n·min(n,100),
    so round(score,3)·1000 = round_half_up(N/n) = ⌊(2N+n)/(2n)⌋ —
    all integer, hence bit-identical in Spark and the DuckDB oracle
    (the float form diverged at true halfway values, e.g. 0.6245)."""
    words = _words(text)
    n = F.size(words)
    u = F.size(F.array_distinct(words))
    s = _count_in(words, STOPWORDS)
    big_n = 100 * (5 * u + 3 * (n - s)) + 2 * n * F.least(n, F.lit(100))
    return F.floor((2 * big_n + n) / (2 * n))


def quality_score_col(text: Column) -> Column:
    """The heuristic quality score (3dp double) as a reusable column —
    shared by q_text_quality and the pipeline quantile filter."""
    return quality_milli_col(text) / F.lit(1000.0)


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: type-token ratio, stopword ratio, and a
    length term, combined into one score + bucket. The exact formula is a
    pipeline parameter; what matters is the operator shape (pure per-row
    math over the tokenized text). All rounded ratios use exact integer
    rounding (_ratio_r) so the oracle matches at halfway values."""
    docs = read_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    n = F.size(words)
    u = F.size(F.array_distinct(words))
    s = _count_in(words, STOPWORDS)
    milli = quality_milli_col(F.col("text"))
    return docs.select(
        "doc_id",
        _ratio_r(u, n).alias("unique_ratio"),
        _ratio_r(s, n).alias("stopword_ratio"),
        (milli / F.lit(1000.0)).alias("quality_score"),
        F.when(milli >= 550, "high")
        .when(milli >= 450, "medium")
        .otherwise("low")
        .alias("quality_bucket"),
    )


_SW = ", ".join(f"'{w}'" for w in STOPWORDS)

# integer milli-score over a pre-split word list `w` (DuckDB) — exact
# mirror of quality_milli_col, shared with the pipeline quantile filter
SQL_QUALITY_MILLI = (
    "((2 * (100 * (5 * len(list_distinct(w)) "
    f"+ 3 * (len(w) - len(list_filter(w, x -> x IN ({_SW}))))) "
    "+ 2 * len(w) * least(len(w), 100)) + len(w)) // (2 * len(w)))"
)
SQL_QUALITY_SCORE = f"({SQL_QUALITY_MILLI} / 1000.0)"

ORACLE_TEXT_QUALITY = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
m AS (
  SELECT doc_id,
         {_sql_ratio_r("len(list_distinct(w))", "len(w)")} AS unique_ratio,
         {_sql_ratio_r(f"len(list_filter(w, x -> x IN ({_SW})))", "len(w)")}
           AS stopword_ratio,
         {SQL_QUALITY_MILLI} AS milli
  FROM t)
SELECT doc_id, unique_ratio, stopword_ratio,
       milli / 1000.0 AS quality_score,
       CASE WHEN milli >= 550 THEN 'high'
            WHEN milli >= 450 THEN 'medium'
            ELSE 'low' END AS quality_bucket
FROM m
"""


# --------------------------------------------------------------------------
# language ID (lexicon scoring)
# --------------------------------------------------------------------------

def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-profile language ID: score = profile-word hits per token;
    predicted = argmax with profile-order precedence. Aggregated into a
    confusion count against the labeled ``lang`` column."""
    docs = read_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    scored = docs.select(
        "doc_id",
        "lang",
        *[
            (_count_in(words, vocab) / F.size(words)).alias(f"score_{code}")
            for code, vocab in LANG_PROFILES
        ],
    )
    # precedence: FIRST profile in order wins ties → nest whens so the
    # first profile is the outermost test (same shape as the SQL CASE)
    best = F.greatest(*[F.col(f"score_{c}") for c, _ in LANG_PROFILES])
    pred = F.lit("unknown")
    for code, _ in reversed(LANG_PROFILES):
        pred = F.when(F.col(f"score_{code}") == best, F.lit(code)).otherwise(pred)
    return (
        scored.select("doc_id", "lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _oracle_langid() -> str:
    score_exprs = ",\n  ".join(
        "len(list_filter(w, x -> x IN ({v})))::DOUBLE / len(w) AS score_{c}".format(
            v=", ".join(f"'{x}'" for x in vocab), c=code
        )
        for code, vocab in LANG_PROFILES
    )
    best = "greatest(" + ", ".join(f"score_{c}" for c, _ in LANG_PROFILES) + ")"
    whens = "\n       ".join(
        f"WHEN score_{c} = {best} THEN '{c}'" for c, _ in LANG_PROFILES
    )
    return f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
s AS (SELECT doc_id, lang, {score_exprs} FROM t)
SELECT lang,
       CASE {whens} ELSE 'unknown' END AS pred_lang,
       count(*) AS n_docs
FROM s
GROUP BY lang, pred_lang
"""


# --------------------------------------------------------------------------
# document fingerprinting
# --------------------------------------------------------------------------

def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: minimum md5 over word 4-gram shingles (the
    1-permutation MinHash — a stable content signature robust to small
    edits), plus the fingerprint-group size across the corpus.

    Group size via a window over ``fp``: ONE evaluation of the shingle
    transform and ONE shuffle — the groupBy+self-join form evaluated the
    md5-shingle plan twice and shuffled twice (at 100 TB the second
    full-row shuffle is the bottleneck). Skew bound: the window has no
    ordering, so a viral fingerprint costs one reducer a buffered count
    over short (doc_id, fp) rows — linear, no sort; if a single
    fingerprint's copy count approaches reducer memory, switch to
    checkpoint + the combiner-safe groupBy-join (dedup_exact's shape)."""
    from graphview_spark.operators.dedup import read_spread, shingles_col
    from pyspark.sql import Window as W

    docs = read_spread(spark, sf_dir, "documents", "doc_id")
    fps = docs.select(
        "doc_id",
        F.array_min(
            F.transform(shingles_col(F.col("text")), lambda s: F.md5(s))
        ).alias("fp"),
    )
    return fps.select(
        "doc_id",
        "fp",
        F.count(F.lit(1)).over(W.partitionBy("fp")).alias("fp_group_size"),
    )


def _oracle_fingerprint() -> str:
    from graphview_spark.operators.dedup import _sql_shingles

    return f"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
fps AS (SELECT doc_id,
        list_min(list_transform({_sql_shingles()}, s -> md5(s))) AS fp
        FROM docs),
sizes AS (SELECT fp, count(*) AS fp_group_size FROM fps GROUP BY fp)
SELECT doc_id, fp, fp_group_size FROM fps JOIN sizes USING (fp)
"""


# --------------------------------------------------------------------------
# corpus-level top-k n-grams
# --------------------------------------------------------------------------

TOPK_NGRAMS = 20


def q_text_topk_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent word bigrams across the corpus — the canonical heavy
    explode→count shape. Scale path: the groupBy count is map-side
    combined (partial aggregation absorbs the explosion before the
    shuffle) and the top-k is ``orderBy().limit()`` = TakeOrdered, a
    per-partition heap + driver merge — never a global sort or a
    single-partition window. Deterministic tie-break on the ngram."""
    from graphview_spark.operators.dedup import read_spread

    docs = read_spread(spark, sf_dir, "documents", "doc_id")

    # eval_once: inlined, element_at(split(text), i) re-tokenizes the
    # document once per bigram position
    def _bigrams(words: Column) -> Column:
        return F.when(
            F.size(words) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(words) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(words, i), F.element_at(words, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    from graphview_spark.operators import eval_once

    bigrams = eval_once(_words(F.col("text")), _bigrams)
    return (
        docs.select(F.explode(bigrams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("ngram"))
        .limit(TOPK_NGRAMS)
    )


ORACLE_TEXT_TOPK_NGRAMS = f"""
WITH docs AS (SELECT string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i + 1])) AS ngram
  FROM docs WHERE len(w) >= 2)
SELECT ngram, count(*) AS n
FROM grams GROUP BY ngram
ORDER BY n DESC, ngram LIMIT {TOPK_NGRAMS}
"""


# --------------------------------------------------------------------------
# normalization + redaction
# --------------------------------------------------------------------------

def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data text normalization: lowercase, strip non-alphanumeric,
    collapse whitespace; plus number redaction (the PII-redaction shape —
    swap the pattern for emails/phones in a real pipeline). Pure
    regexp_replace column expressions — map-only, codegen-resident."""
    docs = read_table(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(lowered, "[^a-z0-9 ]", ""), " +", " "
        )
    )
    redacted = F.regexp_replace(F.col("text"), "[0-9]+", "<NUM>")
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).alias("n_chars_norm"),
        redacted.alias("redacted_text"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), 0)).alias(
            "n_redactions"
        ),
    )


ORACLE_TEXT_NORMALIZE = """
WITH t AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                             ' +', ' ', 'g')) AS norm_text
  FROM documents)
SELECT doc_id, norm_text,
       length(norm_text) AS n_chars_norm,
       regexp_replace(text, '[0-9]+', '<NUM>', 'g') AS redacted_text,
       len(regexp_extract_all(text, '[0-9]+')) AS n_redactions
FROM t
"""


# --------------------------------------------------------------------------
# vocabulary statistics (exact distinct; the sketch variant is pytest-bound)
# --------------------------------------------------------------------------

def q_text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary size (exact distinct tokens) and token
    volume — the canonical expensive distinct-aggregation: explode →
    two-level shuffle (partial distinct per partition, then merge). The
    HLL sketch variant is the 100 TB path — one pass, mergeable state,
    no exact-distinct shuffle. Two forms exist: the builtin
    ``approx_count_distinct`` (asserted within rsd bounds in
    tests/test_text_vocab.py; its HLL++ registers are engine-specific,
    so it can't be oracle-gated) and operators/sketch.py's
    deterministic md5-register HLL (``sketch_distinct_hll``), which IS
    oracle-gated and whose register tables merge losslessly across
    shards (``sketch_hll_union``)."""
    from graphview_spark.operators.dedup import read_spread

    docs = read_spread(spark, sf_dir, "documents", "doc_id")
    toks = docs.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    return toks.groupBy("lang").agg(
        F.countDistinct("tok").alias("vocab"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


ORACLE_TEXT_VOCAB = """
SELECT lang, count(DISTINCT tok) AS vocab, count(*) AS n_tokens
FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY lang
"""


def q_text_stats_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token statistics AND heuristic quality scoring in ONE per-doc
    projection — the two per-row operator families share a single
    tokenize and a single scan (no join; at 100 TB a self-join on
    doc_id just to reunite per-row columns would be a pointless full
    shuffle). Map-only, codegen-resident."""
    docs = read_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    n = F.size(words)
    u = F.size(F.array_distinct(words))
    s = _count_in(words, STOPWORDS)
    chars_no_space = F.length(F.regexp_replace(F.col("text"), " ", ""))
    milli = quality_milli_col(F.col("text"))
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(TOKEN_PATTERN), 0)
        ).alias("n_tokens"),
        F.length("text").alias("len_chars"),
        _ratio_r(chars_no_space, n).alias("avg_word_len"),
        _ratio_r(u, n).alias("unique_ratio"),
        _ratio_r(s, n).alias("stopword_ratio"),
        (milli / F.lit(1000.0)).alias("quality_score"),
        F.when(milli >= 550, "high")
        .when(milli >= 450, "medium")
        .otherwise("low")
        .alias("quality_bucket"),
    )


_ORACLE_TEXT_STATS_QUALITY = f"""
SELECT s.*, q.unique_ratio, q.stopword_ratio, q.quality_score,
       q.quality_bucket
FROM ({ORACLE_TEXT_STATS}) s JOIN ({ORACLE_TEXT_QUALITY}) q USING (doc_id)
"""


# --------------------------------------------------------------------------
# repetition-based quality (Gopher-style repetition rules)
# --------------------------------------------------------------------------

def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition metrics, the Gopher-rule family for
    filtering degenerate/templated text: fraction of duplicate words
    (1 - type/token ratio) and the fraction of bigram mass taken by the
    single most frequent bigram. Pure per-row higher-order-function
    expressions, map-only, no shuffle, no UDF. The mode count is a
    LINEAR run-length fold over the doc's sorted bigram array —
    O(n log n) per doc; the earlier O(distinct × n) filter-per-distinct
    form went superlinear in corpus time once sf0.1's longer documents
    arrived (SCALECHECK r4: 0.7 → 12.7 s for 10× rows)."""
    from graphview_spark.operators import eval_once
    from graphview_spark.operators.dedup import read_spread

    # spread (no-op at scale): the per-row HOF pipeline below is the
    # whole query; a single-file scan would run it on one core
    docs = read_spread(spark, sf_dir, "documents", "doc_id")

    # eval_once binds the split so all three derived columns (bigrams,
    # token count, distinct count) tokenize the document once — and the
    # bigram lambda stops re-splitting per position
    def _feats(words: Column) -> Column:
        n = F.size(words)
        bigrams = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(words, i), F.element_at(words, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.struct(
            bigrams.alias("g"), n.alias("n_words"),
            F.size(F.array_distinct(words)).alias("n_uniq"))

    # staged projection: _f is non-cheap and referenced three times, so
    # CollapseProject keeps the alias instead of inlining it per field
    docs = docs.select(
        "doc_id", eval_once(_words(F.col("text")), _feats).alias("_f")
    ).select(
        "doc_id", F.col("_f.g").alias("g"),
        F.col("_f.n_words").alias("n_words"),
        F.col("_f.n_uniq").alias("n_uniq"),
    )
    # longest equal run in the sorted array == max multiplicity
    top_cnt = F.aggregate(
        F.array_sort(F.col("g")),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return docs.select(
        "doc_id",
        _ratio_r(
            F.col("n_words") - F.col("n_uniq"), F.col("n_words"), 4
        ).alias("dup_word_frac"),
        F.size("g").alias("n_bigrams"),
        F.when(
            F.size("g") > 0, _ratio_r(top_cnt, F.size("g"), 4)
        ).alias("top_bigram_frac"),
    )


ORACLE_TEXT_REPETITION = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
b AS (SELECT doc_id, w,
             CASE WHEN len(w) >= 2
                  THEN list_transform(generate_series(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i + 1])
                  ELSE [] END AS g
      FROM t),
-- max bigram multiplicity relationally (unnest -> count -> max): same
-- exact-integer value as the Spark side's sorted run-length fold
top AS (
  SELECT doc_id, max(c) AS top_cnt FROM (
    SELECT doc_id, big, count(*) AS c
    FROM (SELECT doc_id, unnest(g) AS big FROM b)
    GROUP BY doc_id, big
  ) GROUP BY doc_id
)
SELECT b.doc_id,
       {_sql_ratio_r("len(w) - len(list_distinct(w))", "len(w)", 4)}
         AS dup_word_frac,
       len(g) AS n_bigrams,
       CASE WHEN len(g) > 0 THEN
         {_sql_ratio_r("top.top_cnt", "len(g)", 4)}
       END AS top_bigram_frac
FROM b LEFT JOIN top ON top.doc_id = b.doc_id
"""


def q_text_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level aggregates in one tagged result: top-k bigrams
    (explode → map-side-combined count → TakeOrdered) AND per-language
    vocabulary (exact distinct + token volume) — the two corpus-wide
    reporting shapes over the same exploded-token scan family."""
    topk = q_text_topk_ngrams(spark, sf_dir).select(
        F.lit("topk_ngram").alias("tag"),
        F.col("ngram").alias("key"),
        F.col("n").alias("n"),
        F.lit(None).cast("long").alias("n_tokens"),
    )
    vocab = q_text_vocab(spark, sf_dir).select(
        F.lit("vocab").alias("tag"),
        F.col("lang").alias("key"),
        F.col("vocab").alias("n"),
        F.col("n_tokens"),
    )
    return topk.unionByName(vocab)


_ORACLE_TEXT_CORPUS = f"""
SELECT 'topk_ngram' AS tag, ngram AS key, n, NULL::BIGINT AS n_tokens
FROM ({ORACLE_TEXT_TOPK_NGRAMS})
UNION ALL
SELECT 'vocab' AS tag, lang AS key, vocab AS n, n_tokens
FROM ({ORACLE_TEXT_VOCAB})
"""


# --------------------------------------------------------------------------
# PII scrubbing — map-only regex redaction (email / phone / IP), the
# standard pre-training hygiene pass. Patterns use only constructs with
# identical semantics in Java regex (Spark) and RE2 (DuckDB), so the
# redaction is oracle-checkable byte-for-byte.
# --------------------------------------------------------------------------

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{4}", "[PHONE]"),
    ("ip", r"\b10\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def scrub_pii(df: DataFrame, col: str = "text") -> DataFrame:
    """Redact PII patterns in ``col`` → ``clean_text`` + ``n_pii`` match
    count. Pure column expressions (regexp_count/regexp_replace), fully
    codegen-resident, no shuffle — scales as a map pass. Each pattern
    counts against the already-redacted text of the previous pattern so
    overlapping matches never double-count."""
    clean = F.col(col)
    n: Column = F.lit(0)
    for _, pat, repl in PII_PATTERNS:
        n = n + F.regexp_count(clean, F.lit(pat))
        clean = F.regexp_replace(clean, pat, repl)
    return df.withColumn("n_pii", n.cast("int")).withColumn(
        "clean_text", clean
    )


def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic corpus carries no PII, so the query deterministically
    plants one email + phone + IP per document (derived from doc_id) and
    then proves the scrub removes all three."""
    docs = read_table(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10.0."),
            (F.col("doc_id") % 256).cast("string"), F.lit(".1"),
        ).alias("text"),
    )
    return scrub_pii(salted).select("doc_id", "n_pii", "clean_text")


def _oracle_pii_scrub() -> str:
    salt = (
        "text || ' contact user' || doc_id::VARCHAR || "
        "'@example.com or +1-555-' || "
        "lpad((doc_id % 10000)::VARCHAR, 4, '0') || "
        "' from 10.0.' || (doc_id % 256)::VARCHAR || '.1'"
    )
    sql = f"SELECT doc_id, 0 AS n, {salt} AS t FROM documents"
    for _, pat, repl in PII_PATTERNS:
        sql = (
            f"SELECT doc_id, n + len(regexp_extract_all(t, '{pat}')) AS n, "
            f"regexp_replace(t, '{pat}', '{repl}', 'g') AS t "
            f"FROM ({sql})"
        )
    return f"SELECT doc_id, n::INT AS n_pii, t AS clean_text FROM ({sql})"


# --------------------------------------------------------------------------
# Gopher-style heuristic quality rules (Rae et al. 2021 §A1.1 — the
# standard pretraining-corpus repetition/format gate; word-level subset
# here since the synthetic docs are single-line)
# --------------------------------------------------------------------------

GOPHER_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "that"]
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 40, 100_000
GOPHER_MIN_WORDLEN, GOPHER_MAX_WORDLEN = 3.0, 10.0
GOPHER_MIN_ALPHA = 0.8
GOPHER_MIN_STOPWORDS = 2


def q_text_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-filter rules, one flag column per rule plus the
    combined keep decision. Map-only over one tokenize: every rule is a
    JVM-side expression on the same split array, so at 100 TB this is a
    single codegen'd scan — no shuffle, no Python. Mean word length
    uses the exact single-space identity (sum(len) = n_chars - n_words
    + 1) and the integer round-half-up helper so both engines agree at
    halfway points; the alpha fraction counts purely-alphabetic words
    via the same 3dp exact ratio."""
    from graphview_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    n_words = F.size(words)
    sum_len = F.length("text") - (n_words - F.lit(1))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("^[a-z]+$")))
    n_stop = F.size(
        F.array_intersect(
            words, F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
        )
    )
    d = docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        _ratio_r(sum_len, n_words, 3).alias("mean_word_len"),
        _ratio_r(n_alpha, n_words, 3).alias("alpha_frac"),
        n_stop.cast("long").alias("n_stopwords"),
    )
    r_words = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    r_len = F.col("mean_word_len").between(
        GOPHER_MIN_WORDLEN, GOPHER_MAX_WORDLEN
    )
    r_alpha = F.col("alpha_frac") >= GOPHER_MIN_ALPHA
    r_stop = F.col("n_stopwords") >= GOPHER_MIN_STOPWORDS
    return d.select(
        "doc_id", "n_words", "mean_word_len", "alpha_frac", "n_stopwords",
        r_words.alias("ok_words"),
        r_len.alias("ok_word_len"),
        r_alpha.alias("ok_alpha"),
        r_stop.alias("ok_stopwords"),
        (r_words & r_len & r_alpha & r_stop).alias("keep"),
    )


def _oracle_gopher() -> str:
    stop = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    mean_len = _sql_ratio_r("len(text) - (n_words - 1)", "n_words", 3)
    alpha = _sql_ratio_r("n_alpha", "n_words", 3)
    return f"""
WITH d AS (
  SELECT doc_id, text,
         len(string_split(text, ' ')) AS n_words,
         len(list_filter(string_split(text, ' '),
             w -> regexp_full_match(w, '[a-z]+'))) AS n_alpha,
         len(list_intersect(string_split(text, ' '),
             [{stop}])) AS n_stopwords
  FROM documents
), m AS (
  SELECT doc_id, n_words,
         {mean_len} AS mean_word_len,
         {alpha} AS alpha_frac,
         n_stopwords
  FROM d
)
SELECT doc_id, n_words, mean_word_len, alpha_frac, n_stopwords,
       n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
         AS ok_words,
       mean_word_len BETWEEN {GOPHER_MIN_WORDLEN} AND {GOPHER_MAX_WORDLEN}
         AS ok_word_len,
       alpha_frac >= {GOPHER_MIN_ALPHA} AS ok_alpha,
       n_stopwords >= {GOPHER_MIN_STOPWORDS} AS ok_stopwords,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
         AND (mean_word_len BETWEEN {GOPHER_MIN_WORDLEN}
              AND {GOPHER_MAX_WORDLEN})
         AND alpha_frac >= {GOPHER_MIN_ALPHA}
         AND n_stopwords >= {GOPHER_MIN_STOPWORDS} AS keep
FROM m
"""


# --------------------------------------------------------------------------
# duplicated-content ratio (cross-document span duplication)
# --------------------------------------------------------------------------

DUP_SPAN_N = 5      # words per duplicated-content n-gram
DUP_SPAN_T = 0.5    # flag docs with ≥ this fraction duplicated


def duplicated_ngram_fraction(
    docs: DataFrame, n: int = DUP_SPAN_N, threshold: float = DUP_SPAN_T,
) -> DataFrame:
    """Per-document duplicated-content ratio — the cross-document span
    dedup signal (the RefinedWeb/MassiveWeb "fraction of duplicated
    content" filter, the unstructured-text analog of Falcon's
    duplicated-line removal): for each doc, the fraction of its
    DISTINCT word ``n``-grams that also occur in at least one OTHER
    document. Boilerplate, mirrored pages and template farms score
    high; unique prose scores ~0.

    Plan shape at 100 TB: one explode pass over the corpus → doc
    frequency as a gram-partitioned window count (grams are distinct
    per doc, so a plain COUNT over the gram partition is the document
    frequency) → per-doc count aggregate → left join onto the doc ids.
    Two corpus-sized shuffles (gram, then doc_id), both on
    high-cardinality keys; the corpus text itself never shuffles, only
    (doc_id, gram) pairs. The ratio uses the exact
    integer round-half-up identity so both engines agree at halfway
    points. Returns (doc_id, n_grams, n_dup, dup_fraction, flagged)
    for every doc; gram-less docs (< n words) score 0.0."""
    from pyspark.sql import Window as W

    from graphview_spark.operators.pipeline import _word_ngrams

    # NOT pinned: since the doc-frequency moved from groupBy+join-back
    # (two readers) to a single window pass, the exploded grams have
    # exactly one consumer — materializing them (a full write+read of
    # the exploded corpus) bought nothing and at 100 TB would spill the
    # whole gram stream to local disk before the first exchange
    grams = docs.select(
        "doc_id", F.explode(_word_ngrams(F.col("text"), n)).alias("gram")
    )
    # doc frequency as a gram-partitioned window count: ONE shuffle on
    # gram (vs groupBy + join back = two), then the per-doc aggregate
    per_doc = (
        grams.withColumn(
            "df", F.count(F.lit(1)).over(W.partitionBy("gram")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.when(F.col("df") >= 2, 1)).alias("n_dup"),
        )
    )
    frac = F.when(
        F.col("n_grams") > 0, _ratio_r(F.col("n_dup"), F.col("n_grams"))
    ).otherwise(F.lit(0.0))
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("n_dup", F.lit(0).cast("long")).alias("n_dup"),
        )
        .select(
            "doc_id", "n_grams", "n_dup",
            frac.alias("dup_fraction"),
            (frac >= threshold).alias("flagged"),
        )
    )


def q_text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphview_spark.operators.dedup import read_spread

    # spread: the 5-gram explode is the per-row-heavy pass; a
    # single-file gate-scale scan would serialize it on one core
    # (read_spread is a no-op once the scan has ≥ cores splits)
    docs = read_spread(spark, sf_dir, "documents", "doc_id")
    return duplicated_ngram_fraction(docs)


def _oracle_dup_spans() -> str:
    from graphview_spark.operators.pipeline import _sql_word_ngrams

    g = _sql_word_ngrams(DUP_SPAN_N)
    ratio = _sql_ratio_r("n_dup", "n_grams")
    frac = f"CASE WHEN coalesce(n_grams, 0) > 0 THEN {ratio} ELSE 0.0 END"
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (SELECT doc_id, unnest({g}) AS gram FROM w),
dfc AS (SELECT gram, count(*) AS df FROM grams GROUP BY gram),
per_doc AS (
  SELECT g.doc_id, count(*) AS n_grams,
         count(*) FILTER (df >= 2) AS n_dup
  FROM grams g JOIN dfc USING (gram) GROUP BY g.doc_id
)
SELECT d.doc_id,
       coalesce(n_grams, 0) AS n_grams,
       coalesce(n_dup, 0) AS n_dup,
       {frac} AS dup_fraction,
       {frac} >= {DUP_SPAN_T} AS flagged
FROM documents d LEFT JOIN per_doc USING (doc_id)
"""


QUERIES = {
    "text_stats_quality": q_text_stats_quality,
    "text_langid": q_text_langid,
    "text_corpus": q_text_corpus,
    "text_repetition": q_text_repetition,
}

ORACLES = {
    "text_stats_quality": _ORACLE_TEXT_STATS_QUALITY,
    "text_langid": _oracle_langid(),
    "text_corpus": _ORACLE_TEXT_CORPUS,
    "text_repetition": ORACLE_TEXT_REPETITION,
}

# outside the 50-entry driver gate — oracle-checked via extra_queries()
EXTRA_QUERIES = {
    "text_gopher": q_text_gopher,
    "text_dup_spans": q_text_dup_spans,
    "text_pii_scrub": q_text_pii_scrub,
    # rotated OUT of the driver gate in round 4 (driver-green rounds 2-3)
    "text_fingerprint": q_text_fingerprint,
    "text_normalize": q_text_normalize,
}
EXTRA_ORACLES = {
    "text_gopher": _oracle_gopher(),
    "text_dup_spans": _oracle_dup_spans(),
    "text_pii_scrub": _oracle_pii_scrub(),
    "text_fingerprint": _oracle_fingerprint(),
    "text_normalize": ORACLE_TEXT_NORMALIZE,
}
