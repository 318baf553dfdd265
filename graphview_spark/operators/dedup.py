"""Deduplication operators for large-scale training-data pipelines.

Net-new surface beyond the reference (SURVEY.md §7 phase 7): exact
dedup, MinHash+LSH, SimHash, n-gram Jaccard with length blocking, and
embedding-cosine near-dup. Every operator is a pure DataFrame plan whose
hash primitives (md5) exist verbatim in DuckDB, so each query has an
exact oracle — no RNG, no UDFs, no driver-side loops.

Scale design (the whole point of these operators):
  - Exact dedup: one hash-shuffle on md5(text) — the canonical
    map-side-combinable groupBy.
  - MinHash+LSH: signatures are per-row column math (no shuffle);
    candidate generation shuffles on the *band key* only (tiny), and the
    expensive Jaccard verification runs only on band-collision pairs.
    This is the textbook O(n·sig + candidates) layout that survives
    100 TB, vs the O(n²) all-pairs join that does not.
  - SimHash: per-row 60-bit fingerprint; candidates via the pigeonhole
    chunk trick (hamming ≤ k pairs must collide on one of k+1 chunks) —
    again equi-join shuffles on short keys only.
  - n-gram Jaccard: blocked by a length band so the pair space is
    bounded per block; each block join is an equi-join.
  - Embedding cosine: brute-force within-label blocking here;
    the LSH-bucketed variant lives in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from graphview_spark.session import read_table

SHINGLE_N = 4          # words per shingle
N_PERM = 16            # minhash permutations
N_BANDS = 4            # LSH bands (rows per band = N_PERM // N_BANDS)
MINHASH_JACCARD_T = 0.7
NGRAM_JACCARD_T = 0.5
SIMHASH_BITS = 60      # 15 hex chars of md5 → 60-bit fingerprint
SIMHASH_CHUNKS = 4     # pigeonhole: hamming ≤ CHUNKS-1 guaranteed caught
SIMHASH_HAMMING_T = 3
COSINE_T = 0.4
LENGTH_BAND = 20       # chars per length-blocking band


def read_spread(spark: SparkSession, sf_dir: str, name: str, key: str) -> DataFrame:
    """Read a table and spread it across the cluster's cores.

    The synthetic tables are single small parquet files → Spark scans them
    as one partition, which would serialize every per-row-heavy operator
    (md5 signatures, intersections) onto one core. On a real deployment
    the scan is already split by ``spark.sql.files.maxPartitionBytes``;
    this repartition makes the local harness behave like that. Hashing on
    the row key keeps the spread deterministic."""
    df = read_table(spark, sf_dir, name)
    n = spark.sparkContext.defaultParallelism
    return df.repartition(n, F.col(key))


# --------------------------------------------------------------------------
# shared shingling (Spark + the DuckDB-SQL mirror)
# --------------------------------------------------------------------------

def shingles_col(text: Column, n: int = SHINGLE_N) -> Column:
    """Distinct word n-gram shingles of a space-tokenized text column.

    Guarded so short documents yield [] (Spark's ``sequence`` would
    otherwise emit a *descending* range when stop < start).
    """
    words = F.split(text, " ")
    return F.when(
        F.size(words) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(words) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(words, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _sql_shingles(n: int = SHINGLE_N) -> str:
    """DuckDB expression mirroring ``shingles_col`` (w = word list)."""
    return (
        f"CASE WHEN len(w) >= {n} THEN list_distinct(list_transform("
        f"generate_series(1, len(w) - {n - 1}), "
        f"i -> array_to_string(w[i:i+{n - 1}], ' '))) "
        f"ELSE [] END"
    )


def _jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


_SQL_JACCARD = (
    "len(list_intersect({a}, {b}))::DOUBLE / "
    "(len({a}) + len({b}) - len(list_intersect({a}, {b})))"
)


# --------------------------------------------------------------------------
# exact dedup — hash groupBy
# --------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate grouping by content hash. Each doc maps to the
    canonical (min doc_id) member of its md5(text) group; ``is_dup``
    marks rows a dedup pass would drop. One shuffle, map-side combined."""
    from pyspark.sql import Window as W

    docs = read_table(spark, sf_dir, "documents")
    w = W.partitionBy("h")
    return (
        docs.select("doc_id", F.md5("text").alias("h"))
        .select(
            "doc_id",
            F.min("doc_id").over(w).alias("canonical_id"),
            F.count(F.lit(1)).over(w).alias("group_size"),
        )
        .select(
            "doc_id",
            "canonical_id",
            "group_size",
            (F.col("doc_id") != F.col("canonical_id")).alias("is_dup"),
        )
    )


ORACLE_DEDUP_EXACT = """
WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
g AS (SELECT h, min(doc_id) AS canonical_id, count(*) AS group_size
      FROM h GROUP BY h)
SELECT doc_id, canonical_id, group_size,
       doc_id <> canonical_id AS is_dup
FROM h JOIN g USING (h)
"""


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

MINHASH_P = 2_147_483_647          # Mersenne prime 2^31 - 1
_MINHASH_MASK = 1 << 28            # fold the 60-bit shingle hash to 28 bits


def _minhash_coeffs(n_perm: int = N_PERM) -> list[tuple[int, int]]:
    """Seeded (a, b) pairs for the universal-hash permutations — public,
    deterministic constants mirrored into the DuckDB oracle (same pattern
    as the similarity module's hyperplanes)."""
    import numpy as np

    rng = np.random.RandomState(41)
    return [
        (int(rng.randint(1, MINHASH_P)), int(rng.randint(0, MINHASH_P)))
        for _ in range(n_perm)
    ]


MINHASH_COEFFS = _minhash_coeffs()


def minhash_signatures(docs: DataFrame, n_perm: int = N_PERM) -> DataFrame:
    """(doc_id, hashed shingles, sig_0..sig_{n-1}).

    Each shingle hashes ONCE (md5 → 60-bit int); permutation *i* is the
    universal hash ``(a_i * (h % 2^28) + b_i) % (2^31-1)`` — integer
    column math instead of the naive n_perm md5 calls per shingle (16×
    less digest work, the dominant CPU cost of MinHash at scale). The
    min over the shingle set per permutation is the standard MinHash
    order statistic. Pure per-row math: no shuffle.

    ``hs`` (the 60-bit hashed shingle set) also feeds the exact-Jaccard
    verification: intersecting longs is ~10× cheaper than 30-char
    strings, and the oracle hashes identically so a (negligible,
    2^-60-scale) collision cannot cause a mismatch."""
    # Materialize the hashed-shingle arrays BEFORE fanning out into the
    # signature expressions: Catalyst's projection collapse would
    # otherwise substitute the tokenize+slice+md5 work into every
    # signature and recompute it n_perm times per row.
    sh = (
        docs.select("doc_id", shingles_col(F.col("text")).alias("shw"))
        .filter(F.size("shw") > 0)
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.col("shw"),
                    lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast(
                        "long"
                    ),
                )
            ).alias("hs"),
        )
        .localCheckpoint(eager=True)
    )

    # one nested-HOF expression computing all signatures at once keeps
    # the generated codegen method tiny (the n_perm-separate-columns form
    # compiled pathologically — minutes of janino time on occasion)
    a_arr = F.array(*[F.lit(a) for a, _ in MINHASH_COEFFS])
    b_arr = F.array(*[F.lit(b) for _, b in MINHASH_COEFFS])
    sig_arr = F.transform(
        F.sequence(F.lit(0), F.lit(n_perm - 1)),
        lambda i: F.array_min(
            F.transform(
                F.col("hs"),
                lambda h: (
                    F.element_at(a_arr, i + 1) * (h % F.lit(_MINHASH_MASK))
                    + F.element_at(b_arr, i + 1)
                )
                % F.lit(MINHASH_P),
            )
        ),
    )
    out = sh.select("doc_id", "hs", sig_arr.alias("sigs"))
    return out.select(
        "doc_id",
        "hs",
        *[F.element_at("sigs", i + 1).alias(f"sig_{i}") for i in range(n_perm)],
    )


def _band_col(b: int, rows: int) -> Column:
    return F.concat_ws("|", *[F.col(f"sig_{b * rows + r}") for r in range(rows)])


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.
    Pairs must agree on at least one full band of the signature; only
    those candidates pay the exact set-intersection cost."""
    rows = N_PERM // N_BANDS
    docs = read_spread(spark, sf_dir, "documents", "doc_id")
    # checkpoint: sigs feed 4 band branches + the verification join — the
    # md5 signature work must run once, not once per consumer
    sigs = minhash_signatures(docs).localCheckpoint(eager=True)

    bands = None
    for b in range(N_BANDS):
        part = sigs.select(
            "doc_id", F.lit(b).alias("band"), _band_col(b, rows).alias("bkey")
        )
        bands = part if bands is None else bands.unionByName(part)
    left = bands.select(
        F.col("doc_id").alias("doc_a"), "band", "bkey"
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"), "band", "bkey"
    )
    cands = (
        left.join(right, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sh = sigs.select("doc_id", "hs")
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("sh_a"))
    b2 = sh.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("sh_b"))
    return (
        cands.join(a, "doc_a")
        .join(b2, "doc_b")
        .withColumn("jaccard", F.round(_jaccard(F.col("sh_a"), F.col("sh_b")), 3))
        .filter(F.col("jaccard") >= MINHASH_JACCARD_T)
        .select("doc_a", "doc_b", "jaccard")
    )


def _sql_hex15_to_int(var: str = "s") -> str:
    """DuckDB: first 15 hex chars of md5(var) → BIGINT (mirrors Spark's
    ``conv(substring(md5(s), 1, 15), 16, 10)``)."""
    return (
        f"list_reduce(list_transform(string_split(substr(md5({var}), 1, 15), ''), "
        "c -> strpos('0123456789abcdef', c)::BIGINT - 1), (a, b) -> a * 16 + b)"
    )


def _oracle_minhash() -> str:
    rows = N_PERM // N_BANDS
    sig_exprs = ",\n  ".join(
        f"list_min(list_transform(hs, h -> ({a} * (h % {_MINHASH_MASK}) + {b}) "
        f"% {MINHASH_P})) AS sig_{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    )
    band_selects = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, {b} AS band, {key} AS bkey FROM sigs".format(
            b=b,
            key=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(N_BANDS)
    )
    jac = _SQL_JACCARD.format(a="x.hs", b="y.hs")
    return f"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT doc_id, {_sql_shingles()} AS shw FROM docs),
shn AS (SELECT doc_id,
        list_distinct(list_transform(shw, s -> {_sql_hex15_to_int()})) AS hs
        FROM sh WHERE len(shw) > 0),
sigs AS (SELECT doc_id, hs, {sig_exprs} FROM shn),
bands AS ({band_selects}),
cands AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r ON l.band = r.band AND l.bkey = r.bkey
  WHERE l.doc_id < r.doc_id)
SELECT doc_a, doc_b, round({jac}, 3) AS jaccard
FROM cands JOIN shn x ON x.doc_id = doc_a JOIN shn y ON y.doc_id = doc_b
WHERE round({jac}, 3) >= {MINHASH_JACCARD_T}
"""


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def word_hashes_col(text: Column) -> Column:
    """Per-word 60-bit hashes (15 hex chars of md5 → bigint)."""
    return F.transform(
        F.split(text, " "),
        lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long"),
    )


def simhash_from_hashes(hs: Column) -> Column:
    """60-bit SimHash from a word-hash array: per bit, strict majority of
    word-hash bits sets the fingerprint bit. One nested-HOF aggregate
    over the bit-mask array — per-row, no shuffle, no UDF, and a small
    generated method (the previous 60-separate-aggregates form compiled
    pathologically slowly in whole-stage codegen on occasion)."""
    masks = F.array(*[F.lit(1 << j).cast("long") for j in range(SIMHASH_BITS)])
    n = F.size(hs)
    return F.aggregate(
        masks,
        F.lit(0).cast("long"),
        lambda acc, mask: acc
        + F.when(
            F.aggregate(
                hs,
                F.lit(0).cast("long"),
                lambda a, h: a
                + F.when(h.bitwiseAND(mask) != 0, F.lit(1)).otherwise(F.lit(0)),
            )
            * 2
            > n,
            mask,
        ).otherwise(F.lit(0).cast("long")),
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: fingerprint per doc, candidates via
    pigeonhole chunking (hamming ≤ 3 ⇒ equal on ≥1 of 4 15-bit chunks),
    verified with bit_count(xor)."""
    docs = read_spread(spark, sf_dir, "documents", "doc_id")
    # stage the word-hash array first: the 60 per-bit aggregates must read
    # a materialized array, not re-derive 60× (md5+conv per word) rows
    hashed = docs.select(
        "doc_id", word_hashes_col(F.col("text")).alias("hs")
    ).localCheckpoint(eager=True)
    fp = hashed.select(
        "doc_id", simhash_from_hashes(F.col("hs")).alias("fp")
    ).localCheckpoint(eager=True)
    chunk_bits = SIMHASH_BITS // SIMHASH_CHUNKS
    mask = (1 << chunk_bits) - 1

    chunks = None
    for c in range(SIMHASH_CHUNKS):
        part = fp.select(
            "doc_id", "fp", F.lit(c).alias("chunk"),
            F.shiftright(F.col("fp"), c * chunk_bits).bitwiseAND(F.lit(mask)).alias("ckey"),
        )
        chunks = part if chunks is None else chunks.unionByName(part)
    left = chunks.select(
        F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a"), "chunk", "ckey"
    )
    right = chunks.select(
        F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b"), "chunk", "ckey"
    )
    return (
        left.join(right, ["chunk", "ckey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "fp_a", "fp_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
        )
        .filter(F.col("hamming") <= SIMHASH_HAMMING_T)
        .select("doc_a", "doc_b", "hamming")
    )


def _oracle_simhash() -> str:
    chunk_bits = SIMHASH_BITS // SIMHASH_CHUNKS
    mask = (1 << chunk_bits) - 1
    hex_to_int = (
        "list_reduce(list_transform(string_split(substr(md5(x), 1, 15), ''), "
        "c -> strpos('0123456789abcdef', c) - 1), (a, b) -> a * 16 + b)"
    )
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * list_sum(list_transform(hs, h -> (h >> {j}) & 1)) "
        f"> len(hs) THEN {1 << j}::BIGINT ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    chunk_selects = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, fp, {c} AS chunk, (fp >> {c * chunk_bits}) & {mask} AS ckey FROM fps"
        for c in range(SIMHASH_CHUNKS)
    )
    return f"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
hashed AS (SELECT doc_id, list_transform(w, x -> {hex_to_int}) AS hs FROM docs),
fps AS (SELECT doc_id, ({bit_terms}) AS fp FROM hashed),
chunks AS ({chunk_selects}),
cands AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
         l.fp AS fp_a, r.fp AS fp_b
  FROM chunks l JOIN chunks r ON l.chunk = r.chunk AND l.ckey = r.ckey
  WHERE l.doc_id < r.doc_id)
SELECT doc_a, doc_b, bit_count(xor(fp_a, fp_b)) AS hamming
FROM cands
WHERE bit_count(xor(fp_a, fp_b)) <= {SIMHASH_HAMMING_T}
"""


# --------------------------------------------------------------------------
# n-gram Jaccard with length blocking
# --------------------------------------------------------------------------

def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity join, blocked by a character-length
    band (near-dups have near-equal length): candidate pairs come from
    equal or adjacent bands only, keeping the pair space linear-ish in
    practice instead of O(n²).

    The Jaccard runs over *hashed* shingles (md5 → bigint): Catalyst
    pushes the similarity filter into the candidate join's condition, so
    the set intersection is evaluated in the join hot path — intersecting
    long arrays there is ~10× cheaper than 30-char string arrays, same
    result (shingle sets are distinct; a 60-bit collision is negligible
    and the oracle hashes identically anyway)."""
    docs = read_spread(spark, sf_dir, "documents", "doc_id")
    sh = (
        docs.select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    shingles_col(F.col("text")),
                    lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
                )
            ).alias("sh"),
            # floor, not cast: cast-of-double rounds-to-nearest in DuckDB
            # but truncates in Spark — floor on both sides keeps the band
            # assignment identical for n_chars/band fractions >= 0.5
            F.floor(F.col("n_chars") / LENGTH_BAND).cast("long").alias("band"),
        )
        .filter(F.size("sh") > 0)
        .localCheckpoint(eager=True)
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"),
        F.col("band").alias("band_a"),
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"),
        F.col("band").alias("band_b"),
    )
    # the three band offsets are disjoint join conditions → a pair can
    # appear in at most one branch; no distinct needed (and a distinct
    # here would shuffle the shingle arrays themselves)
    pairs = None
    for off in (0, 1, -1):
        p = a.join(b, b.band_b == a.band_a + off).filter(F.col("doc_a") < F.col("doc_b"))
        pairs = p if pairs is None else pairs.unionByName(p)
    return (
        pairs.withColumn("jaccard", F.round(_jaccard(F.col("sh_a"), F.col("sh_b")), 3))
        .filter(F.col("jaccard") >= NGRAM_JACCARD_T)
        .select("doc_a", "doc_b", "jaccard")
    )


def _oracle_ngram() -> str:
    jac = _SQL_JACCARD.format(a="x.sh", b="y.sh")
    hex_to_int = _sql_hex15_to_int()
    return f"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w,
              floor(n_chars / {LENGTH_BAND})::BIGINT AS band FROM documents),
sh AS (SELECT doc_id, band,
       list_distinct(list_transform({_sql_shingles()}, s -> {hex_to_int})) AS sh
       FROM docs),
shn AS (SELECT * FROM sh WHERE len(sh) > 0),
cands AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM shn x JOIN shn y
    ON y.band BETWEEN x.band - 1 AND x.band + 1 AND x.doc_id < y.doc_id)
SELECT doc_a, doc_b, round({jac}, 3) AS jaccard
FROM cands JOIN shn x ON x.doc_id = doc_a JOIN shn y ON y.doc_id = doc_b
WHERE round({jac}, 3) >= {NGRAM_JACCARD_T}
"""


# --------------------------------------------------------------------------
# embedding-cosine near-dup
# --------------------------------------------------------------------------

def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns via higher-order
    functions — stays in Tungsten, no UDF, no Python boundary.

    In pair-join hot paths prefer precomputing ``norm_col`` per ROW before
    the join and using ``dot_col(a, b) / (na * nb)`` — numerically
    identical (same fold, same expression), but the norms are evaluated
    n times instead of n² times."""
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def q_dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold, blocked by the
    cluster label (the pre-assigned coarse partition — the IVF idea:
    high-cosine pairs almost surely share a coarse cluster). Norms are
    computed once per vector before the pair join."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        "label",
    ).withColumn("nv", norm_col(F.col("v")))
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("nv").alias("na"), "label",
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("nv").alias("nb"), "label",
    )
    cosine = dot_col(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(cosine, 4))
        .filter(F.col("cosine") >= COSINE_T)
        .select("vec_a", "vec_b", "cosine")
    )


ORACLE_DEDUP_EMBED = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.v, b.v), 4) AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 4) >= {COSINE_T}
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_embed_cosine": q_dedup_embed_cosine,
}

ORACLES = {
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_minhash_lsh": _oracle_minhash(),
    "dedup_simhash": _oracle_simhash(),
    "dedup_ngram_jaccard": _oracle_ngram(),
    "dedup_embed_cosine": ORACLE_DEDUP_EMBED,
}
