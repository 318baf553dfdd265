"""Deterministic sampling and dataset-split operators for training-data
pipelines (SURVEY.md §7 phase 7 family): hash-bucketed train/valid/test
assignment, per-stratum subsampling, and weighted source mixing.

Everything here keys on a cryptographic hash of a STABLE id — never
``rand()`` — so assignment is reproducible run-to-run, independent of
partitioning, join order, or cluster size, and a document keeps its
split forever as the corpus grows (the property that matters for
avoiding train/test contamination across dataset versions). All pure
column expressions: map-only, codegen-resident, no shuffle except the
final reporting aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from graphview_spark.session import read_table

# (name, lower bucket bound inclusive, upper bound exclusive) out of 100
SPLITS: list[tuple[str, int, int]] = [
    ("train", 0, 80),
    ("valid", 80, 90),
    ("test", 90, 100),
]

_N_BUCKETS = 100


def hash_bucket(key: Column, n_buckets: int = _N_BUCKETS) -> Column:
    """Deterministic bucket in [0, n_buckets): first 15 hex chars of
    md5(key) as a 60-bit integer, mod n_buckets. Identical arithmetic is
    expressible in DuckDB (and any engine with md5), which is what makes
    the assignment portable across engines — the same doc lands in the
    same split everywhere."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10)
        .cast("long")
        % n_buckets
    )


def _sql_bucket(var: str, n_buckets: int = _N_BUCKETS) -> str:
    """DuckDB mirror of :func:`hash_bucket`."""
    from graphview_spark.operators.dedup import _sql_hex15_to_int

    return f"({_sql_hex15_to_int(f'{var}::VARCHAR')} % {n_buckets})"


def assign_split(df: DataFrame, key_col: str) -> DataFrame:
    """Add ``bucket`` and ``split`` columns keyed on ``key_col``."""
    out = df.withColumn("bucket", hash_bucket(F.col(key_col)))
    expr = F.lit(None).cast("string")
    for name, lo, hi in reversed(SPLITS):
        expr = F.when(
            (F.col("bucket") >= lo) & (F.col("bucket") < hi), name
        ).otherwise(expr)
    return out.withColumn("split", expr)


def stratified_sample(
    df: DataFrame, key_col: str, fractions: dict[str, float], stratum_col: str
) -> DataFrame:
    """Deterministic per-stratum subsample: keep a row iff its hash
    bucket falls below ``fractions[stratum] * 100``. Unlike
    ``DataFrame.sample``, re-running (or re-partitioning) returns the
    SAME rows, and per-stratum rates implement source mixing/reweighting
    without a shuffle."""
    frac = F.lit(None).cast("double")
    for name, f in fractions.items():
        frac = F.when(F.col(stratum_col) == name, F.lit(f)).otherwise(frac)
    bucket = hash_bucket(F.col(key_col))
    return df.filter(bucket < frac * _N_BUCKETS)


def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: stratification report of the 80/10/10 hash split over
    documents — per (source, split): doc count and char volume. The
    per-row assignment is the operator; the groupBy is the verification
    report (map-side combined, one small shuffle)."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        assign_split(docs, "doc_id")
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


def _oracle_sample_split() -> str:
    cases = "\n       ".join(
        f"WHEN bucket >= {lo} AND bucket < {hi} THEN '{name}'"
        for name, lo, hi in SPLITS
    )
    return f"""
WITH b AS (SELECT source, n_chars, {_sql_bucket('doc_id')} AS bucket
           FROM documents)
SELECT source,
       CASE {cases} END AS split,
       count(*) AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars
FROM b
GROUP BY source, split
"""


# --------------------------------------------------------------------------
# deterministic per-group sampling — the distributed stand-in for
# reservoir sampling: rank rows inside each group by a hash of their
# stable id and keep the first k. Same sample every run, every engine,
# any partitioning; one shuffle on the group key. (At extreme scale the
# full sort inside each group can be replaced by a bounded top-k
# aggregate; the rank-window form is exchange-compatible with every
# other per-group operator here.)
# --------------------------------------------------------------------------

GROUP_SAMPLE_K = 5


def sample_per_group(
    df: DataFrame, group_col: str, key_col: str, k: int = GROUP_SAMPLE_K
) -> DataFrame:
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
    )


def q_sample_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return sample_per_group(docs, "source", "doc_id").select(
        "doc_id", "source", "rk"
    )


def _oracle_group_topk() -> str:
    return f"""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
  FROM documents)
SELECT doc_id, source, rk::INT AS rk FROM r WHERE rk <= {GROUP_SAMPLE_K}
"""


# --------------------------------------------------------------------------
# leakage-safe split — hash-split by NEAR-DUP CLUSTER, not by document.
# Splitting near-duplicates across train and test silently inflates
# eval scores (the classic contamination mode dedup papers warn about);
# keying the split hash on the cluster id pins every near-dup family to
# ONE split by construction.
# --------------------------------------------------------------------------

def cluster_safe_split(docs: DataFrame, clusters: DataFrame) -> DataFrame:
    """Per-row split assignment keyed on ``coalesce(cluster_id,
    doc_id)``: documents in the same near-dup cluster share a hash key,
    hence a split — leakage-free by construction, no post-hoc repair
    join. Unclustered docs (the overwhelming majority) hash their own
    id, so the 80/10/10 proportions are preserved. ``clusters`` is any
    (doc_id, cluster_id) frame — dedup_clusters output, or a coarser
    grouping like URL host. Map-only after one left join. The cluster
    table is NOT broadcast-hinted: its size scales with duplicate mass
    (often 30%+ of a web corpus), not a constant, and a forced
    ``F.broadcast`` cannot be overridden by AQE — at 100 TB it would
    OOM executors. AQE still broadcast-converts the join when runtime
    stats show it small; otherwise it is a plain shuffle join on
    doc_id."""
    keyed = docs.join(
        clusters.select("doc_id", "cluster_id"),
        "doc_id", "left",
    ).withColumn(
        "split_key",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")),
    )
    return assign_split(keyed, "split_key")


def q_sample_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: leakage-safe 80/10/10 report — per split: docs,
    near-dup-clustered docs, and char volume. Reuses the T=0.7
    MinHash-LSH cluster assignment (shared signature artifact).
    tests/test_pipeline_ops.py additionally asserts the structural
    guarantee directly: zero verified near-dup pairs straddle splits."""
    from graphview_spark.operators.dedup import (
        MINHASH_JACCARD_T,
        N_BANDS,
        _lsh_verified_pairs,
        dedup_clusters,
    )

    docs = read_table(spark, sf_dir, "documents")
    pairs = _lsh_verified_pairs(spark, sf_dir, N_BANDS, MINHASH_JACCARD_T)
    clusters = dedup_clusters(pairs)
    return (
        cluster_safe_split(docs, clusters)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.col("cluster_id")).alias("n_clustered"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


def _oracle_cluster_split(rounds: int = 6) -> str:
    """Same unrolled propagate+compress component labels as the
    dedup_clusters oracle (near-dup clusters are near-cliques, diameter
    ~2 ≪ 2^6), then the md5 bucket split keyed on the component."""
    from graphview_spark.operators.dedup import (
        MINHASH_JACCARD_T,
        N_BANDS,
        _oracle_lsh_verified,
    )

    pair_sql = _oracle_lsh_verified(N_BANDS, MINHASH_JACCARD_T)
    parts = [
        f"pairs AS MATERIALIZED ({pair_sql})",
        "sym AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM pairs "
        "UNION ALL SELECT doc_b, doc_a FROM pairs)",
        "cnodes AS MATERIALIZED (SELECT DISTINCT a AS id FROM sym)",
        "l0 AS MATERIALIZED (SELECT id, id AS label FROM cnodes)",
    ]
    for i in range(1, rounds + 1):
        prev = f"l{i - 1}"
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT n.id, "
            f"least(n.label, coalesce(min(l.label), n.label)) AS label "
            f"FROM {prev} n LEFT JOIN sym e ON e.b = n.id "
            f"LEFT JOIN {prev} l ON l.id = e.a "
            f"GROUP BY n.id, n.label)"
        )
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT a.id, "
            f"coalesce(b.label, a.label) AS label "
            f"FROM p{i} a LEFT JOIN p{i} b ON b.id = a.label)"
        )
    cases = "\n       ".join(
        f"WHEN bucket >= {lo} AND bucket < {hi} THEN '{name}'"
        for name, lo, hi in SPLITS
    )
    return (
        "WITH " + ",\n".join(parts) + f""",
comp AS (SELECT id AS doc_id, label AS cluster_id FROM l{rounds}),
k AS (SELECT d.doc_id, d.n_chars, c.cluster_id,
             coalesce(c.cluster_id, d.doc_id) AS split_key
      FROM documents d LEFT JOIN comp c USING (doc_id)),
b AS (SELECT *, {_sql_bucket('split_key')} AS bucket FROM k)
SELECT CASE {cases} END AS split,
       count(*) AS n_docs,
       count(cluster_id) AS n_clustered,
       sum(n_chars)::BIGINT AS sum_chars
FROM b GROUP BY split
"""
    )


# --------------------------------------------------------------------------
# weighted sampling — probability-proportional-to-size (PPS) without
# replacement, the primitive behind "sample the corpus but keep the
# long documents": upweighting by size/quality beats uniform sampling
# whenever the downstream cost or value scales with the row (tokens
# contributed, bytes decoded, edges expanded).
#
# Scheme: SEQUENTIAL POISSON SAMPLING (Ohlsson 1998; the order-sampling
# family that also contains Efraimidis–Spirakis A-ES): each row draws a
# deterministic uniform u from md5(key) and takes priority ξ = u / w;
# the k smallest ξ per stratum are the sample. Inclusion probability is
# asymptotically ∝ w (Ohlsson proves the PPS property for u/w order
# sampling). We use ξ = u/w rather than A-ES's u^(1/w) DELIBERATELY:
# one correctly-rounded IEEE division of a ≤2^50 integer is
# bit-identical across engines (the DuckDB oracle reproduces every ξ
# exactly), while pow/log go through libm, whose last-ulp rounding is
# engine-specific — a rank-boundary coin flip the oracle contract
# cannot tolerate.
#
# Scale shape: draw + priority are pure map-side column expressions;
# the per-stratum top-k runs as a rank window that Spark ≥3.5 rewrites
# to WindowGroupLimit — every task keeps only its local top-k before
# the shuffle, so the exchange carries O(k · strata · tasks) rows, not
# the corpus (asserted in tests/test_pipeline_ops.py). Like everything
# in this module the draw is hash-keyed, never rand(): re-runs,
# repartitions, and corpus growth never reshuffle who was sampled.
# --------------------------------------------------------------------------

WEIGHTED_SAMPLE_K = 20     # rows kept per stratum in the gate query
_U_BITS = 50               # uniform draw width: < 2^53, double-exact


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    stratum_col: str,
    k: int = WEIGHTED_SAMPLE_K,
) -> DataFrame:
    """PPS-without-replacement sample of ``k`` rows per stratum:
    priority ξ = (md5-uniform of key) / weight, keep the k smallest.
    Adds ``smp_rank`` (1 = highest priority). Deterministic and
    engine-portable: the uniform is a 50-bit integer (double-exact)
    and ξ is one correctly-rounded division, so any engine with md5
    ranks the identical sample.

    Rows with NULL or non-positive weight are EXCLUDED (ADVICE r10):
    PPS semantics give weight-0 rows inclusion probability 0, but an
    unguarded ξ = u/0 is NULL under Spark's non-ANSI division — and
    Spark orders NULLs FIRST ascending while DuckDB orders them LAST,
    so a zero-weight row would be sampled at rank 1 in Spark (inverted
    PPS) and diverge from any SQL oracle. The filter makes the
    precondition structural instead of hoped-for."""
    from pyspark.sql import Window as W

    df = df.filter(F.col(weight_col).cast("double") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
        .cast("long") % (1 << _U_BITS)
    )
    xi = u.cast("double") / F.col(weight_col).cast("double")
    w = W.partitionBy(stratum_col).orderBy(
        xi.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("smp_rank", F.row_number().over(w))
        .filter(F.col("smp_rank") <= k)
    )


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: 20 docs per language, inclusion probability ∝
    document length (n_chars) — long documents contribute most tokens,
    so a token-budgeted subcorpus wants them overrepresented exactly in
    proportion."""
    docs = read_table(spark, sf_dir, "documents")
    return weighted_sample(docs, "doc_id", "n_chars", "lang").select(
        "lang", "smp_rank", "doc_id", "n_chars"
    )


def _oracle_sample_weighted() -> str:
    from graphview_spark.operators.dedup import _sql_hex15_to_int

    return f"""
WITH pr AS (
  SELECT doc_id, lang, n_chars,
         (({_sql_hex15_to_int('doc_id::VARCHAR')}) % {1 << _U_BITS})::DOUBLE
           / n_chars::DOUBLE AS xi
  FROM documents
  -- mirror of the Spark-side weight guard (ADVICE r11): the operator
  -- structurally excludes NULL/non-positive weights, so the oracle
  -- must too — otherwise a <=0/NULL n_chars doc would fill tail ranks
  -- here while Spark excludes it.
  WHERE n_chars > 0
),
r AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY xi, doc_id) AS smp_rank
  FROM pr
)
SELECT lang, smp_rank::INT AS smp_rank, doc_id, n_chars
FROM r WHERE smp_rank <= {WEIGHTED_SAMPLE_K}
"""


QUERIES = {
    "sample_split": q_sample_split,
}

ORACLES = {
    "sample_split": _oracle_sample_split(),
}

# outside the 50-entry driver gate — oracle-checked via extra_queries()
EXTRA_QUERIES = {
    "sample_group_topk": q_sample_group_topk,
    "sample_cluster_split": q_sample_cluster_split,
    "sample_weighted": q_sample_weighted,
}
EXTRA_ORACLES = {
    "sample_group_topk": _oracle_group_topk(),
    "sample_cluster_split": _oracle_cluster_split(),
    "sample_weighted": _oracle_sample_weighted(),
}
