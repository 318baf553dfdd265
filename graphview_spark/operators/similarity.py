"""Similarity search over embedding columns (SURVEY.md §7 phase 7).

Two paths, the standard ANN pipeline shape:
  - ``sim_topk_bruteforce`` — exact cosine top-k: the correctness
    baseline. Query set × corpus cross join → per-query window top-k.
    At 100 TB the query side is small (broadcast) and the corpus scan is
    a single map pass + a top-k-per-group aggregate — no corpus shuffle.
  - ``sim_ann_lsh`` — random-hyperplane LSH (sign-bit sketch → bucket
    equi-join): the scale path. Candidates only within equal buckets,
    verified by exact cosine. Hyperplanes are seeded numpy constants
    inlined into BOTH the Spark plan and the DuckDB oracle, so the
    operator stays exactly reproducible.

Everything is higher-order-function column math (zip_with/aggregate) —
JVM-side, no UDFs, no driver loops.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from graphview_spark.operators.dedup import cosine_col, dot_col, norm_col, read_spread
from graphview_spark.session import read_table

TOP_K = 5
N_QUERIES = 20            # vec_id < 20 form the query set
DIM = 64
N_PLANES = 8
ANN_COSINE_T = 0.35
_SEED = 7
# q_sim_topk shared-corpus pin gate: checkpoint bytes ≈ rows × ~600 B
# (64 f64 dims + norm + ids), so 2^22 rows ≈ 2.5 GiB of executor-local
# store — safely bounded on any worker; a 100 TB corpus falls back to
# per-leg pruned parquet scans instead of a corpus-sized checkpoint.
SIM_PIN_ROWS = 1 << 22


def _planes() -> list[list[float]]:
    rng = np.random.RandomState(_SEED)
    return [
        [round(float(x), 6) for x in rng.randn(DIM)] for _ in range(N_PLANES)
    ]


PLANES = _planes()


def _dot_const(v: Column, plane: list[float]) -> Column:
    """dot(v, constant plane) via zip_with against an array literal."""
    arr = F.array(*[F.lit(x) for x in plane])
    return F.aggregate(
        F.zip_with(v, arr, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )


def bucket_col(v: Column) -> Column:
    """LSH bucket id: sign bit per hyperplane packed into an int."""
    out = F.lit(0)
    for i, p in enumerate(PLANES):
        out = out + F.when(_dot_const(v, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out


# --------------------------------------------------------------------------
# brute-force top-k
# --------------------------------------------------------------------------

def _emb_normed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One normalized read of the embeddings corpus: (vec_id, v, nv,
    label). q_sim_topk pins this ONCE and feeds every leg — brute
    corpus, IVF centroids, IVF probe join AND both 20-row query sides —
    so the executed plan scans the corpus a single time (VERDICT r12
    "Next #7") instead of once per consumer, and the per-row norm
    aggregate runs once per vector."""
    return read_spread(spark, sf_dir, "embeddings", "vec_id").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"),
        "label",
    ).withColumn("nv", norm_col(F.col("v")))


def q_sim_topk_bruteforce(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for the query subset. Deterministic
    tie-break: (rounded cosine desc, neighbor id asc). ``emb`` lets
    q_sim_topk share one pinned normalized corpus across its legs."""
    shared = emb is not None
    if not shared:
        emb = _emb_normed(spark, sf_dir)
    if shared:
        # the pinned frame: a 20-row filter over the checkpoint, no
        # extra corpus scan and no repartition exchange
        q = emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
            F.col("nv").alias("nq"),
        )
    else:
        # query side re-reads unspread: it is broadcast anyway, and
        # routing 20 rows through a repartition exchange is a wasted
        # stage
        q = (
            read_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") < N_QUERIES)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").cast("array<double>").alias("qv"),
            )
            .withColumn("nq", norm_col(F.col("qv")))
        )
    # norms are per-row columns on both join inputs — evaluated once per
    # vector (the join boundary stops projection collapse), not per pair
    cosine = dot_col(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))
    pairs = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine, 6))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine", 4).alias("cosine"),
            "rank",
        )
    )


ORACLE_SIM_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
pairs AS (
  SELECT query_id, vec_id,
         round(list_cosine_similarity(qv, v), 6) AS cosine
  FROM q CROSS JOIN e WHERE vec_id <> query_id),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM pairs)
SELECT query_id, vec_id AS neighbor_id, round(cosine, 4) AS cosine, rank
FROM ranked WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# LSH-bucketed ANN
# --------------------------------------------------------------------------

def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate similarity join: pairs sharing an LSH bucket with
    verified cosine ≥ threshold. The bucket equi-join replaces the
    all-pairs cross join — the piece that makes this viable at 100 TB."""
    emb = read_spread(spark, sf_dir, "embeddings", "vec_id").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    from graphview_spark.plans import lazy as _lazy

    # bucket AND norm computed once per vector, materialized by the
    # checkpoint before the pair join (lazy under plan inspection)
    bucketed = _lazy.pin(
        emb.withColumn("bucket", bucket_col(F.col("v")))
        .withColumn("nv", norm_col(F.col("v")))
    )
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("nv").alias("na"), "bucket",
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("nv").alias("nb"), "bucket",
    )
    cosine = dot_col(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(cosine, 4))
        .filter(F.col("cosine") >= ANN_COSINE_T)
        .select("vec_a", "vec_b", "cosine")
    )


def _oracle_ann() -> str:
    plane_lits = ",\n  ".join(
        "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[] AS p{i}".format(i=i)
        for i, p in enumerate(PLANES)
    )
    # DuckDB: bucket = sum of sign bits of list_dot_product(v, plane)
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(v, p{i}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(N_PLANES)
    )
    return f"""
WITH planes AS (SELECT
  {plane_lits}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v, ({bits}) AS bucket FROM e CROSS JOIN planes)
SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
       round(list_cosine_similarity(x.v, y.v), 4) AS cosine
FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
WHERE round(list_cosine_similarity(x.v, y.v), 4) >= {ANN_COSINE_T}
"""


# --------------------------------------------------------------------------
# IVF: coarse-quantized search (label = pre-assigned coarse cluster)
# --------------------------------------------------------------------------

IVF_NPROBE = 2
IVF_K = 3


def q_sim_ivf_topk(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: centroids = per-label mean embedding (rounded to
    6dp so the quantizer is engine-portable); each query probes its
    IVF_NPROBE nearest centroids and ranks only those labels' vectors.
    At scale the inverted lists are label-partitioned parquet — a probe
    reads nprobe/nlist of the corpus instead of all of it. ``emb`` lets
    q_sim_topk share one pinned normalized corpus across its legs."""
    if emb is None:
        emb = _emb_normed(spark, sf_dir)
    # centroid per label: element-wise mean via posexplode → regroup
    cent = (
        emb.select("label", F.posexplode("v").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("val"), 6).alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("c")
        )
        .withColumnRenamed("label", "c_label")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    probe_w = W.partitionBy("query_id").orderBy(
        F.col("c_cos").desc(), F.col("c_label").asc()
    )
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cent))
        .withColumn("c_cos", F.round(cosine_col(F.col("qv"), F.col("c")), 6))
        .withColumn("pr", F.row_number().over(probe_w))
        .filter(F.col("pr") <= IVF_NPROBE)
        .select("query_id", "qv", "nq", F.col("c_label").alias("label"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    pair_cos = dot_col(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))
    return (
        probes.join(emb, "label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(pair_cos, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= IVF_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine", 4).alias("cosine"),
            "rank",
        )
    )


ORACLE_SIM_IVF = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
comp AS (
  SELECT label, i AS pos, round(avg(v[i]), 6) AS m
  FROM e, generate_series(1, {DIM}) AS t(i)
  GROUP BY label, i),
cent AS (
  SELECT label AS c_label, array_agg(m ORDER BY pos) AS c
  FROM comp GROUP BY label),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
probes AS (
  SELECT query_id, qv, c_label AS label FROM (
    SELECT query_id, qv, c_label,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY round(list_cosine_similarity(qv, c), 6) DESC,
                      c_label ASC) AS pr
    FROM q CROSS JOIN cent)
  WHERE pr <= {IVF_NPROBE}),
ranked AS (
  SELECT query_id, vec_id,
         round(list_cosine_similarity(qv, v), 6) AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(list_cosine_similarity(qv, v), 6) DESC,
                                     vec_id ASC) AS rank
  FROM probes JOIN e USING (label)
  WHERE vec_id <> query_id)
SELECT query_id, vec_id AS neighbor_id, round(cosine, 4) AS cosine, rank
FROM ranked WHERE rank <= {IVF_K}
"""


def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force top-k AND IVF coarse-quantized top-k in one
    tagged result — the exact baseline plus the nprobe/nlist scale path
    over the same query set (their agreement rate IS the recall check a
    real ANN deployment monitors)."""
    from graphview_spark.plans import lazy as _lazy

    # ONE corpus scan for the whole dual-method query: the normalized
    # corpus is pinned and every leg — brute pairs, IVF centroid build,
    # IVF probe join, both query sides — reads the checkpoint (VERDICT
    # r12 "Next #7"): executed parquet scans 10 → 1 and the per-row
    # norm fold runs once per vector instead of once per consumer.
    # GATED on corpus size (same measured-size discipline as the
    # bigram broadcast and the embed label-stats routing): a
    # localCheckpoint materializes the corpus WITH its vectors to
    # executor-local storage (~rows × 600 B), which is exactly the
    # unbounded-intermediate pin the r12 bigram un-pin removed — so
    # above SIM_PIN_ROWS each leg scans the (column-pruned,
    # distributed) parquet itself, the shape this query shipped with.
    # The row probe is a parquet-footer count, not a data pass. Under
    # lazy_plans() no job may run; the audit takes the pin branch
    # (pass-through), so the audited plan is the fully expanded
    # worst-case pipeline (PLANS.md sim_topk budget 8).
    if _lazy.is_lazy() or (
        read_table(spark, sf_dir, "embeddings").count() <= SIM_PIN_ROWS
    ):
        emb = _lazy.pin(_emb_normed(spark, sf_dir))
    else:
        emb = None
    brute = q_sim_topk_bruteforce(spark, sf_dir, emb=emb).withColumn(
        "method", F.lit("brute")
    )
    ivf = q_sim_ivf_topk(spark, sf_dir, emb=emb).withColumn(
        "method", F.lit("ivf"))
    return brute.unionByName(ivf)


_ORACLE_SIM_TOPK_BOTH = f"""
SELECT *, 'brute' AS method FROM ({ORACLE_SIM_TOPK})
UNION ALL
SELECT *, 'ivf' AS method FROM ({ORACLE_SIM_IVF})
"""


# --------------------------------------------------------------------------
# k-NN label vote (similarity search applied: the classify/retrieve
# step a curation pipeline runs on top of the ANN index)
# --------------------------------------------------------------------------

def q_ml_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor majority label vote for the query subset:
    exact cosine top-k (same deterministic tie-break as sim_topk), then
    the winning label per query by (votes desc, label asc). The corpus
    is scanned once against a broadcast 20-row query side — identical
    scale posture to the brute top-k it builds on; at 100 TB the only
    change is swapping the exact pairs stage for the IVF/LSH candidate
    stage (same downstream vote)."""
    emb = read_spread(spark, sf_dir, "embeddings", "vec_id").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"),
        "label",
    ).withColumn("nv", norm_col(F.col("v")))
    q = (
        read_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
            F.col("label").alias("true_label"),
        )
        .withColumn("nq", norm_col(F.col("qv")))
    )
    cosine = dot_col(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    topk = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )
    votes = topk.groupBy("query_id", "true_label", "label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    # winning label as ONE hash aggregate (r12, guide §2.4): min over
    # (−n_votes, label) structs is the window's exact (votes desc,
    # label asc) order — (query_id, label) rows are unique post-groupBy
    # so the order is total. true_label is constant per query, so it
    # joins the grouping key; map-side partial min replaces the sort
    # window over the vote table.
    return (
        votes.groupBy("query_id", "true_label")
        .agg(F.min(F.struct((-F.col("n_votes")).alias("__nv"),
                            F.col("label"))).alias("__m"))
        .select(
            "query_id", "true_label",
            F.col("__m.label").alias("predicted_label"),
            (-F.col("__m.__nv")).alias("n_votes"),
        )
    )


ORACLE_ML_KNN = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv, label AS true_label
      FROM e WHERE vec_id < {N_QUERIES}),
ranked AS (
  SELECT query_id, true_label, e.vec_id, e.label,
         row_number() OVER (PARTITION BY query_id
             ORDER BY round(list_cosine_similarity(qv, v), 6) DESC,
                      e.vec_id ASC) AS rank
  FROM q CROSS JOIN e WHERE e.vec_id <> query_id),
votes AS (
  SELECT query_id, true_label, label, count(*) AS n_votes
  FROM ranked WHERE rank <= {TOP_K}
  GROUP BY query_id, true_label, label),
win AS (
  SELECT query_id, true_label, label, n_votes,
         row_number() OVER (PARTITION BY query_id
             ORDER BY n_votes DESC, label ASC) AS vr
  FROM votes)
SELECT query_id, true_label, label AS predicted_label, n_votes
FROM win WHERE vr = 1
"""


QUERIES = {
    "sim_topk": q_sim_topk,
    "sim_ann_lsh": q_sim_ann_lsh,
}

EXTRA_QUERIES: dict = {
    "ml_knn": q_ml_knn,
}
EXTRA_ORACLES: dict = {
    "ml_knn": ORACLE_ML_KNN,
}

ORACLES = {
    "sim_topk": _ORACLE_SIM_TOPK_BOTH,
    "sim_ann_lsh": _oracle_ann(),
}
