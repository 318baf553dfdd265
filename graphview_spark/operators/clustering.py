"""Embedding clustering: Lloyd's k-means as DataFrame iterations.

Completes the IVF story in ``operators/similarity.py`` — IVF *uses*
coarse centroids; this operator *trains* them. Net-new surface (the
reference has no vector operations), same driver-loop design as
``algorithms.py``: a fixed, deterministic iteration count so results
are engine-portable and oracle-checkable by unrolling.

Scale notes: each iteration is (a) a broadcast of k centroids against
the corpus — map-only assignment, no shuffle of the vectors — and
(b) one map-side-combinable groupBy(cluster, dim) mean over exploded
components. The corpus is never shuffled on a pair key; cost per
iteration is O(N·k·DIM) multiply-adds inside codegen plus one small
aggregate — exactly how you'd train a 100 TB quantizer (sample first
if even that is too much; the operator shape is unchanged).

Determinism contract shared with the DuckDB oracle: init centroids =
per-label means rounded to 6dp, squared distances rounded to 6dp
before the argmin (cluster-id ascending tie-break), updated means
rounded to 6dp — identical double arithmetic both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from graphview_spark.operators.dedup import read_spread

KMEANS_ITERATIONS = 2


def _sq_dist(v: Column, c: Column) -> Column:
    """Squared Euclidean distance of two array<double>, rounded to 6dp
    (the cross-engine argmin contract)."""
    return F.round(
        F.aggregate(
            F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
        6,
    )


def _mean_centroids(assigned: DataFrame, by: str) -> DataFrame:
    """Per-``by`` element-wise mean vector via posexplode → regroup,
    rounded to 6dp. Returns (cluster, c)."""
    return (
        assigned.select(F.col(by).alias("cluster"), F.posexplode("v").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.round(F.avg("val"), 6).alias("m"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("c")
        )
    )


def _assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k centroids, argmin of
    the rounded squared distance, cluster-id tie-break."""
    w = W.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cluster").asc())
    return (
        emb.crossJoin(F.broadcast(cent))
        .withColumn("d2", _sq_dist(F.col("v"), F.col("c")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cluster", "d2")
    )


def kmeans(
    emb: DataFrame, iterations: int = KMEANS_ITERATIONS
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's k-means over (vec_id, v, label) with per-label-mean init.
    Returns (assignments, centroids); assignments carry the rounded
    squared distance to their centroid."""
    cent = _mean_centroids(emb, "label").localCheckpoint(eager=True)
    assigned = None
    for _ in range(iterations):
        assigned = _assign(emb, cent)
        cent = _mean_centroids(assigned, "cluster").localCheckpoint(eager=True)
    # distances in the returned assignment are vs the FINAL centroids
    assigned = _assign(emb, cent)
    return assigned, cent


def q_ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: cluster population and inertia (sum of squared
    distance to the final centroid) after 2 deterministic Lloyd
    iterations from the per-label-mean init."""
    emb = read_spread(spark, sf_dir, "embeddings", "vec_id").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    assigned, _ = kmeans(emb)
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.sum("d2"), 3).alias("inertia"),
    )


def _oracle_kmeans(iterations: int = KMEANS_ITERATIONS) -> str:
    """The same recurrence unrolled: cent0 = label means; each round is
    an argmin assignment CTE + a mean-update CTE; final assignment vs
    the last centroids feeds the report."""
    from graphview_spark.operators.similarity import DIM

    d2 = (
        f"round(list_sum(list_transform(generate_series(1, {DIM}), "
        "i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i]))), 6)"
    )

    def mean_cte(src: str, key: str) -> str:
        return f"""(
  SELECT {key} AS cluster, array_agg(m ORDER BY pos) AS c FROM (
    SELECT {key}, i AS pos, round(avg(v[i]), 6) AS m
    FROM {src}, generate_series(1, {DIM}) AS t(i)
    GROUP BY {key}, i)
  GROUP BY {key})"""

    def assign_cte(cent: str) -> str:
        return f"""(
  SELECT vec_id, v, cluster, d2 FROM (
    SELECT e.vec_id, e.v, c.cluster, {d2} AS d2,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2} ASC, c.cluster ASC) AS rn
    FROM e CROSS JOIN {cent} c)
  WHERE rn = 1)"""

    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings)",
        f"cent0 AS {mean_cte('e', 'label')}",
    ]
    for i in range(1, iterations + 1):
        ctes.append(f"a{i} AS {assign_cte(f'cent{i - 1}')}")
        ctes.append(f"cent{i} AS {mean_cte(f'a{i}', 'cluster')}")
    ctes.append(f"afinal AS {assign_cte(f'cent{iterations}')}")
    return (
        "WITH " + ",\n".join(ctes)
        + """
SELECT cluster, count(*) AS n_vecs, round(sum(d2), 3) AS inertia
FROM afinal GROUP BY cluster"""
    )


QUANT_DIM = 64      # embedding dimensionality of the synthetic table
QUANT_LEVELS = 255  # int8 code range


def q_ml_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (per-dimension min/max) int8 quantization of the embedding
    column — the storage-compression pass a 100 TB vector corpus runs
    before indexing (4 bytes → 1 byte per dimension).

    Plan: per-dimension min/max are 2·DIM map-side-combinable aggregates
    (no explode, no shuffle of vectors) broadcast back as array
    literals-via-crossJoin; codes and reconstruction error are per-row
    HOF math. ``floor`` (not round) maps values to codes so there is no
    halfway-rounding hazard against the oracle. Returns per-vector
    (vec_id, mean_code, mean_abs_err)."""
    emb = read_spread(spark, sf_dir, "embeddings", "vec_id").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    stats = emb.agg(
        F.array(
            *[F.min(F.element_at("v", i + 1)) for i in range(QUANT_DIM)]
        ).alias("lo"),
        F.array(
            *[F.max(F.element_at("v", i + 1)) for i in range(QUANT_DIM)]
        ).alias("hi"),
    )
    # code_i = floor((v_i - lo_i) / (hi_i - lo_i) * LEVELS), capped at
    # LEVELS; dequant_i = lo_i + (code_i + 0.5) * (hi_i - lo_i) / (LEVELS+1)
    codes = F.zip_with(
        F.col("v"),
        F.zip_with(
            F.col("lo"), F.col("hi"),
            lambda lo, hi: F.struct(lo.alias("lo"), hi.alias("hi")),
        ),
        lambda x, s: F.least(
            F.lit(QUANT_LEVELS).cast("double"),
            F.floor((x - s["lo"]) / (s["hi"] - s["lo"]) * QUANT_LEVELS).cast(
                "double"
            ),
        ),
    )
    err = F.zip_with(
        F.col("v"),
        F.zip_with(
            F.col("codes"),
            F.zip_with(
                F.col("lo"), F.col("hi"),
                lambda lo, hi: F.struct(lo.alias("lo"), hi.alias("hi")),
            ),
            lambda c, s: s["lo"]
            + (c + 0.5) * (s["hi"] - s["lo"]) / (QUANT_LEVELS + 1),
        ),
        lambda x, d: F.abs(x - d),
    )
    return (
        emb.crossJoin(F.broadcast(stats))
        .withColumn("codes", codes)
        .select(
            "vec_id",
            F.round(
                F.aggregate(
                    "codes", F.lit(0.0), lambda a, c: a + c
                )
                / QUANT_DIM,
                3,
            ).alias("mean_code"),
            F.round(
                F.aggregate(err, F.lit(0.0), lambda a, e: a + e) / QUANT_DIM,
                4,
            ).alias("mean_abs_err"),
        )
    )


def _oracle_quantize() -> str:
    lo = ", ".join(f"min(v[{i + 1}])" for i in range(QUANT_DIM))
    hi = ", ".join(f"max(v[{i + 1}])" for i in range(QUANT_DIM))
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT [{lo}] AS lo, [{hi}] AS hi FROM e),
q AS (SELECT vec_id,
        list_transform(generate_series(1, {QUANT_DIM}), i ->
          least({QUANT_LEVELS}::DOUBLE,
                floor((v[i] - s.lo[i]) / (s.hi[i] - s.lo[i])
                      * {QUANT_LEVELS}))) AS codes,
        v, s.lo AS lo, s.hi AS hi
      FROM e, s)
SELECT vec_id,
       round(list_sum(codes) / {QUANT_DIM}, 3) AS mean_code,
       round(list_sum(list_transform(generate_series(1, {QUANT_DIM}), i ->
         abs(v[i] - (lo[i] + (codes[i] + 0.5) * (hi[i] - lo[i])
                     / {QUANT_LEVELS + 1})))) / {QUANT_DIM}, 4)
         AS mean_abs_err
FROM q
"""


# ml_quantize rotated into the driver gate in round 4 (appended to
OUTLIER_Z = 2.0     # |z| above this → flagged


def q_ml_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outlier detection: distance to the label's
    centroid, z-scored within the label — the vector-space cleaning
    pass that drops mislabeled/corrupt rows before training.

    Plan: the centroid is 64 map-side-combinable ``avg(element_at)``
    aggregates per label (NO posexplode — vectors never inflate 64×
    through a shuffle); centroids broadcast back; distance and z-score
    are per-row fixed-order folds. Centroid components are rounded
    (6dp) BEFORE the distance so both engines fold identical inputs —
    the only cross-engine wobble left is the aggregate sums' addition
    order, ~1e-15 against a 1e-6 rounding grid."""
    emb = read_spread(spark, sf_dir, "embeddings", "vec_id").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    return embedding_outliers(emb, QUANT_DIM)


def embedding_outliers(emb: DataFrame, dim: int) -> DataFrame:
    """Core of :func:`q_ml_outliers` over any (vec_id, label, v) frame."""
    cent = emb.groupBy("label").agg(
        F.array(
            *[
                F.round(F.avg(F.element_at("v", i + 1)), 6)
                for i in range(dim)
            ]
        ).alias("c")
    )
    dist = (
        emb.join(F.broadcast(cent), "label")
        .select(
            "vec_id",
            "label",
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        "v", "c", lambda x, c: (x - c) * (x - c)
                    ),
                    F.lit(0.0),
                    lambda a, e: a + e,
                )
            ).alias("dist"),
        )
    )
    stats = dist.groupBy("label").agg(
        F.avg("dist").alias("mu"),
        F.stddev_samp("dist").alias("sigma"),
    )
    return (
        dist.join(F.broadcast(stats), "label")
        .select(
            "vec_id",
            "label",
            F.round("dist", 6).alias("dist"),
            F.round((F.col("dist") - F.col("mu")) / F.col("sigma"), 4).alias(
                "z"
            ),
        )
        .withColumn(
            # two-sided per the |z| contract; singleton labels (NULL
            # sigma → NULL z) flag false, never NULL
            "is_outlier",
            F.coalesce(F.abs(F.col("z")) > OUTLIER_Z, F.lit(False)),
        )
    )


def _oracle_outliers() -> str:
    sq = " + ".join(
        f"(v[{i + 1}] - c[{i + 1}]) * (v[{i + 1}] - c[{i + 1}])"
        for i in range(QUANT_DIM)
    )
    cent = ", ".join(
        f"round(avg(v[{i + 1}]), 6)" for i in range(QUANT_DIM)
    )
    return f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
cent AS (
  SELECT label, [{cent}] AS c FROM e GROUP BY label
),
dist AS (
  SELECT e.vec_id, e.label, sqrt({sq}) AS dist
  FROM e JOIN cent USING (label)
),
stats AS (
  SELECT label, avg(dist) AS mu, stddev_samp(dist) AS sigma
  FROM dist GROUP BY label
)
SELECT d.vec_id, d.label, round(d.dist, 6) AS dist,
       round((d.dist - s.mu) / s.sigma, 4) AS z,
       coalesce(abs(round((d.dist - s.mu) / s.sigma, 4)) > {OUTLIER_Z},
                false) AS is_outlier
FROM dist d JOIN stats s USING (label)
"""


# --------------------------------------------------------------------------
# Sparse signed random projection (Achlioptas 2003): 64 → 8 dims with a
# seeded {+1, 0, −1} matrix (P = 1/6, 2/3, 1/6). The matrix is derived
# from md5 at import time and inlined as LITERALS in both the Spark
# expression and the oracle SQL — zero per-row hashing, identical
# coefficients by construction. With 2/3 sparsity each output dim is a
# ~21-term signed sum — pure codegen map work, the right preprocessing
# step before LSH/IVF when 100 TB of 1k-dim embeddings won't fit the
# similarity budget. (Unscaled: the sqrt(3) Achlioptas factor is a
# constant that downstream cosine/LSH consumers cancel; documented so
# norms aren't misread as JL-calibrated.)
# --------------------------------------------------------------------------

RPROJECT_IN_DIM = 64
RPROJECT_OUT_DIM = 8


def _rproject_matrix() -> list[list[int]]:
    """Deterministic seeded sign matrix: md5('rp{i}_{k}') mod 6 →
    {0: +1, 5: −1, else 0} (the 1/6, 2/3, 1/6 Achlioptas split)."""
    import hashlib

    signs = []
    for i in range(RPROJECT_IN_DIM):
        row = []
        for k in range(RPROJECT_OUT_DIM):
            h = int(hashlib.md5(f"rp{i}_{k}".encode()).hexdigest(), 16) % 6
            row.append(1 if h == 0 else (-1 if h == 5 else 0))
        signs.append(row)
    return signs


RPROJECT_SIGNS = _rproject_matrix()


def q_ml_rproject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: the 8 projected components per vector, rounded 6dp.
    Sums fold left-to-right in ascending input-dim order on BOTH
    engines (elements cast to double first), so the IEEE result is
    bit-identical before the rounding."""
    emb = read_spread(spark, sf_dir, "embeddings", "vec_id")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    out = [F.col("vec_id")]
    for k in range(RPROJECT_OUT_DIM):
        acc = F.lit(0.0)
        for i in range(RPROJECT_IN_DIM):
            s = RPROJECT_SIGNS[i][k]
            if s == 1:
                acc = acc + F.element_at(v, i + 1)
            elif s == -1:
                acc = acc - F.element_at(v, i + 1)
        out.append(F.round(acc, 6).alias(f"p{k}"))
    return emb.select(*out)


def _oracle_rproject() -> str:
    cols = []
    for k in range(RPROJECT_OUT_DIM):
        terms = ["0.0"]
        for i in range(RPROJECT_IN_DIM):
            s = RPROJECT_SIGNS[i][k]
            if s == 1:
                terms.append(f"+ CAST(embedding[{i + 1}] AS DOUBLE)")
            elif s == -1:
                terms.append(f"- CAST(embedding[{i + 1}] AS DOUBLE)")
        cols.append(f"round({' '.join(terms)}, 6) AS p{k}")
    return "SELECT vec_id, " + ", ".join(cols) + " FROM embeddings"


# QUERIES below)
EXTRA_QUERIES: dict = {
    "ml_outliers": q_ml_outliers,
    "ml_rproject": q_ml_rproject,
}
EXTRA_ORACLES: dict = {
    "ml_outliers": _oracle_outliers(),
    "ml_rproject": _oracle_rproject(),
}


QUERIES = {
    "ml_kmeans": q_ml_kmeans,
    "ml_quantize": q_ml_quantize,
}

ORACLES = {
    "ml_kmeans": _oracle_kmeans(),
    "ml_quantize": _oracle_quantize(),
}
