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


def _mean_centroids(
    assigned: DataFrame, by: str, extra: tuple[str, ...] = ()
) -> DataFrame:
    """Per-``(extra..., by)`` element-wise mean vector via posexplode →
    regroup, rounded to 6dp. Returns (extra..., cluster, c). ``extra``
    lets PQ train every subspace's codebook in the same aggregate."""
    return (
        assigned.select(
            *extra,
            F.col(by).alias("cluster"),
            F.posexplode("v").alias("pos", "val"),
        )
        .groupBy(*extra, "cluster", "pos")
        .agg(F.round(F.avg("val"), 6).alias("_mv"))
        .groupBy(*extra, "cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "_mv"))),
                lambda s: s["_mv"],
            ).alias("c")
        )
    )


def _assign(
    emb: DataFrame, cent: DataFrame, extra: tuple[str, ...] = ()
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the centroids (joined on
    the ``extra`` keys when present — each subspace only sees its own
    codebook), argmin of the rounded squared distance, cluster-id
    tie-break."""
    joined = (
        emb.join(F.broadcast(cent), list(extra))
        if extra
        else emb.crossJoin(F.broadcast(cent))
    )
    # argmin as ONE hash aggregate (r12 optimization, guide §2.3/§2.4):
    # min over (d2, cluster, v) structs — comparison short-circuits at
    # the (d2 asc, cluster asc) prefix, exactly the previous window's
    # order ((d2, cluster) is unique per group: cluster ids are unique
    # within a codebook), and v rides along as payload (constant per
    # vec_id, never reached by the comparison). The map-side partial
    # min reduces each task's vec×k candidate rows to one row per vec
    # BEFORE the exchange — the window form shuffled and sorted all
    # vec×k rows every Lloyd iteration.
    return (
        joined.withColumn("d2", _sq_dist(F.col("v"), F.col("c")))
        .groupBy("vec_id", *extra)
        .agg(F.min(F.struct("d2", "cluster", "v")).alias("__m"))
        .select("vec_id", *extra, F.col("__m.v").alias("v"),
                F.col("__m.cluster").alias("cluster"),
                F.col("__m.d2").alias("d2"))
    )


def kmeans(
    emb: DataFrame,
    iterations: int = KMEANS_ITERATIONS,
    extra: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's k-means over (vec_id, v, label) with per-label-mean init.
    Returns (assignments, centroids); assignments carry the rounded
    squared distance to their centroid. With ``extra`` group columns,
    runs one INDEPENDENT k-means per extra-key in the same three
    dataframes per iteration — PQ's M subspaces train in one loop,
    one corpus pass per iteration instead of M."""
    cent = _mean_centroids(emb, "label", extra).localCheckpoint(eager=True)
    assigned = None
    for _ in range(iterations):
        assigned = _assign(emb, cent, extra)
        cent = _mean_centroids(
            assigned, "cluster", extra).localCheckpoint(eager=True)
    # distances in the returned assignment are vs the FINAL centroids
    assigned = _assign(emb, cent, extra)
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


# --------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid, "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011) — the missing member of the ANN
# scale path: IVF (operators/similarity.py) prunes WHICH vectors to
# score; PQ compresses HOW each vector is scored. The 64-dim embedding
# splits into PQ_M=4 16-dim subspaces; each subspace trains its own
# codebook with the SAME deterministic Lloyd recurrence as ml_kmeans
# (per-label-mean init, 2 iterations, 6dp rounding contract), so a
# vector stores as 4 small code ids (64 doubles → 4 bytes at k≤256 —
# the compression that fits a 100 TB corpus's index in RAM).
#
# Query-time ADC (asymmetric distance computation): the query stays
# un-quantized; per subspace a tiny (NQ × k) lookup table of rounded
# subspace distances to each centroid is built once, and every corpus
# vector's approximate distance is the SUM of 4 table lookups — after
# the broadcast LUT joins this is pure codegen map work, no vector
# math per corpus row at all. Plan shape: training = M reuses of the
# kmeans operator; encode = the final Lloyd assignment (no extra
# pass); scoring = M broadcast-hash-join lookups + one
# WindowGroupLimit top-k per query. At 100 TB you train the codebooks
# on a sample and only the encode/score passes see the corpus; the
# operator shape is unchanged.
#
# Determinism: every distance is rounded 6dp before any comparison
# (the ml_kmeans contract), the ADC sum folds 4 rounded doubles
# left-to-right, and ties break on ascending vec_id — the DuckDB
# oracle unrolls the same recurrence per subspace and matches
# bit-for-bit.
# --------------------------------------------------------------------------

PQ_M = 4            # subspaces
PQ_SUBDIM = 16      # QUANT_DIM / PQ_M
PQ_NQ = 4           # ADC query rows (smallest vec_ids — deterministic)
PQ_TOPK = 5         # neighbours returned per query


def _subspace_rows(vcol: Column) -> Column:
    """Explode one 64-dim vector row into PQ_M (m, 16-dim slice)
    struct rows — ONE projection, no union of M scans."""
    return F.explode(
        F.array(*[
            F.struct(
                F.lit(m).alias("m"),
                F.slice(vcol, m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("v"),
            )
            for m in range(PQ_M)
        ])
    )


def pq_train_encode(emb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Train PQ_M per-subspace codebooks and encode every vector as
    PQ_M code ids — all subspaces share ONE fused Lloyd loop (the
    ``extra=("m",)`` kmeans), so each iteration is a single pass over
    the exploded (vec_id, m, slice) rows instead of M separate
    jobs/checkpoints (the first cut ran M independent kmeans calls:
    4× the stages and ~20× the wall for identical values).
    Input (vec_id, v, label); returns (codes, codebook) where codes =
    (vec_id, c0..c{M-1}) (one map-side-combinable pivot aggregate) and
    codebook = (m, cluster, c)."""
    sub = emb.select(
        "vec_id", "label", _subspace_rows(F.col("v")).alias("s")
    ).select("vec_id", "label", F.col("s.m").alias("m"), F.col("s.v").alias("v"))
    assigned, cent = kmeans(sub, extra=("m",))
    codes = assigned.groupBy("vec_id").agg(*[
        F.max(F.when(F.col("m") == m, F.col("cluster"))).alias(f"c{m}")
        for m in range(PQ_M)
    ])
    return codes, cent


def q_ml_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: ADC top-5 neighbours for the 4 smallest vec_ids —
    the full PQ lifecycle (train → encode → LUT → scan) in one row
    set. Output (q_id, rnk, vec_id, d_adc)."""
    emb = read_spread(spark, sf_dir, "embeddings", "vec_id").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    codes, book = pq_train_encode(emb)
    qdf = emb.orderBy("vec_id").limit(PQ_NQ).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    # (NQ × M × k)-row LUT of rounded subspace distances, built in one
    # broadcast join on the subspace key
    lut = (
        qdf.select("q_id", _subspace_rows(F.col("qv")).alias("s"))
        .select("q_id", F.col("s.m").alias("m"), F.col("s.v").alias("qs"))
        .join(F.broadcast(book), "m")
        .select(
            "q_id", "m", "cluster",
            _sq_dist(F.col("qs"), F.col("c")).alias("d"),
        )
    )
    scored = codes
    d_cols = []
    for m in range(PQ_M):
        lut_m = lut.filter(F.col("m") == m).select(
            "q_id",
            F.col("cluster").alias(f"c{m}"),
            F.col("d").alias(f"d{m}"),
        )
        on = [f"c{m}"] if m == 0 else ["q_id", f"c{m}"]
        scored = scored.join(F.broadcast(lut_m), on)
        d_cols.append(f"d{m}")
    acc = F.col(d_cols[0])
    for d in d_cols[1:]:
        acc = acc + F.col(d)
    w = W.partitionBy("q_id").orderBy(
        F.col("d_adc").asc(), F.col("vec_id").asc())
    return (
        scored.withColumn("d_adc", F.round(acc, 6))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= PQ_TOPK)
        .select("q_id", "rnk", "vec_id", "d_adc")
    )


def _oracle_pq(iterations: int = KMEANS_ITERATIONS) -> str:
    """The PQ recurrence unrolled per subspace: each 16-dim slice gets
    the ml_kmeans CTE chain (label-mean init → assign/update ×2 →
    final assign = the code), then per-query LUT cross joins and the
    4-term ADC sum with a row_number top-k."""
    sub = PQ_SUBDIM

    def d2(e: str, c: str) -> str:
        return (
            f"round(list_sum(list_transform(generate_series(1, {sub}), "
            f"i -> ({e}.v[i] - {c}.c[i]) * ({e}.v[i] - {c}.c[i]))), 6)"
        )

    def mean_cte(src: str, key: str) -> str:
        return f"""(
  SELECT {key} AS cluster, array_agg(m ORDER BY pos) AS c FROM (
    SELECT {key}, i AS pos, round(avg(v[i]), 6) AS m
    FROM {src}, generate_series(1, {sub}) AS t(i)
    GROUP BY {key}, i)
  GROUP BY {key})"""

    def assign_cte(src: str, cent: str) -> str:
        return f"""(
  SELECT vec_id, v, cluster FROM (
    SELECT e.vec_id, e.v, c.cluster,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2('e', 'c')} ASC, c.cluster ASC)
             AS rn
    FROM {src} e CROSS JOIN {cent} c)
  WHERE rn = 1)"""

    ctes = ["efull AS (SELECT vec_id, embedding::DOUBLE[] AS v, label "
            "FROM embeddings)"]
    for m in range(PQ_M):
        lo, hi = m * sub + 1, (m + 1) * sub
        ctes.append(
            f"e{m} AS (SELECT vec_id, v[{lo}:{hi}] AS v, label FROM efull)"
        )
        ctes.append(f"cent0_{m} AS {mean_cte(f'e{m}', 'label')}")
        for i in range(1, iterations + 1):
            # every re-assignment reads the slice table (the Spark side
            # assigns from emb each round), only the centroids advance
            ctes.append(
                f"a{i}_{m} AS {assign_cte(f'e{m}', f'cent{i - 1}_{m}')}"
            )
            ctes.append(f"cent{i}_{m} AS {mean_cte(f'a{i}_{m}', 'cluster')}")
        ctes.append(
            f"code{m} AS (SELECT vec_id, cluster AS c{m} FROM "
            f"{assign_cte(f'e{m}', f'cent{iterations}_{m}')} t)"
        )
    joins = " ".join(
        f"JOIN code{m} USING (vec_id)" for m in range(1, PQ_M))
    ctes.append(
        f"codes AS (SELECT code0.vec_id, "
        + ", ".join(f"c{m}" for m in range(PQ_M))
        + f" FROM code0 {joins})"
    )
    ctes.append(
        f"q AS (SELECT vec_id AS q_id, v FROM efull "
        f"ORDER BY vec_id LIMIT {PQ_NQ})"
    )
    for m in range(PQ_M):
        lo, hi = m * sub + 1, (m + 1) * sub
        qd2 = (
            f"round(list_sum(list_transform(generate_series(1, {sub}), "
            f"i -> (q.v[{lo} + i - 1] - c.c[i]) "
            f"* (q.v[{lo} + i - 1] - c.c[i]))), 6)"
        )
        ctes.append(
            f"lut{m} AS (SELECT q.q_id, c.cluster AS c{m}, {qd2} AS d{m} "
            f"FROM q CROSS JOIN cent{iterations}_{m} c)"
        )
    lut_joins = ["JOIN lut0 USING (c0)"] + [
        f"JOIN lut{m} USING (q_id, c{m})" for m in range(1, PQ_M)
    ]
    adc = " + ".join(f"d{m}" for m in range(PQ_M))
    ctes.append(
        "adc AS (SELECT q_id, vec_id, round(" + adc + ", 6) AS d_adc, "
        "row_number() OVER (PARTITION BY q_id ORDER BY round(" + adc
        + ", 6) ASC, vec_id ASC) AS rnk FROM codes "
        + " ".join(lut_joins) + ")"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT q_id, rnk, vec_id, d_adc FROM adc WHERE rnk <= {PQ_TOPK}"
    )


# QUERIES below)
EXTRA_QUERIES: dict = {
    "ml_outliers": q_ml_outliers,
    "ml_rproject": q_ml_rproject,
    "ml_pq_topk": q_ml_pq_topk,
}
EXTRA_ORACLES: dict = {
    "ml_outliers": _oracle_outliers(),
    "ml_rproject": _oracle_rproject(),
    "ml_pq_topk": _oracle_pq(),
}


QUERIES = {
    "ml_kmeans": q_ml_kmeans,
    "ml_quantize": q_ml_quantize,
}

ORACLES = {
    "ml_kmeans": _oracle_kmeans(),
    "ml_quantize": _oracle_quantize(),
}
