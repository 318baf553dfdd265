"""Iterative graph algorithms as driver-side DataFrame loops.

The reference has no built-in algorithms; its README claims iterative
computation via T-SQL WHILE loops around MATCH queries (README.md:16,
WSql.cs:405-454 — SURVEY.md §2.6 'Graph algorithms' row). The Spark
equivalent is a Pregel-style loop: per-iteration message aggregation by
join + groupBy, driver-controlled convergence, checkpoints to cut
lineage. ``aggregate_messages`` is the one primitive both algorithms
here build on — the PySpark-idiomatic analog of GraphX
aggregateMessages (GraphX itself is JVM/RDD-only, SURVEY §2.6).

Scale notes: every iteration is one shuffle on node id (the same
partitioning each round — bucketed edge storage makes it co-located);
state per node is O(1); localCheckpoint every iteration keeps plan
depth constant. Convergence tests cost one tiny aggregate per round.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from graphview_spark.plans.lazy import local_ckpt


# loop-checkpoint helpers (used via .transform to keep chain style):
# local_ckpt = localCheckpoint + the stats barrier that stops Catalyst's
# sizeInBytes BigInt from squaring per loop round (see plans/lazy.py)
def _ckpt_eager(df: DataFrame) -> DataFrame:
    return local_ckpt(df, eager=True)


def _ckpt_lazy(df: DataFrame) -> DataFrame:
    return local_ckpt(df, eager=False)


# Below this frame size the iterative loops size their own shuffles
# (see _loop_regime); above it they defer to the session defaults + AQE.
_LOOP_SMALL_ROWS = 50_000_000
_LOOP_ROWS_PER_PARTITION = 100_000
# Delta frames below this row count are broadcast into the closure
# compose joins (a few MB of (src, sink) longs), so the big side never
# shuffles for the join; above it the join falls back to shuffle-hash.
_LOOP_BCAST_ROWS = 1_000_000


@contextmanager
def _loop_regime(spark):
    """Shuffle regime for driver-synchronized iterative loops.

    AQE earns its keep on one-shot analytical plans, but inside a
    tight fixpoint loop it materializes every shuffle stage as its own
    sub-job and re-optimizes between them — measured ~0.5s/round of
    pure scheduling overhead on frames of a few hundred thousand rows,
    which DOMINATES loops whose per-round data cost is tens of ms.
    Inside this context the loop takes over AQE's one useful decision
    (partition-count sizing) itself via ``_loop_partitions``: callers
    know their live frame size each round (the fixpoint probe already
    counts it) and set shuffle partitions proportional to it, exactly
    the coalescing AQE would pick but decided once on the driver for
    free. Frames above _LOOP_SMALL_ROWS keep the session defaults —
    at cluster scale the loop body is data-dominated and AQE's skew
    splitting matters more than its scheduling overhead. Yields a
    ``size(n_rows)`` callable the loop invokes before building each
    round's plan; session config is restored on exit.

    Concurrency contract (ADVICE r6 #1): this mutates SESSION-GLOBAL
    conf, so it assumes a single-threaded driver — the repo's execution
    model throughout (one query at a time per SparkSession; the driver
    gate, bench harness and tests all run queries serially). A
    concurrent query on the same session would inherit the loop regime
    for actions scheduled inside the window. Corollary for loop
    authors: the regime only governs actions EXECUTED inside the
    context — a lazily-checkpointed frame that escapes materializes
    under the restored session conf, so materialize any frame whose
    shuffle shape matters (e.g. the closure handed to the per-app
    cache) with an eager action BEFORE the context exits."""
    conf = spark.conf
    prev_aqe = conf.get("spark.sql.adaptive.enabled")
    prev_parts = conf.get("spark.sql.shuffle.partitions")

    def size(n_rows: int) -> None:
        if n_rows >= _LOOP_SMALL_ROWS:
            conf.set("spark.sql.adaptive.enabled", prev_aqe)
            conf.set("spark.sql.shuffle.partitions", prev_parts)
            return
        # floor of 8: fewer leaves cores idle on the shuffle-heavy
        # rounds (measured ~15% slower at 4 on the sf0.1 closure loop)
        parts = max(8, min(int(prev_parts),
                           n_rows // _LOOP_ROWS_PER_PARTITION + 1))
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", str(parts))

    try:
        yield size
    finally:
        conf.set("spark.sql.adaptive.enabled", prev_aqe)
        conf.set("spark.sql.shuffle.partitions", prev_parts)


def aggregate_messages(
    nodes: DataFrame,
    edges: DataFrame,
    msg_expr,
    agg_expr,
    direction: str = "out",
) -> DataFrame:
    """One Pregel superstep: each edge sends ``msg_expr`` (may reference
    source-node columns and edge columns) to its sink (``direction=
    'out'``) or source ('in'); messages aggregate per receiver with
    ``agg_expr``. Returns (GlobalNodeId, msg)."""
    send_key, recv_key = ("src", "sink") if direction == "out" else ("sink", "src")
    joined = edges.join(
        nodes, edges[send_key] == nodes["GlobalNodeId"], "inner"
    )
    return (
        joined.select(F.col(recv_key).alias("__recv"), msg_expr.alias("__msg"))
        .groupBy("__recv")
        .agg(agg_expr(F.col("__msg")).alias("msg"))
        .withColumnRenamed("__recv", "GlobalNodeId")
    )


# Per-iteration score snap for the float-sum algorithms (pagerank/HITS/
# PPR): parallel SUM over doubles adds in partition order, so reruns can
# differ in the last ~2 ulps (~1e-15 relative). Snapping each round's
# scores to a 1e-12 grid — on BOTH engines, at the SAME points of the
# recurrence — absorbs that jitter before it compounds across rounds,
# while staying 10⁴× finer than the 8-decimal final output. The same
# discipline as the fixed-order folds in search.py/clustering.py, for
# loops where a fold can't fix the order (distributed aggregation).
SCORE_GRID = 12


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    grid: int | None = SCORE_GRID,
) -> DataFrame:
    """PageRank over (GlobalNodeId) nodes and (src, sink) edges; fixed
    iteration count → deterministic. Dangling mass is redistributed
    uniformly (the standard formulation). ``grid`` snaps each round's
    ranks to that many decimals (see SCORE_GRID; None disables).

    Fixed iterations + no driver-side probe → the per-round checkpoints
    are LAZY (shallow plans via LogicalRDD, but nothing materializes
    until the caller's one action walks the chain — zero Python driver
    syncs in the loop; same pattern as hits())."""
    n = nodes.count()
    ranks = nodes.select("GlobalNodeId").withColumn("rank", F.lit(1.0 / n))
    # scanned every round — materialize the edge lineage once
    edges = edges.select("src", "sink").transform(_ckpt_lazy)
    degrees = (
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
        # consumed by TWO joins per round — materialize once up front
        .transform(_ckpt_lazy)
    )

    for _ in range(iterations):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["GlobalNodeId"])
            .join(degrees, "src")
            .select(
                F.col("sink").alias("GlobalNodeId"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("GlobalNodeId")
            .agg(F.sum("c").alias("received"))
        )
        # dangling mass as a broadcast 1-row aggregate inside the SAME job
        # as the rank update — no .first() driver sync per iteration (the
        # checkpoint materialization is the only action per round)
        dangling = (
            ranks.join(degrees, ranks["GlobalNodeId"] == degrees["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
        )
        new_rank = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping)
            * (
                F.col("_dang") / F.lit(float(n))
                + F.coalesce(F.col("received"), F.lit(0.0))
            )
        )
        if grid is not None:
            new_rank = F.round(new_rank, grid)
        ranks = (
            nodes.select("GlobalNodeId")
            .join(contribs, "GlobalNodeId", "left")
            .join(F.broadcast(dangling))
            .select("GlobalNodeId", new_rank.alias("rank"))
            .transform(_ckpt_lazy)
        )
    return ranks


def shortest_paths(
    sources: DataFrame, edges: DataFrame, max_iterations: int = 60
) -> DataFrame:
    """Unweighted single/multi-source shortest paths (BFS) — min hop
    distance from any node in ``sources`` following edge direction.
    Returns (GlobalNodeId, dist) for reachable nodes only.

    Frontier formulation: each round joins only the nodes SETTLED LAST
    ROUND against the edge list, so total work is O(sum of frontier
    degrees) = O(E) across the whole run — not O(E) per round like a
    dense Bellman-Ford sweep. Each round is one shuffle on node id;
    localCheckpoint caps lineage; the settled set grows monotonically so
    the anti-join is the BFS visited check."""
    dist = sources.select(
        "GlobalNodeId", F.lit(0).cast("long").alias("dist")
    ).transform(_ckpt_eager)
    frontier = dist
    for _ in range(max_iterations):
        nxt = (
            frontier.join(edges, frontier["GlobalNodeId"] == edges["src"])
            .select(
                F.col("sink").alias("GlobalNodeId"),
                (F.col("dist") + 1).alias("dist"),
            )
            .groupBy("GlobalNodeId")
            .agg(F.min("dist").alias("dist"))
            .join(dist, "GlobalNodeId", "left_anti")
            .transform(_ckpt_eager)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).transform(_ckpt_eager)
        frontier = nxt
    return dist


def triangle_count(pairs: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Global triangle count over an undirected simple graph given as
    canonically oriented (a < b) edge pairs. Pure declarative two-path
    join + closing-edge join — no iteration, no Python:
    triangle {x<y<z} is counted exactly once as (x,y)+(y,z) closed by
    (x,z). Returns one row (n_nodes, n_edges, n_triangles).

    Scale: the orientation bounds join fan-out by min-degree endpoints
    (the standard compact-forward optimization); at 100 TB the two
    equi-joins shuffle on node id and AQE handles skewed hubs."""
    e = (
        pairs.select(F.col(a).alias("a"), F.col(b).alias("b"))
        .distinct()
        .transform(_ckpt_eager)
    )
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.b") == F.col("bc.a"))
        .join(
            ac,
            (F.col("ac.a") == F.col("ab.a")) & (F.col("ac.b") == F.col("bc.b")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nodes = (
        e.select(F.col("a").alias("id"))
        .union(e.select("b"))
        .agg(F.countDistinct("id").alias("n_nodes"))
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return nodes.crossJoin(n_edges).crossJoin(tri)


def k_core(
    pairs: DataFrame, k: int, a: str = "a", b: str = "b"
) -> DataFrame:
    """The k-core of an undirected simple graph (canonical a<b pairs):
    iteratively peel nodes of degree < k until fixpoint. Returns the
    surviving nodes with their in-core degree ``(node, core_degree)``.

    Driver loop like the other algorithms here: each round is one
    degree aggregate + two anti-joins on node id (same partitioning
    every round; checkpointed so lineage stays O(1)). Rounds are
    bounded by the peeling depth — in practice a handful; each round
    strictly shrinks the node set, so termination is guaranteed."""
    und = (
        pairs.select(F.col(a).alias("s"), F.col(b).alias("t"))
        .union(pairs.select(F.col(b).alias("s"), F.col(a).alias("t")))
        .distinct()
        .transform(_ckpt_eager)
    )
    cur = und
    while True:
        deg = cur.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
        low = deg.filter(F.col("d") < k).select("s").transform(_ckpt_eager)
        if low.isEmpty():
            break
        cur = (
            cur.join(low, "s", "left_anti")
            .join(low.withColumnRenamed("s", "t"), "t", "left_anti")
            .select("s", "t")
            .transform(_ckpt_eager)
        )
    return (
        cur.groupBy("s")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .withColumnRenamed("s", "node")
    )


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    scale: float | None = None,
    grid: int | None = None,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg), exact-arithmetic
    formulation. HITS is scale-invariant — normalizing every half-step
    only controls magnitude, the final ranking vector is identical —
    so the loop carries UN-normalized scores divided by ``scale`` (an
    exact power of two ≥ |E|, derived from the edge count when not
    given) and L1-normalizes ONCE after the last round. Dividing a
    double by a power of two is lossless, so every in-loop value is a
    dyadic rational (integer × 2⁻ᵏ) and every sum is EXACT while the
    integer magnitudes stay under 2⁵³ — partition-order independent
    with no grid snap at all, a stronger determinism guarantee than the
    SCORE_GRID discipline pagerank/PPR need for their non-dyadic
    damping constants. The power-of-two divisor keeps magnitudes from
    compounding: each half-step multiplies by at most the max degree
    and divides by scale ≥ |E| ≥ max degree.

    Plan shape (the VERDICT-r6 creep fix): ONE join+aggregate shuffle
    per half-step and nothing else — no per-round normalization joins,
    no 1-row broadcast-exchange jobs, no full-node-frame join (zero-
    score nodes contribute zero to every sum; the full frame is
    assembled once at the end). All checkpoints lazy; the caller's
    single action materializes the whole 2×iterations-stage chain.
    Fixed iteration count → deterministic and oracle-checkable as
    unrolled CTEs.

    Exactness bound: the dyadic numerators are path counts, so the
    no-snap guarantee holds while the number of ≤2·iterations-edge
    paths into any node stays under 2⁵³ — every sparse/moderate graph,
    but a very dense graph (avg degree ≳ 40 at 5 iterations) can
    exceed the double mantissa, where sums regress to partition-order
    float addition. For that regime pass ``grid`` (e.g. SCORE_GRID) to
    snap each half-step's scores — the pre-round-7 discipline: drift
    is absorbed per round before it compounds, at the cost of the
    bit-exactness the default mode has."""
    if iterations < 1:
        raise ValueError("hits needs at least one iteration")
    import math

    from graphview_spark.plans import lazy as _lazy

    # 2 scans per round × iterations — materialize the edge lineage
    # once (pin: pass-through under the lazy plan audit, so auditing
    # graph_hits neither runs a job nor truncates the audited plan)
    edges = _lazy.pin(edges.select("src", "sink"))
    if scale is None:
        n_e = edges.count()
        scale = math.ldexp(1.0, max(n_e - 1, 1).bit_length())
    inv = 1.0 / scale  # exact: scale is a power of two

    def _step(c):
        return F.round(c, grid) if grid is not None else c
    # non-zero support frames: (GlobalNodeId, score). hub starts at 1.0
    # on every node with an outgoing edge — nodes without one have hub
    # multiplied into nothing, and their own hub is re-derived from
    # auth flows anyway, so the initial support can be edge sources.
    hub = (
        edges.select(F.col("src").alias("GlobalNodeId")).distinct()
        .select("GlobalNodeId", F.lit(1.0).alias("score"))
        .transform(_ckpt_lazy)
    )
    auth = None
    for _ in range(iterations):
        auth = (
            edges.join(hub, edges["src"] == hub["GlobalNodeId"])
            .groupBy(F.col("sink").alias("GlobalNodeId"))
            .agg(_step(F.sum("score") * inv).alias("score"))
            .transform(_ckpt_lazy)
        )
        hub = (
            edges.join(auth, edges["sink"] == auth["GlobalNodeId"])
            .groupBy(F.col("src").alias("GlobalNodeId"))
            .agg(_step(F.sum("score") * inv).alias("score"))
            .transform(_ckpt_lazy)
        )
    # single L1 normalization + full-node assembly, once: nodes outside
    # a support set have exactly 0.0 (they received no mass). The two
    # totals are sums of same-scale dyadic rationals — exact, so the
    # output quotients are deterministic IEEE divisions.
    a_tot = auth.agg(F.sum("score").alias("_at"))
    h_tot = hub.agg(F.sum("score").alias("_ht"))
    return (
        nodes.select("GlobalNodeId")
        .join(hub.withColumnRenamed("score", "hub"), "GlobalNodeId", "left")
        .join(auth.withColumnRenamed("score", "auth"), "GlobalNodeId", "left")
        .join(F.broadcast(a_tot))
        .join(F.broadcast(h_tot))
        .select(
            "GlobalNodeId",
            F.coalesce(F.col("hub") / F.col("_ht"), F.lit(0.0)).alias("hub"),
            F.coalesce(F.col("auth") / F.col("_at"), F.lit(0.0)).alias("auth"),
        )
    )


def personalized_pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    sources: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    grid: int | None = SCORE_GRID,
) -> DataFrame:
    """Personalized PageRank: teleport mass returns to the ``sources``
    set (uniformly) instead of to all nodes — the standard seeded
    relevance ranking. Same loop shape as :func:`pagerank` (one shuffle
    per round on node id, dangling mass redistributed to the teleport
    vector, per-round SCORE_GRID snap, LAZY per-round checkpoints —
    shallow plans, one materializing action at the caller)."""
    n_src = sources.count()
    if n_src == 0:
        raise ValueError(
            "personalized_pagerank: empty teleport set — the sources "
            "DataFrame matched no rows"
        )
    pref = nodes.select("GlobalNodeId").join(
        sources.select("GlobalNodeId").withColumn("_p", F.lit(1.0 / n_src)),
        "GlobalNodeId",
        "left",
    ).select(
        "GlobalNodeId", F.coalesce(F.col("_p"), F.lit(0.0)).alias("p")
    ).transform(_ckpt_eager)
    ranks = pref.select("GlobalNodeId", F.col("p").alias("rank"))
    edges = edges.select("src", "sink").transform(_ckpt_lazy)
    degrees = (
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
        .transform(_ckpt_lazy)
    )

    for _ in range(iterations):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["GlobalNodeId"])
            .join(degrees, "src")
            .select(
                F.col("sink").alias("GlobalNodeId"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("GlobalNodeId")
            .agg(F.sum("c").alias("received"))
        )
        dangling = (
            ranks.join(degrees, ranks["GlobalNodeId"] == degrees["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
        )
        new_rank = (
            F.lit(1.0 - damping) * F.col("p")
            + F.lit(damping)
            * (
                F.col("_dang") * F.col("p")
                + F.coalesce(F.col("received"), F.lit(0.0))
            )
        )
        if grid is not None:
            new_rank = F.round(new_rank, grid)
        ranks = (
            pref.join(contribs, "GlobalNodeId", "left")
            .join(F.broadcast(dangling))
            .select("GlobalNodeId", new_rank.alias("rank"))
            .transform(_ckpt_lazy)
        )
    return ranks


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """Label propagation to a fixpoint: every node adopts the minimum
    component id among itself and its neighbors (edges treated as
    undirected). Returns (GlobalNodeId, component)."""
    labels = nodes.select(
        "GlobalNodeId", F.col("GlobalNodeId").alias("component")
    ).transform(_ckpt_eager)
    sym = edges.select("src", "sink").union(
        edges.select(F.col("sink").alias("src"), F.col("src").alias("sink"))
    ).transform(_ckpt_eager)

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["src"] == labels["GlobalNodeId"])
            .select(F.col("sink").alias("GlobalNodeId"), "component")
            .groupBy("GlobalNodeId")
            .agg(F.min("component").alias("nbr_min"))
        )
        # carry a per-row changed flag through the checkpoint: the
        # convergence test becomes one cheap aggregate over materialized
        # rows instead of a second join+filter recompute per round
        updated = labels.join(neighbor_min, "GlobalNodeId", "left").select(
            "GlobalNodeId",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
            ).alias("component"),
            (F.col("nbr_min") < F.col("component")).cast("int").alias("_chg"),
        )
        # pointer-jumping compression: follow each label to ITS label
        # (component ← component's component). Plain propagation needs
        # O(graph diameter) rounds — a depth-d path/tree walks one hop
        # per round; with compression label chains halve every round, so
        # convergence is O(log diameter). One extra self-join on the
        # same id partitioning per round buys a ~5× round reduction on
        # tree-shaped graphs.
        ptr = updated.select(
            F.col("GlobalNodeId").alias("__lbl"),
            F.col("component").alias("__lbl_comp"),
        )
        compressed = F.coalesce(F.col("__lbl_comp"), F.col("component"))
        updated = (
            updated.join(ptr, updated["component"] == ptr["__lbl"], "left")
            .select(
                "GlobalNodeId",
                compressed.alias("component"),
                # a compression-only improvement must also count as
                # "changed" or the loop could stop one round early
                F.greatest(
                    F.col("_chg"),
                    (compressed < F.col("component")).cast("int"),
                ).alias("_chg"),
            )
            .transform(_ckpt_eager)
        )
        changed = updated.agg(F.coalesce(F.max("_chg"), F.lit(0))).first()[0]
        labels = updated.drop("_chg")
        if changed == 0:
            break
    return labels


# --------------------------------------------------------------------------
# correctness-gate entries. Iterative fixpoints ARE oracle-expressible when
# the iteration count is fixed: PageRank unrolls its 5 rounds into chained
# CTEs; components is a min-label fixpoint via DuckDB's recursive CTE.
# Exact small-fixture values are additionally asserted in
# tests/test_algorithms.py.
# --------------------------------------------------------------------------

def q_graph_pagerank(spark, sf_dir: str) -> DataFrame:
    """PageRank over the Refers tree (driver-loop iterative algorithm —
    SURVEY §2.6 'Graph algorithms' row; deliberately no oracle_sql:
    iterative fixpoints are not expressible in one SQL statement)."""
    from graphview_spark.graph_queries import tpch_graph

    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes["Customer"]
    edges = g.edge_with_id("Customer.Refers")
    pr = pagerank(nodes, edges, iterations=5)
    return (
        pr.join(nodes, "GlobalNodeId")
        .select("c_custkey", F.round("rank", 8).alias("rank"))
    )


def q_graph_components(spark, sf_dir: str) -> DataFrame:
    from graphview_spark.graph_queries import tpch_graph

    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes["Customer"]
    edges = g.edge_with_id("Customer.Refers")
    cc = connected_components(nodes, edges)
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(F.count(F.lit(1)).alias("n_components"),
                F.max("n_nodes").alias("largest"))
    )


def q_graph_shortest_paths(spark, sf_dir: str) -> DataFrame:
    """BFS hop distance from the root customer (c_custkey=1) over the
    Refers edges — frontier loop, oracle = recursive CTE closure."""
    from graphview_spark.graph_queries import tpch_graph

    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes["Customer"]
    edges = g.edge_with_id("Customer.Refers")
    src = nodes.filter(F.col("c_custkey") == 1).select("GlobalNodeId")
    sp = shortest_paths(src, edges)
    return sp.join(nodes, "GlobalNodeId").select("c_custkey", "dist")


def q_graph_triangles(spark, sf_dir: str) -> DataFrame:
    """Triangle count over the MinHash near-duplicate pair graph (docs as
    nodes, verified pairs at T=0.7 as undirected edges) — composes the
    dedup LSH operator with the declarative triangle join."""
    from graphview_spark.operators.dedup import (
        MINHASH_JACCARD_T,
        N_BANDS,
        _lsh_verified_pairs,
    )

    pairs = _lsh_verified_pairs(spark, sf_dir, N_BANDS, MINHASH_JACCARD_T)
    return triangle_count(pairs, "doc_a", "doc_b")


def _oracle_shortest_paths() -> str:
    """Min-hop BFS as a recursive closure; UNION dedups exact (id, d)
    pairs and depth is bounded by the tree height, so it terminates."""
    from graphview_spark.graph_queries import _ORACLE_REFERS

    return f"""
WITH RECURSIVE refers AS ({_ORACLE_REFERS}),
walk(id, d) AS (
  SELECT c_custkey, 0::BIGINT FROM customer WHERE c_custkey = 1
  UNION
  SELECT e.sink, w.d + 1 FROM walk w JOIN refers e ON e.src = w.id
)
SELECT id AS c_custkey, min(d) AS dist FROM walk GROUP BY id
"""


def _oracle_triangles() -> str:
    from graphview_spark.operators.dedup import (
        MINHASH_JACCARD_T,
        N_BANDS,
        _oracle_lsh_verified,
    )

    pair_sql = _oracle_lsh_verified(N_BANDS, MINHASH_JACCARD_T)
    return f"""
WITH pairs AS ({pair_sql}),
e AS (SELECT DISTINCT doc_a AS a, doc_b AS b FROM pairs)
SELECT
  (SELECT count(DISTINCT id)
   FROM (SELECT a AS id FROM e UNION ALL SELECT b FROM e)) AS n_nodes,
  (SELECT count(*) FROM e) AS n_edges,
  (SELECT count(*)
   FROM e ab JOIN e bc ON ab.b = bc.a
   JOIN e ac ON ac.a = ab.a AND ac.b = bc.b) AS n_triangles
"""


def _oracle_pagerank(iterations: int = 5, damping: float = 0.85) -> str:
    """Fixed-iteration PageRank as plain SQL: each round is one chained CTE
    (r1..rN), so DuckDB evaluates exactly the same recurrence the Spark
    loop does — same dangling-mass redistribution, same double arithmetic."""
    from graphview_spark.graph_queries import _ORACLE_REFERS

    def step(prev: str) -> str:
        return f"""
  SELECT nd.id AS id,
         round({1.0 - damping} / nn.N
         + {damping} * (dang.s / nn.N + coalesce(ct.contrib, 0)),
         {SCORE_GRID}) AS rank
  FROM (SELECT c_custkey AS id FROM customer) nd
  CROSS JOIN nn
  CROSS JOIN (SELECT coalesce(sum(p.rank), 0) AS s
              FROM {prev} p LEFT JOIN deg ON deg.src = p.id
              WHERE deg.src IS NULL) dang
  LEFT JOIN (SELECT e.sink AS id, sum(p.rank / deg.d) AS contrib
             FROM {prev} p
             JOIN deg ON deg.src = p.id
             JOIN refers e ON e.src = p.id
             GROUP BY e.sink) ct ON ct.id = nd.id"""

    ctes = [
        f"refers AS ({_ORACLE_REFERS})",
        "nn AS (SELECT count(*)::DOUBLE AS N FROM customer)",
        "deg AS (SELECT src, count(*) AS d FROM refers GROUP BY src)",
        "r0 AS (SELECT c_custkey AS id, 1.0 / (SELECT N FROM nn) AS rank "
        "FROM customer)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(f"r{i} AS ({step(f'r{i - 1}')})")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id AS c_custkey, round(rank, 8) AS rank FROM r{iterations}"
    )


def _oracle_components(rounds: int = 10) -> str:
    """Min-label connected components as UNROLLED propagate+compress
    rounds (each O(E)): l_{k+1}(v) = min(l_k(v), min over neighbors
    l_k(u)), then one compression hop l ← l(l). Label chains halve every
    round, so ``rounds`` rounds reach the fixpoint for any component of
    diameter ≤ 2^rounds — the synthetic Refers tree's undirected
    diameter is ~2·log₂(N) (≈34 at sf1), far under 2¹⁰. Replaces the
    earlier recursive reach closure, which was quadratic in component
    size (535 s at sf0.1 vs seconds for this form)."""
    from graphview_spark.graph_queries import _ORACLE_REFERS

    parts = [
        f"refers AS ({_ORACLE_REFERS})",
        "sym AS (SELECT src, sink FROM refers "
        "UNION ALL SELECT sink, src FROM refers)",
        "l0 AS (SELECT c_custkey AS id, c_custkey AS label FROM customer)",
    ]
    for i in range(1, rounds + 1):
        prev = f"l{i - 1}"
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT n.id, "
            f"least(n.label, coalesce(min(l.label), n.label)) AS label "
            f"FROM {prev} n LEFT JOIN sym e ON e.sink = n.id "
            f"LEFT JOIN {prev} l ON l.id = e.src "
            f"GROUP BY n.id, n.label)"
        )
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT a.id, coalesce(b.label, a.label) AS label "
            f"FROM p{i} a LEFT JOIN p{i} b ON b.id = a.label)"
        )
    return (
        "WITH " + ",\n".join(parts) + f""",
comp AS (SELECT id, label AS component FROM l{rounds}),
sizes AS (SELECT component, count(*) AS n_nodes FROM comp GROUP BY component)
SELECT count(*) AS n_components, max(n_nodes) AS largest FROM sizes
"""
    )


def bellman_ford(
    source: DataFrame, edges: DataFrame, iterations: int
) -> DataFrame:
    """Fixed-round Bellman-Ford: dist_{k+1}(v) = min(dist_k(v),
    min over in-edges (dist_k(u) + w)). ``source`` is (id) rows at
    distance 0; ``edges`` is (src, sink, w). A fixed iteration count
    makes the result deterministic and oracle-expressible as unrolled
    CTEs; k rounds give exact distances for all shortest paths of ≤ k
    edges (run diameter-many rounds for the full fixpoint). One
    join+groupBy shuffle per round on the stable node-id key, with
    LAZY checkpoints (shallow plans, one materializing action at the
    caller — same posture as pagerank above)."""
    dist = source.select("id", F.lit(0).cast("long").alias("dist"))
    edges = edges.select("src", "sink", "w").transform(_ckpt_lazy)
    for _ in range(iterations):
        relaxed = (
            edges.join(dist, edges["src"] == dist["id"])
            .select(F.col("sink").alias("id"), (F.col("dist") + F.col("w")).alias("dist"))
            .unionByName(dist)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .transform(_ckpt_lazy)
        )
        dist = relaxed
    return dist


def q_graph_weighted_paths(spark, sf_dir: str) -> DataFrame:
    """Weighted shortest distances from customer 1 over Refers edges,
    edge weight derived deterministically from the sink key (the synth
    edges carry no attributes): w = sink % 7 + 1. 8 Bellman-Ford rounds
    in the c_custkey domain (oracle = 8 unrolled relax CTEs)."""
    from graphview_spark.graph_queries import tpch_graph

    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes["Customer"]
    key = nodes.select("GlobalNodeId", "c_custkey")
    edges = (
        g.edge_with_id("Customer.Refers")
        .join(key.select(F.col("GlobalNodeId").alias("src"),
                         F.col("c_custkey").alias("src_key")), "src")
        .join(key.select(F.col("GlobalNodeId").alias("sink"),
                         F.col("c_custkey").alias("sink_key")), "sink")
        .select(
            F.col("src_key").alias("src"),
            F.col("sink_key").alias("sink"),
            (F.col("sink_key") % 7 + 1).cast("long").alias("w"),
        )
    )
    src = nodes.filter(F.col("c_custkey") == 1).select(
        F.col("c_custkey").alias("id")
    )
    return bellman_ford(src, edges, iterations=8).select(
        F.col("id").alias("c_custkey"), "dist"
    )


def _oracle_weighted_paths(iterations: int = 8) -> str:
    from graphview_spark.graph_queries import _ORACLE_REFERS

    parts = [
        f"refers AS ({_ORACLE_REFERS})",
        "e AS (SELECT src, sink, sink % 7 + 1 AS w FROM refers)",
        "d0 AS (SELECT 1::BIGINT AS id, 0::BIGINT AS dist)",
    ]
    for i in range(1, iterations + 1):
        prev = f"d{i - 1}"
        parts.append(
            f"d{i} AS (SELECT id, min(dist) AS dist FROM ("
            f"SELECT e.sink AS id, d.dist + e.w AS dist "
            f"FROM e JOIN {prev} d ON e.src = d.id "
            f"UNION ALL SELECT id, dist FROM {prev}) GROUP BY id)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id AS c_custkey, dist FROM d{iterations}"
    )


def label_propagation(
    nodes: DataFrame, edges: DataFrame, iterations: int = 3
) -> DataFrame:
    """Synchronous label propagation (community detection): every node
    adopts the most frequent label among its neighbors each round, ties
    broken by the smallest label — fully deterministic, so a fixed
    iteration count is oracle-expressible as unrolled CTEs. ``nodes`` is
    (id), ``edges`` (src, sink) in the same id domain; edges are treated
    undirected. Returns (id, label).

    Scale: one shuffle per round (neighbor-label count groupBy + the
    argmax window share the receiver-id partitioning), per-node state is
    one label, and localCheckpoint keeps plan depth constant — the same
    posture as pagerank/components above."""
    from pyspark.sql import Window as W

    # fixed iterations, no driver probe → LAZY checkpoints throughout:
    # shallow per-round plans, one materializing action at the caller
    # (same pattern as pagerank/hits)
    sym = (
        edges.select("src", "sink")
        .union(edges.select(F.col("sink").alias("src"), F.col("src").alias("sink")))
        .transform(_ckpt_lazy)
    )
    labels = nodes.select("id", F.col("id").alias("label")).transform(
        _ckpt_lazy
    )
    for _ in range(iterations):
        counts = (
            sym.join(labels, sym["src"] == labels["id"])
            .groupBy(F.col("sink").alias("__id"), "label")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        # argmax as ONE hash aggregate: min over (−count, label) structs
        # picks the most frequent label with smallest-label tie-break —
        # the identical total order the previous row_number window used
        # (r12 optimization, guide §2.3/§2.4: map-side partial min over
        # narrow structs replaces a sort-based window whose partition
        # key differed from the count's grouping key, dropping the
        # per-round sort and shuffling integer pairs instead of ranked
        # rows; counts are ≥ 1 so the negation cannot overflow)
        pick = (
            counts.groupBy("__id")
            .agg(F.min(F.struct((-F.col("__c")).alias("__nc"),
                                F.col("label"))).alias("__m"))
            .select("__id", F.col("__m.label").alias("__new"))
        )
        labels = (
            labels.join(pick, labels["id"] == pick["__id"], "left")
            .select(
                "id",
                F.coalesce(F.col("__new"), F.col("label")).alias("label"),
            )
            .transform(_ckpt_lazy)
        )
    return labels


def q_graph_communities(spark, sf_dir: str) -> DataFrame:
    """LPA communities over the Refers edges in the c_custkey domain (so
    labels are oracle-comparable — GlobalNodeIds are engine-internal)."""
    from graphview_spark.graph_queries import tpch_graph

    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes["Customer"]
    key = nodes.select("GlobalNodeId", "c_custkey")
    edges = (
        g.edge_with_id("Customer.Refers")
        .join(key.select(F.col("GlobalNodeId").alias("src"),
                         F.col("c_custkey").alias("src_key")), "src")
        .join(key.select(F.col("GlobalNodeId").alias("sink"),
                         F.col("c_custkey").alias("sink_key")), "sink")
        .select(F.col("src_key").alias("src"), F.col("sink_key").alias("sink"))
    )
    lp = label_propagation(
        nodes.select(F.col("c_custkey").alias("id")), edges, iterations=3
    )
    return lp.select(F.col("id").alias("c_custkey"),
                     F.col("label").alias("community"))


def _oracle_communities(iterations: int = 3) -> str:
    from graphview_spark.graph_queries import _ORACLE_REFERS

    parts = [
        f"refers AS ({_ORACLE_REFERS})",
        "sym AS (SELECT src, sink FROM refers "
        "UNION ALL SELECT sink, src FROM refers)",
        "l0 AS (SELECT c_custkey AS id, c_custkey AS label FROM customer)",
    ]
    for i in range(1, iterations + 1):
        prev = f"l{i - 1}"
        parts.append(
            f"p{i} AS (SELECT id, label FROM ("
            f"SELECT e.sink AS id, l.label, "
            f"row_number() OVER (PARTITION BY e.sink "
            f"ORDER BY count(*) DESC, l.label ASC) AS rn "
            f"FROM sym e JOIN {prev} l ON e.src = l.id "
            f"GROUP BY e.sink, l.label) WHERE rn = 1)"
        )
        parts.append(
            f"l{i} AS (SELECT {prev}.id, "
            f"coalesce(p{i}.label, {prev}.label) AS label "
            f"FROM {prev} LEFT JOIN p{i} USING (id))"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id AS c_custkey, label AS community FROM l{iterations}"
    )


QUERIES = {
    "graph_pagerank": q_graph_pagerank,
    "graph_components": q_graph_components,
    "graph_shortest_paths": q_graph_shortest_paths,
    "graph_triangles": q_graph_triangles,
}

ORACLES = {
    "graph_pagerank": _oracle_pagerank(),
    "graph_components": _oracle_components(),
    "graph_shortest_paths": _oracle_shortest_paths(),
    "graph_triangles": _oracle_triangles(),
}

KCORE_K = 2


def q_graph_kcore(spark, sf_dir: str) -> DataFrame:
    """2-core of the MinHash near-duplicate pair graph — the dense part
    of the duplicate structure (nodes on cycles of near-dup relations),
    peeled iteratively. Oracle: the same peeling unrolled as chained
    CTEs (fixpoint reached well within the unroll depth on this data;
    the Spark side runs to true fixpoint)."""
    from graphview_spark.operators.dedup import (
        MINHASH_JACCARD_T,
        N_BANDS,
        _lsh_verified_pairs,
    )

    pairs = _lsh_verified_pairs(spark, sf_dir, N_BANDS, MINHASH_JACCARD_T)
    core = k_core(pairs, KCORE_K, "doc_a", "doc_b")
    return core.select(F.col("node").alias("doc_id"), "core_degree")


def _oracle_kcore(rounds: int = 24) -> str:
    from graphview_spark.operators.dedup import (
        MINHASH_JACCARD_T,
        N_BANDS,
        _oracle_lsh_verified,
    )

    pair_sql = _oracle_lsh_verified(N_BANDS, MINHASH_JACCARD_T)
    # MATERIALIZED: each u{i+1} references u{i} twice (directly and via
    # r{i}) — inlined CTEs would expand the LSH pair scan exponentially.
    # The unroll depth must cover the data's true peeling depth (the
    # Spark side peels to fixpoint); near-dup pair graphs peel in a
    # handful of rounds, and each extra round is cheap on a shrinking
    # set, so 24 is generous headroom. If check.py ever flags this
    # query, raise `rounds` before suspecting the operator.
    ctes = [
        f"pairs AS MATERIALIZED ({pair_sql})",
        "u0 AS MATERIALIZED (SELECT DISTINCT doc_a AS s, doc_b AS t "
        "FROM pairs UNION SELECT doc_b, doc_a FROM pairs)",
    ]
    for i in range(rounds):
        ctes.append(
            f"r{i} AS MATERIALIZED (SELECT s FROM u{i} GROUP BY s "
            f"HAVING count(*) < {KCORE_K})"
        )
        ctes.append(
            f"u{i + 1} AS MATERIALIZED (SELECT s, t FROM u{i} "
            f"WHERE s NOT IN (SELECT s FROM r{i}) "
            f"AND t NOT IN (SELECT s FROM r{i}))"
        )
    # fixpoint sentinel: if the LAST peel round still removed nodes, the
    # unroll depth was insufficient — error() loudly instead of silently
    # diverging from the Spark side's true-fixpoint peel
    # the sentinel must be load-bearing (multiplied into the output) or
    # DuckDB's optimizer prunes the unused 1-row join and never evaluates
    # the CASE — verified: an unused CROSS JOIN sentinel does NOT fire
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT s AS doc_id,
       (count(*) * (SELECT CASE WHEN (SELECT count(*) FROM r{rounds - 1}) > 0
          THEN error('k-core oracle: unroll depth {rounds} did not reach fixpoint - raise rounds')
          ELSE 1 END))::BIGINT AS core_degree
FROM u{rounds} GROUP BY s"""
    )


def k_truss(
    pairs: DataFrame, k: int, a: str = "a", b: str = "b"
) -> DataFrame:
    """The k-truss of an undirected simple graph (canonical a<b pairs):
    the maximal subgraph where every edge participates in ≥ k-2
    triangles. Stricter than the k-core (every k-truss is inside the
    (k-1)-core) — the standard cohesive-subgraph refinement. Returns the
    surviving edges with their in-truss support ``(a, b, support)``.

    Edge-peeling driver loop: each round enumerates triangles with the
    same oriented two-path + closing-edge join as
    :func:`triangle_count` (fan-out bounded by min-degree endpoints),
    credits each triangle to its three edges with one
    map-side-combinable groupBy, and drops under-supported edges.
    Rounds are bounded by the peeling depth (a handful in practice);
    every round strictly shrinks the edge set, so it terminates;
    localCheckpoint caps lineage. Requires k ≥ 3."""
    if k < 3:
        raise ValueError("k-truss requires k >= 3")
    e = (
        pairs.select(F.col(a).alias("a"), F.col(b).alias("b"))
        .distinct()
        .transform(_ckpt_eager)
    )
    n_edges = e.count()
    while True:
        ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
        tri = (
            ab.join(bc, F.col("ab.b") == F.col("bc.a"))
            .join(
                ac,
                (F.col("ac.a") == F.col("ab.a"))
                & (F.col("ac.b") == F.col("bc.b")),
            )
            .select(
                F.col("ab.a").alias("x"),
                F.col("ab.b").alias("y"),
                F.col("bc.b").alias("z"),
            )
        )
        sup = (
            tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
            .union(tri.select(F.col("y"), F.col("z")))
            .union(tri.select(F.col("x"), F.col("z")))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("support"))
        )
        kept = sup.filter(F.col("support") >= k - 2).transform(_ckpt_eager)
        n_kept = kept.count()
        if n_kept == n_edges:
            return kept
        n_edges = n_kept
        e = kept.select("a", "b").transform(_ckpt_eager)


KTRUSS_K = 3


def q_graph_ktruss(spark, sf_dir: str) -> DataFrame:
    """3-truss of the MinHash near-duplicate pair graph — every
    surviving near-dup relation is corroborated by a third mutually
    similar document (the cohesive core the k-core approximates, one
    notch stricter). Oracle: the same peeling unrolled as chained CTEs
    with a fixpoint sentinel."""
    from graphview_spark.operators.dedup import (
        MINHASH_JACCARD_T,
        N_BANDS,
        _lsh_verified_pairs,
    )

    pairs = _lsh_verified_pairs(spark, sf_dir, N_BANDS, MINHASH_JACCARD_T)
    truss = k_truss(pairs, KTRUSS_K, "doc_a", "doc_b")
    return truss.select(
        F.col("a").alias("doc_a"), F.col("b").alias("doc_b"), "support"
    )


def _oracle_ktruss(rounds: int = 16) -> str:
    from graphview_spark.operators.dedup import (
        MINHASH_JACCARD_T,
        N_BANDS,
        _oracle_lsh_verified,
    )

    pair_sql = _oracle_lsh_verified(N_BANDS, MINHASH_JACCARD_T)
    ctes = [
        f"pairs AS MATERIALIZED ({pair_sql})",
        "e0 AS MATERIALIZED (SELECT DISTINCT doc_a AS a, doc_b AS b "
        "FROM pairs)",
    ]
    for i in range(rounds):
        ctes += [
            f"t{i} AS MATERIALIZED (SELECT ab.a AS x, ab.b AS y, bc.b AS z "
            f"FROM e{i} ab JOIN e{i} bc ON ab.b = bc.a "
            f"JOIN e{i} ac ON ac.a = ab.a AND ac.b = bc.b)",
            f"e{i + 1} AS MATERIALIZED (SELECT a, b, count(*) AS support "
            f"FROM (SELECT x AS a, y AS b FROM t{i} "
            f"UNION ALL SELECT y, z FROM t{i} "
            f"UNION ALL SELECT x, z FROM t{i}) "
            f"GROUP BY a, b HAVING count(*) >= {KTRUSS_K - 2})",
        ]
    # load-bearing fixpoint sentinel (k-core oracle lesson): the last
    # round must have removed nothing, else the unroll was too shallow
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT a AS doc_a, b AS doc_b,
       (support * (SELECT CASE WHEN
          (SELECT count(*) FROM e{rounds}) <>
          (SELECT count(*) FROM e{rounds - 1})
          THEN error('k-truss oracle: unroll depth {rounds} did not reach fixpoint - raise rounds')
          ELSE 1 END))::BIGINT AS support
FROM e{rounds}"""
    )


def node_similarity(
    edges: DataFrame,
    max_degree: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Common-neighbor Jaccard similarity between node pairs of an
    undirected graph given as directed (src, sink) edges.

    Plan: symmetrize → self-join on the shared neighbor → pair-count
    aggregate → join per-node degrees. Cost is Σ_n C(deg(n), 2), which
    a hub node makes quadratic — ``max_degree`` drops hubs before the
    self-join (the standard mitigation; at 100 TB you cap and handle
    hubs separately, e.g. via sketches). The (capped) symmetrized edge
    list is materialized once (``materialize=False`` keeps it lazy for
    plan inspection): it feeds the degree aggregate and BOTH self-join
    sides, so an unmaterialized frame would re-run its shuffles 3×.
    The Jaccard is computed with exact integer arithmetic so the oracle
    agrees bit-for-bit."""
    from graphview_spark.operators.text import _ratio_r
    from graphview_spark.plans import lazy as _lazy

    def _pin(df: DataFrame) -> DataFrame:
        return _lazy.pin(df) if materialize else df

    sym = _pin(
        edges.select("src", "sink")
        .union(edges.select(F.col("sink").alias("src"), F.col("src").alias("sink")))
        .distinct()
    )
    if max_degree is not None:
        deg_all = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        keep = deg_all.filter(F.col("d") <= max_degree).select("src")
        sym = _pin(
            sym.join(keep, "src")
            .join(keep.withColumnRenamed("src", "sink"), "sink")
            .select("src", "sink")
        )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    a = sym.select(F.col("src").alias("na"), F.col("sink").alias("n"))
    b = sym.select(F.col("src").alias("nb"), F.col("sink").alias("n"))
    common = (
        a.join(b, "n")
        .filter(F.col("na") < F.col("nb"))
        .groupBy("na", "nb")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(deg.withColumnRenamed("src", "na"), "na")
        .withColumnRenamed("d", "da")
        .join(deg.withColumnRenamed("src", "nb"), "nb")
        .withColumnRenamed("d", "db")
        .select(
            "na",
            "nb",
            "common",
            _ratio_r(
                F.col("common"), F.col("da") + F.col("db") - F.col("common")
            ).alias("jaccard"),
        )
    )


NODE_SIM_MAX_DEGREE = 64


def q_graph_node_sim(spark, sf_dir: str) -> DataFrame:
    """Common-neighbor Jaccard over the Refers tree (undirected):
    sibling / parent-grandchild structural similarity. The hub cap is ON
    by default so the gate exercises the scale-safe path — a no-op on
    the Refers tree (max undirected degree 3), so the oracle is the
    uncapped SQL; at 100 TB the cap bounds the Σ C(deg,2) self-join
    blowup (asserted present in the plan by tests/test_plans.py)."""
    from graphview_spark.graph_queries import tpch_graph

    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes["Customer"]
    edges = g.edge_with_id("Customer.Refers")
    sim = node_similarity(edges, max_degree=NODE_SIM_MAX_DEGREE)
    na = nodes.select(
        F.col("GlobalNodeId").alias("na"), F.col("c_custkey").alias("cust_a")
    )
    nb = nodes.select(
        F.col("GlobalNodeId").alias("nb"), F.col("c_custkey").alias("cust_b")
    )
    # canonicalize on custkey: the Spark-side a<b order is on internal
    # GlobalNodeIds, whose ordering need not match custkey ordering
    return (
        sim.join(na, "na")
        .join(nb, "nb")
        .select(
            F.least("cust_a", "cust_b").alias("cust_a"),
            F.greatest("cust_a", "cust_b").alias("cust_b"),
            "common",
            "jaccard",
        )
    )


def _oracle_node_sim() -> str:
    from graphview_spark.graph_queries import _ORACLE_REFERS
    from graphview_spark.operators.text import _sql_ratio_r

    jac = _sql_ratio_r("common", "da + db - common")
    return f"""
WITH refers AS MATERIALIZED ({_ORACLE_REFERS}),
sym AS MATERIALIZED (
  SELECT src, sink FROM refers UNION SELECT sink, src FROM refers
),
deg AS (SELECT src, count(*)::BIGINT AS d FROM sym GROUP BY src),
common AS (
  SELECT a.src AS na, b.src AS nb, count(*)::BIGINT AS common
  FROM sym a JOIN sym b ON a.sink = b.sink AND a.src < b.src
  GROUP BY 1, 2
),
j AS (
  SELECT c.na, c.nb, c.common, x.d AS da, y.d AS db
  FROM common c JOIN deg x ON x.src = c.na JOIN deg y ON y.src = c.nb
)
SELECT na AS cust_a, nb AS cust_b, common, {jac} AS jaccard FROM j
"""


HITS_ITERS = 5
PPR_ITERS = 5
PPR_DAMPING = 0.85
PPR_SEED_MAX = 10  # teleport set: customers with c_custkey <= this


HITS_SCALE = float(1 << 20)  # fixed so the static oracle SQL matches


def q_graph_hits(spark, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the Refers tree, 5 exact-arithmetic
    rounds with one final L1 normalization — oracle = the same
    recurrence unrolled as chained CTEs. ``scale`` is pinned to 2²⁰
    (≥ the Refers edge count at every gate SF) so the oracle text is
    static; standalone callers let hits() derive it from |E|."""
    from graphview_spark.graph_queries import tpch_graph

    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes["Customer"]
    edges = g.edge_with_id("Customer.Refers")
    hs = hits(nodes, edges, iterations=HITS_ITERS, scale=HITS_SCALE)
    return hs.join(nodes, "GlobalNodeId").select(
        "c_custkey",
        F.round("hub", 8).alias("hub"),
        F.round("auth", 8).alias("auth"),
    )


def _oracle_hits(iterations: int = HITS_ITERS) -> str:
    """HITS unrolled (exact-arithmetic recurrence: per-half-step
    division by the fixed power-of-two HITS_SCALE, single L1
    normalization at the end — mirrors hits()); every aggregate CTE
    MATERIALIZED so DuckDB doesn't expand the edge scan exponentially
    (the k-core oracle lesson). All in-loop values are dyadic
    rationals, so both engines compute identical doubles."""
    from graphview_spark.graph_queries import _ORACLE_REFERS

    inv = repr(1.0 / HITS_SCALE)
    ctes = [
        f"refers AS MATERIALIZED ({_ORACLE_REFERS})",
        "h0 AS MATERIALIZED (SELECT DISTINCT src AS id, 1.0::DOUBLE "
        "AS score FROM refers)",
    ]
    for i in range(1, iterations + 1):
        ctes += [
            f"a{i} AS MATERIALIZED (SELECT e.sink AS id, "
            f"sum(p.score) * {inv} AS score "
            f"FROM h{i - 1} p JOIN refers e ON e.src = p.id GROUP BY e.sink)",
            f"h{i} AS MATERIALIZED (SELECT e.src AS id, "
            f"sum(p.score) * {inv} AS score "
            f"FROM a{i} p JOIN refers e ON e.sink = p.id GROUP BY e.src)",
        ]
    n = iterations
    return (
        "WITH " + ",\n".join(ctes)
        + f""",
at AS (SELECT sum(score) AS t FROM a{n}),
ht AS (SELECT sum(score) AS t FROM h{n})
SELECT c.c_custkey,
       round(coalesce(h.score / ht.t, 0), 8) AS hub,
       round(coalesce(a.score / at.t, 0), 8) AS auth
FROM customer c
LEFT JOIN h{n} h ON h.id = c.c_custkey
LEFT JOIN a{n} a ON a.id = c.c_custkey
CROSS JOIN at CROSS JOIN ht
"""
    )


def q_graph_ppr(spark, sf_dir: str) -> DataFrame:
    """Personalized PageRank seeded on customers 1..10 over the Refers
    tree — seeded relevance ranking, teleport mass back to the seeds."""
    from graphview_spark.graph_queries import tpch_graph

    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes["Customer"]
    edges = g.edge_with_id("Customer.Refers")
    src = nodes.filter(F.col("c_custkey") <= PPR_SEED_MAX).select("GlobalNodeId")
    pr = personalized_pagerank(
        nodes, edges, src, damping=PPR_DAMPING, iterations=PPR_ITERS
    )
    return pr.join(nodes, "GlobalNodeId").select(
        "c_custkey", F.round("rank", 8).alias("rank")
    )


def _oracle_ppr(
    iterations: int = PPR_ITERS, damping: float = PPR_DAMPING
) -> str:
    from graphview_spark.graph_queries import _ORACLE_REFERS

    def step(prev: str) -> str:
        return f"""
  SELECT pv.id, round({1.0 - damping} * pv.p
         + {damping} * (dang.s * pv.p + coalesce(ct.contrib, 0)),
         {SCORE_GRID}) AS rank
  FROM pref pv
  CROSS JOIN (SELECT coalesce(sum(p.rank), 0) AS s
              FROM {prev} p LEFT JOIN deg ON deg.src = p.id
              WHERE deg.src IS NULL) dang
  LEFT JOIN (SELECT e.sink AS id, sum(p.rank / deg.d) AS contrib
             FROM {prev} p
             JOIN deg ON deg.src = p.id
             JOIN refers e ON e.src = p.id
             GROUP BY e.sink) ct ON ct.id = pv.id"""

    ctes = [
        f"refers AS MATERIALIZED ({_ORACLE_REFERS})",
        "deg AS MATERIALIZED (SELECT src, count(*) AS d FROM refers GROUP BY src)",
        f"ns AS (SELECT count(*)::DOUBLE AS n FROM customer "
        f"WHERE c_custkey <= {PPR_SEED_MAX})",
        f"pref AS MATERIALIZED (SELECT c_custkey AS id, "
        f"CASE WHEN c_custkey <= {PPR_SEED_MAX} "
        f"THEN 1.0 / (SELECT n FROM ns) ELSE 0.0::DOUBLE END AS p "
        f"FROM customer)",
        "r0 AS MATERIALIZED (SELECT id, p AS rank FROM pref)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(f"r{i} AS MATERIALIZED ({step(f'r{i - 1}')})")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id AS c_custkey, round(rank, 8) AS rank FROM r{iterations}"
    )


# rotated into the driver gate in round 4
QUERIES.update({
    "graph_communities": q_graph_communities,
    "graph_weighted_paths": q_graph_weighted_paths,
    "graph_hits": q_graph_hits,
})
ORACLES.update({
    "graph_communities": _oracle_communities(),
    "graph_weighted_paths": _oracle_weighted_paths(),
    "graph_hits": _oracle_hits(),
})
# --------------------------------------------------------------------------
# Strongly connected components: GraphX-style trim + pivot coloring
# (the same structure as org.apache.spark.graphx.lib.StronglyConnected
# Components — trim DAG fringes, then peel SCCs by forward/backward
# min-label agreement; that public implementation is RDD/JVM-only, this
# is the DataFrame re-expression). Designed for low-cycle-density
# graphs — referral trees, dedup pair graphs, web-link near-DAGs — the
# shape real 100 TB corpora have; dense-cycle worst cases take more
# peel rounds (bounded by ``max_rounds`` with a hard failure, never a
# silent wrong answer).
# --------------------------------------------------------------------------

_SCC_PROBE_EVERY = 4   # propagation rounds between convergence probes


def _shortcut_closure(e: DataFrame, budget_factor: int = 32,
                      max_squarings: int = 12,
                      skip_mass_check: bool = False
                      ) -> tuple[DataFrame, bool]:
    """Path-doubling reachability closure: G ← G ∪ G∘G doubles the hop
    radius per squaring, so k squarings cover paths of 2^k edges and
    the fixpoint IS the transitive closure. Each squaring is one
    self-join + distinct — O(log diameter) driver-synchronized jobs
    total, versus one job per hop for message-round propagation (the
    dominant cost on deep graphs: per-job overhead, not data volume).
    The budget guard stops when the edge set exceeds
    ``budget_factor``×|E|: on near-DAG graphs (referral trees, dedup
    pair graphs, web link graphs after dedup) the closure is
    O(V·depth) and fits easily; on dense graphs it is quadratic and
    the caller must use the bounded-memory iterative path instead.
    Returns (reach_pairs, complete) — ``complete`` is True iff the
    fixpoint was reached within budget.

    Two per-round cost cuts (measured ~2× on the sf0.1 bench loop):

    - **Seminaive delta composition.** A full squaring g∘g re-derives
      every already-known pair every round. Instead only pairs FIRST
      DERIVED last round (the delta) compose: g ∪ delta∘g ∪ g∘delta.
      Correct by the path-splitting argument — a shortest path of
      length ≤ 2^(k+1) splits into two halves of length ≤ 2^k; at the
      round after the LATER half first appears, the earlier half is
      present and the later is fresh, so the composition derives the
      pair — round count stays O(log diameter). The fixpoint-confirming
      round composes an empty delta, so it is nearly free.
    - **Probe rides the squaring job.** The checkpoint is non-eager
      and the count/fresh-sum probe is the action that materializes
      it: one Spark job per squaring, not two.

    Runs under _loop_regime (loop-sized shuffles, AQE deferred until
    frames are big enough to be data-dominated)."""
    with _loop_regime(e.sparkSession) as size_shuffle:
        # seed dedup runs under the SESSION regime (AQE sizes it — the
        # input may be arbitrarily large); its measured count sizes the
        # loop regime. No seed-squaring fold here: unlike the distance
        # closure, reach-diameters land just past powers of two on the
        # mutual-chain graphs this serves, so the fold saves no round
        # and only adds a job (measured).
        g = (
            e.distinct().withColumn("fresh", F.lit(1))
            .transform(_ckpt_lazy)
        )
        n = g.agg(F.count(F.lit(1))).first()[0]
        budget = budget_factor * max(n, 1)
        if (not skip_mass_check and n >= _MASS_ESTIMATE_MIN_EDGES
                and _closure_mass_doomed(g, budget, n_edges=n)):
            # the sampled-BFS mass estimate says the finished closure
            # cannot fit the budget — skip the attempt entirely instead
            # of discovering it rounds (and minutes) later
            return g.select("src", "sink"), False
        pred = _pred_if_big(g, n, delta_is_all=True)
        n_delta = n
        for i in range(max_squarings):
            if pred > _PREDICT_SLACK * budget:
                # the NEXT compose would enumerate pred rows BEFORE the
                # materialized-size budget could ever see them (the sf1
                # failure mode: one squaring jumped from under-budget to
                # tens of GB of join output). Bail to the bounded-memory
                # fallback without running it.
                return g.select("src", "sink"), False
            size_shuffle(n)
            delta = g.filter(F.col("fresh") == 1)
            # small deltas ride the join as a broadcast build side, so
            # the accumulated closure never shuffles for the compose
            if n_delta < _LOOP_BCAST_ROWS:
                delta = F.broadcast(delta)
            compose = [
                delta.alias("a")
                .join(g.alias("b"), F.col("a.sink") == F.col("b.src"))
                .select(F.col("a.src").alias("src"),
                        F.col("b.sink").alias("sink")),
            ]
            if i > 0:  # round 1: delta == g, one composition covers both
                compose.append(
                    g.alias("a")
                    .join(delta.alias("b"), F.col("a.sink") == F.col("b.src"))
                    .select(F.col("a.src").alias("src"),
                            F.col("b.sink").alias("sink"))
                )
            two = compose[0]
            for c in compose[1:]:
                two = two.unionByName(c)
            g2 = (
                g.select("src", "sink", F.lit(1).alias("_old"))
                .unionByName(two.select("src", "sink", F.lit(0).alias("_old")))
                .groupBy("src", "sink")
                .agg((1 - F.max("_old")).alias("fresh"))
                .transform(_ckpt_lazy)
            )
            row = g2.agg(F.count(F.lit(1)), F.sum("fresh")).first()
            n2, n_fresh = row[0], row[1]
            # n_fresh is NULL (None) on an empty frame — possible when
            # the seed edge set is empty (edge-free graph, or the SCC
            # peel's class-restricted residual) — and an empty closure
            # IS converged; comparing None below would crash (ADVICE r8)
            if n2 == 0 or not n_fresh:
                return g.select("src", "sink"), True
            pred = _pred_if_big(g2, n2)
            grow = n2 / max(n, 1)
            g, n, n_delta = g2, n2, n_fresh
            if n > budget:
                return g.select("src", "sink"), False
            if (n >= _PREDICT_MIN_ROWS and grow >= _DOOMED_GROWTH
                    and n * grow > budget
                    and _probe_next_mass(g) > budget):
                # the sampled dry run of the next squaring says its
                # output crosses the budget — bail before paying it
                return g.select("src", "sink"), False
        return g.select("src", "sink"), False


# compose-size guard slack: the predicted enumeration count is an
# upper bound (duplicates collapse in the groupBy; round 0 double-
# counts its single compose), so the guard must only fire on the
# CATASTROPHIC class — a squaring gone quadratic (dense graph: ratio
# in the thousands) — never on legitimate closure rounds. Measured on
# the Refers+back-edge family: the biggest round that still completes
# within budget predicts 8.9× (sf0.1), the first budget-tripping round
# 18× (sf1, 39 s — bounded, and the materialized check catches it); a
# true quadratic blowup at that node count predicts ~4000×. 64 sits
# an order of magnitude above the legitimate band and two below the
# disaster band.
_PREDICT_SLACK = 64
# ... and the guard only runs at all once the frame is big enough for
# a blowup round to be catastrophic: the prediction costs a fixed
# ~0.35 s/round of stage scheduling (measured 40% of graph_scc's
# sf0.1 wall time), while below this row count even a severely
# super-budget round is seconds, already bounded by the materialized
# check one round later. Above it, the pred job is amortized by the
# round's real data work.
_PREDICT_MIN_ROWS = 2_000_000
# Doomed-trajectory bail (VERDICT r8 "What's wrong #2"): the
# materialized budget check sees a blowup only AFTER paying the
# squaring that produced it — at sf1 that final doomed squaring alone
# cost ~39 s of the SCC wall. Growth-rate extrapolation ALONE cannot
# decide (measured on the Refers+back-edge family: the sf0.1 closure
# holds grow ≈ 2.1 for every round and then converges at 0.77× budget
# in ONE final collapse, while sf1 holds grow ≈ 2.2-2.4 and crosses to
# 1.12× budget — the same local trajectory, opposite outcomes). So the
# extrapolation is only the TRIGGER: when mass is still growing ≥
# _DOOMED_GROWTH, one more such round would cross the budget, and the
# frame is big enough for a wasted squaring to hurt (_PREDICT_MIN_ROWS),
# the loop buys certainty with _probe_next_mass — an src-sampled dry
# run of the next compose costing ~1/_PROBE_MOD of the squaring it
# predicts — and bails only when the estimated post-dedup output
# actually crosses the budget. A mis-bail costs the exact
# bounded-memory fallback, never correctness.
_DOOMED_GROWTH = 1.5
_PROBE_MOD = 16


# Closure-mass pre-estimate (round 9): even with the next-mass probe,
# a doomed attempt pays every under-budget squaring before the bail —
# at sf1 rounds 0-3 alone cost ~4 minutes on this host. Above this
# edge count, both closure loops first spend a sampled multi-seed BFS
# (~depth jobs over ≤2×budget×(seeds/srcs) sampled settled rows — tens
# of seconds) to estimate the FINISHED closure's mass and skip the
# attempt outright when it cannot fit. Below it the attempt itself is
# seconds and the estimate would be pure overhead (the sf0.1 gate
# graphs stay under this). Trade named: a legitimately-fitting big
# closure (the sf1 Refers tree for closeness) pays the estimate's BFS
# once before its attempt — linear cost to dodge a quadratic trap.
_MASS_ESTIMATE_MIN_EDGES = 100_000
_MASS_SEEDS = 256
# edge frames at or below this row count run the mass-estimate BFS on
# the driver over one collected copy (see _closure_mass_estimate);
# kept equal to _LOOP_BCAST_ROWS — if a frame is small enough to ship
# to every executor as a broadcast, one driver copy is strictly less
# memory — but a separate knob so tests can force either path
_MASS_DRIVER_EDGES = 1_000_000


def _mass_bfs_driver(pairs, seed_ids, n_src: int, budget: int,
                     max_depth: int) -> float:
    """Exact driver-side transcription of _closure_mass_estimate's
    distributed two-hop loop, for edge frames under _MASS_DRIVER_EDGES:
    same seeds (selected in Spark by the same xxhash64 filter), same
    pair-granularity exits, same cycle-pair correction, same returned
    float — only the substrate differs (Python sets instead of
    per-hop Spark jobs). Keep the two in lockstep: the gate must never
    change the verdict, only where it is computed."""
    adj: dict = {}
    for row in pairs:
        adj.setdefault(row[0], set()).add(row[1])
    n_seeds = len(seed_ids)
    abort_at = 2.0 * budget * n_seeds / n_src
    settled = {(s, s) for s in seed_ids}
    frontier = settled
    mass = 0

    def _hop(fr, st):
        return {(s, t) for (s, i) in fr for t in adj.get(i, ())} - st

    for _ in range(max(1, max_depth // 2)):
        nxt1 = _hop(frontier, settled)
        settled1 = settled | nxt1
        nxt2 = _hop(nxt1, settled1)
        c1, c2 = len(nxt1), len(nxt2)
        if c1 == 0 or c2 == 0:
            done = settled if c1 == 0 else settled1
            cyc = len({s for (s, i) in done if s in adj.get(i, ())})
            return (mass + c1 + cyc) / n_seeds * n_src
        mass += c1 + c2
        if mass > abort_at:
            return float("inf")
        settled = settled1 | nxt2
        frontier = nxt2
    return float("inf")
# Asymmetric skip threshold (round 9, calibrated on measured cases):
# per-seed reach is heavy-tailed — a handful of deep srcs carry much
# of the closure mass — so the sampled mean carries real variance at
# ANY affordable seed count, and because the sampling hash is
# deterministic a bad draw is a fixed bias, not a re-rollable one
# (measured: sf1 true ≥1.12× budget estimated 1.10× at 256 seeds but
# 0.60× at 4096 — the "refinement" flipped a correct skip into a 58s
# doomed attempt; sf3 true ≈1.0× estimated 0.39×/0.65×/1.02× at
# 256/1024/8192). The decision costs are asymmetric: a wrong ATTEMPT
# is probe-bounded but grows with scale (sf1 58s, sf3 385s), while a
# wrong SKIP pays the bounded-linear peel. So the verdict is a single
# 256-seed pass compared against a FRACTION of the budget — estimates
# in the noise band around the boundary route to the safe side.
# 0.7 keeps every measured legitimate closure attempting (sf1
# closeness tree: 0.48×) and every measured doomed one skipping
# (sf1 SCC: 1.10×); sf3's flukish 0.39× under-read still attempts and
# pays the bounded wrong-guess cost — no threshold fixes an estimate
# that far off without breaking the legitimate band.
_MASS_SKIP_FRACTION = 0.7


def _closure_mass_doomed(e: DataFrame, budget: int,
                         n_edges: int | None = None) -> bool:
    """True when the finished closure's estimated mass cannot fit
    ``budget`` — the strategy verdict both closure loops and the SCC
    peel consult.

    Round 10: the verdict is the MAX of two ~256-seed estimates of the
    same quantity — closure mass = Σ_src |reach(src)| (forward BFS over
    sampled srcs) = Σ_sink |ancestors(sink)| (the same BFS over the
    edge-reversed frame) — because the two marginals are rarely
    heavy-tailed together. On the deep-tree calibration family the
    forward per-seed reach is dominated by a handful of near-root srcs
    a 256-seed sample usually misses (sf3 read 0.39× of true mass),
    while the reverse per-seed mass is the bounded ancestor chain —
    light-tailed, so the sampled mean is tight. Degree-stratified
    seeding (the other candidate fix) has no signal to stratify on
    here: the calibration family's out-degree is capped at 3 (tree
    fanout 2 + one back-edge) and is uncorrelated with reach — see
    PLANS.md. Taking the max biases the verdict toward SKIP, cutting
    exactly the under-read failure mode (a wrong attempt is
    probe-bounded but grows with scale: 58 s at sf1, 385 s at sf3)
    while a wrong skip pays the bounded-linear fallback by design.
    The reverse pass is short-circuited whenever the forward estimate
    alone already crosses the threshold (the sf1 SCC case pays one
    pass, as before).

    Round 11 — the adversarial BOTH-tails-heavy bound (VERDICT r10
    "Next #7", measured via tools/calibrate_mass.py's ``hubbridge``
    family: H rare source hubs → shared bridge chain → H rare sink
    hubs, padded with reach-1 bulk pairs, so each marginal is heavy
    ONLY at nodes the other pass cannot rescue): max(fwd, rev) reads
    ~0.47× of true there — the documented residual under-read. It is
    structurally bounded: a closure pair hides from the forward pass
    only if its SOURCE sits in the hash-unsampled heavy set, and from
    the reverse pass only if its SINK does too, so doubly-hidden mass
    ≤ |S_f|·|S_r| where a set of size s evades a 1/k hash sample with
    probability ~e^(−s/k) — at 95% confidence |S| ≲ 3·n_src/SEEDS.
    The verdict can therefore flip only when (3·n_src/256)² exceeds
    the ~0.7·32·|E| skip margin, i.e. n_src² ≳ 1.6e5·|E| — 2.7× above
    the densest tested rung (sf3: n=60k, E≈60k → n² = 3.6e9 vs margin
    9.7e9) and farther at every smaller one. Past that scale the
    verdict may under-read, and the protection reverts to the in-loop
    guards, which bound a wrong attempt's cost by construction: the
    verdict is a cost optimization, never the only guard.

    Round 12 — that residual claim is now MEASURED, not arithmetic
    (VERDICT r11 "Next #7", tools/calibrate_mass.py ``hubflip``: hubs
    placed adversarially on hash-unsampled ids, realizing the
    |S_f|·|S_r| worst case past the bound). Both wrong-attempt regimes
    flip the verdict (max reads 0.03× while true mass is 7.6× / 228×
    budget) and both are bounded: at 278k edges (pred guard disengaged
    below _PREDICT_MIN_ROWS) the attempt pays exactly ONE over-budget
    compose — 129 s, same class as the measured sf3 385 s — before the
    materialized budget trips; at 2.36M edges the compose-size
    prediction bails BEFORE paying the 17-billion-pair compose, 8.4 s
    total. Numbers in SCALECHECK.md round-12."""
    thresh = _MASS_SKIP_FRACTION * budget
    if _closure_mass_estimate(e, budget, n_edges=n_edges) > thresh:
        return True
    rev = e.select(F.col("sink").alias("src"), F.col("src").alias("sink"))
    return _closure_mass_estimate(rev, budget, n_edges=n_edges) > thresh


def _closure_mass_estimate(e: DataFrame, budget: int,
                           max_depth: int = 64,
                           sample_target: int | None = None,
                           n_edges: int | None = None) -> float:
    """Estimated reach-pair count of the FINISHED closure, from a BFS
    over a deterministic hash-sample of ~_MASS_SEEDS source nodes:
    mass ≈ n_src × mean per-seed reach. The per-seed reach is computed
    EXACTLY (full frontier expansion per sampled seed), so the only
    error is the seed marginal's sampling noise; the decision this
    feeds is safe in both directions (a mis-skip costs the exact
    bounded-memory fallback, a mis-attempt is still caught by the
    budget and next-mass-probe guards inside the loop).

    Cycle self-pairs count (ADVICE r9 #3): the closure frame the budget
    measures contains (s, s) for every node on a cycle, but the BFS
    seeds ``settled`` with the seed's own id so a re-reach of the seed
    is anti-joined away. On the complete exit one extra join counts the
    sampled seeds some settled node points back to, and adds one pair
    each — at k=1 the estimate now equals the finished frame's count
    exactly, cycles included.

    Early-aborts with +inf as soon as the SAMPLED settled mass crosses
    2× its budget-equivalent share — so on hub graphs whose reach sets
    are the whole graph the estimate never expands them, and its work
    is bounded by ~2×budget×(seeds/srcs) rows regardless of density.
    Returns +inf too when the frontier outlives ``max_depth``: a graph
    that deep has closure mass ≥ V·depth/2, past any sane budget."""
    srcs = e.select("src").distinct().transform(_ckpt_lazy)
    n_src = srcs.count()
    if n_src == 0:
        return 0.0
    k = max(1, n_src // (sample_target or _MASS_SEEDS))
    seeds = srcs.filter(F.pmod(F.xxhash64("src"), F.lit(k)) == 0)

    # Round 13 (VERDICT r12 "Next #5", measured via
    # tools/probe_scc_phases.py): at sf1 the three strategy verdicts of
    # q_graph_scc cost 60 s of its 128 s cold run — the BFS frontiers
    # are abort_at-bounded (~10⁴ rows) and every hop pays the per-job
    # scheduling floor, not data. When the EDGE frame itself is
    # broadcast-small (≤ _MASS_DRIVER_EDGES rows — the same bound
    # _LOOP_BCAST_ROWS uses to ship a frame to every executor, so one
    # driver copy is strictly lighter), collect it once and run the
    # identical sampled BFS in plain sets: 3 tiny jobs instead of
    # 2 + 2·⌈depth/2⌉. Seed selection still happens IN SPARK (the
    # xxhash64 sample must match the distributed path bit-for-bit), and
    # _mass_bfs_driver transcribes the pair-granularity loop below
    # exactly — both paths return the same float for the same frame, so
    # the strategy verdict is independent of which path computed it
    # (property-tested both ways in tests/test_loop_scale_guards.py).
    # Above the gate (true scale) the distributed loop runs unchanged.
    if n_edges is None:
        n_edges = e.count()
    if n_edges <= _MASS_DRIVER_EDGES:
        seed_ids = [r[0] for r in seeds.collect()]
        if not seed_ids:  # hash skew emptied the sample
            return 0.0
        pairs = e.select("src", "sink").collect()
        return _mass_bfs_driver(pairs, seed_ids, n_src, budget, max_depth)

    n_seeds = seeds.count()
    if n_seeds == 0:  # hash skew emptied the sample: nothing to learn
        return 0.0
    abort_at = 2.0 * budget * n_seeds / n_src
    settled = seeds.select(F.col("src").alias("s"),
                           F.col("src").alias("id"))
    frontier = settled
    mass = 0

    # Both loop frames are bounded BY CONSTRUCTION: the frontier was
    # counted ≤ abort_at at the previous pair's check (else the inf
    # exit fired) and settled ≤ seeds + abort_at for the same reason —
    # so when that bound clears the loop-broadcast gate, the expansion
    # join broadcasts the frontier (e never shuffles) and the
    # anti-join broadcasts the settled set: one shuffle per hop (the
    # distinct) instead of three. Same measured-bound discipline as
    # _shortcut_closure's delta broadcast.
    bcast_ok = abort_at + n_seeds <= _LOOP_BCAST_ROWS

    def _hop(fr, st):
        if bcast_ok:
            fr, st = F.broadcast(fr), F.broadcast(st)
        return (
            fr.join(e, fr["id"] == e["src"])
            .select("s", F.col("sink").alias("id"))
            .distinct()
            .join(st, ["s", "id"], "left_anti")
            .transform(_ckpt_lazy)
        )

    # TWO BFS hops per Spark action (round 13, VERDICT r12 "Next #5"):
    # at estimate scale the frontier frames are tiny (bounded by
    # abort_at rows), so the verdict's wall time is mostly per-job
    # scheduling floor × hop count. The fused pair shares one
    # materializing count: hop 1 is a lazy localCheckpoint (LogicalRDD
    # — both its consumers, hop 2 and the tagged count, read the one
    # persisted copy), and a single groupBy-tag aggregate returns both
    # frontier sizes. Mass accumulation, exits and the cycle-pair
    # correction are value-identical to the one-hop loop (the abort
    # fires at pair granularity — one bounded hop later, same
    # verdict). Measured: graph_scc sf0.1 6.6 → 3.5 s min-of-3
    # worktree A/B (its peel consults the verdict at every rung);
    # at sf1 the hops are no longer pure floor and the fusion is
    # noise-neutral there — the driver path above is what removes the
    # sf1 cost; this loop serves frames past _MASS_DRIVER_EDGES.
    for _ in range(max(1, max_depth // 2)):
        nxt1 = _hop(frontier, settled)
        settled1 = settled.unionByName(nxt1)
        nxt2 = _hop(nxt1, settled1)
        counts = dict(
            nxt1.select(F.lit(1).alias("_h"))
            .unionByName(nxt2.select(F.lit(2).alias("_h")))
            .groupBy("_h").agg(F.count(F.lit(1)).alias("_c"))
            .collect()
        )
        c1, c2 = counts.get(1, 0), counts.get(2, 0)
        if c1 == 0 or c2 == 0:
            done = settled if c1 == 0 else settled1
            cyc = (
                done.join(e, done["id"] == e["src"])
                .filter(F.col("sink") == F.col("s"))
                .select("s").distinct().count()
            )
            return (mass + c1 + cyc) / n_seeds * n_src
        mass += c1 + c2
        if mass > abort_at:
            return float("inf")
        settled = settled1.unionByName(nxt2)
        frontier = nxt2
    return float("inf")


def _probe_next_mass(g: DataFrame, mod: int = _PROBE_MOD) -> int:
    """Unbiased estimate of the NEXT squaring's post-dedup pair count.

    Both seminaive compose terms emit the LEFT side's src as the output
    src, so the next round's output rows for a fixed src depend only on
    that src's rows (left) and the FULL frame (right). Restricting the
    left side to a 1/mod hash sample of src values therefore computes
    the per-src output EXACTLY; scaling the distinct count by mod gives
    an estimator of the full output whose only error is the src
    marginal's sampling noise (~10k sampled srcs at the scales that
    trigger it). Cost ≈ 1/mod of the squaring it predicts — the probe
    pays seconds to decide whether to pay minutes."""
    samp = g.filter(F.pmod(F.xxhash64(F.col("src")), F.lit(mod)) == 0)
    delta = g.filter(F.col("fresh") == 1)
    comp = (
        samp.filter(F.col("fresh") == 1).alias("a")
        .join(g.alias("b"), F.col("a.sink") == F.col("b.src"))
        .select(F.col("a.src").alias("src"), F.col("b.sink").alias("sink"))
        .unionByName(
            samp.alias("a")
            .join(delta.alias("b"), F.col("a.sink") == F.col("b.src"))
            .select(F.col("a.src").alias("src"),
                    F.col("b.sink").alias("sink"))
        )
    )
    u = samp.select("src", "sink").unionByName(comp)
    return u.distinct().count() * mod


def _pred_if_big(frame: DataFrame, n: int,
                 delta_is_all: bool = False) -> int:
    """The compose-size prediction, gated on frame size (see
    _PREDICT_MIN_ROWS): 0 — guard disengaged — below the threshold,
    else one count-table job over ``frame``."""
    if n < _PREDICT_MIN_ROWS:
        return 0
    return _compose_pred(frame, delta_is_all).first()["_pred"]


def _compose_pred(frame: DataFrame, delta_is_all: bool = False) -> DataFrame:
    """1-row ``(_pred long)``: upper bound on the rows the NEXT
    seminaive compose will enumerate — Σ_mid |delta·sink=mid| ×
    |all·src=mid| (plus the symmetric all∘delta term), computed from
    per-mid COUNT tables only, never the pairs themselves. ONE explode
    + ONE groupBy + ONE agg (two shuffle stages of integer counts),
    and only consulted at all above _PREDICT_MIN_ROWS via
    ``_pred_if_big`` — below that the fixed ~0.35 s/round of stage
    scheduling would dominate the loops it protects (measured 40% of
    graph_scc's sf0.1 wall time when it rode every probe).

    Why it exists (sf1 scale evidence, round 8): the materialized-size
    budget checks |G| AFTER a squaring — but the squaring join itself
    can jump from under-budget to billions of enumerated rows inside
    one round (Refers tree + back-edges at 150k nodes: >30 min, 40 GB
    heap). Predicting the enumeration from count tables lets the
    closure bail to the bounded-memory fallback BEFORE paying it."""
    fresh = (F.lit(1) if delta_is_all else F.col("fresh")).cast("long")
    both = frame.select(
        F.explode(F.array(
            F.struct(F.col("src").alias("m"), F.lit(1).alias("o"),
                     fresh.alias("fr")),
            F.struct(F.col("sink").alias("m"), F.lit(0).alias("o"),
                     fresh.alias("fr")),
        )).alias("x")
    ).select("x.m", "x.o", "x.fr")
    per_mid = both.groupBy("m").agg(
        F.sum("o").alias("out_all"),
        F.sum(1 - F.col("o")).alias("in_all"),
        F.sum(F.col("o") * F.col("fr")).alias("out_fresh"),
        F.sum((1 - F.col("o")) * F.col("fr")).alias("in_fresh"),
    )
    # delta∘g pairs through mid = in_fresh·out_all; g∘delta = in_all·
    # out_fresh (the seed round's single compose is the first term —
    # delta_is_all makes them equal, so halve)
    term = (F.col("in_fresh") * F.col("out_all")
            + F.col("in_all") * F.col("out_fresh"))
    if delta_is_all:
        term = F.col("in_all") * F.col("out_all")
    return per_mid.agg(
        F.coalesce(F.sum(term), F.lit(0)).alias("_pred"))


def _propagate_fb(lab: DataFrame, e: DataFrame,
                  max_iter: int = 64) -> DataFrame:
    """BOTH FW-BW fixpoints in one message stream: state is two rows
    per node tagged dir='f' (min reachable-ancestor label, flowing
    src→sink) and dir='b' (min reachable-descendant, sink→src); labels
    are (h, id) structs so the min travels by hash and carries the
    pivot's id. Fusing the directions halves the per-round job count —
    one join+groupBy shuffle per round on the stable (id, dir) key
    moves both fixpoints one step. Per-round checkpoints are LAZY
    (eager=False): lineage still truncates every round (shallow plans,
    no exponential recompute), but only the convergence probe — every
    ``_SCC_PROBE_EVERY`` rounds — actually materializes, so the driver
    pays ~0.25 jobs/round instead of 1.25. Up to 3 no-op rounds of
    waste per probe window is the trade, which wins on fixpoint-deep
    graphs. Returns (id, f, b)."""
    msgs_edges = e.select(
        F.col("src").alias("send"), F.col("sink").alias("recv"),
        F.lit("f").alias("dir"),
    ).unionByName(e.select(
        F.col("sink").alias("send"), F.col("src").alias("recv"),
        F.lit("b").alias("dir"),
    )).transform(_ckpt_lazy)
    cur = lab.select("id", F.lit("f").alias("dir"), "p").unionByName(
        lab.select("id", F.lit("b").alias("dir"), "p")
    ).transform(_ckpt_lazy)
    snap = cur

    def _step(cur):
        msgs = (
            msgs_edges.join(
                cur,
                (msgs_edges["send"] == cur["id"])
                & (msgs_edges["dir"] == cur["dir"]),
            )
            .select(F.col("recv").alias("id"), msgs_edges["dir"], "p")
            .groupBy("id", "dir")
            .agg(F.min("p").alias("nbr"))
        )
        return cur.join(msgs, ["id", "dir"], "left").select(
            "id", "dir",
            F.least(F.col("p"),
                    F.coalesce(F.col("nbr"), F.col("p"))).alias("p"),
        )

    # one propagation step per lazy checkpoint (a fused two-step
    # variant was measured 2× SLOWER at the sf0.1 bench: the doubled
    # plan costs more per materialization than the saved planning)
    for i in range(1, max_iter + 1):
        cur = _step(cur).transform(_ckpt_lazy)
        if i % _SCC_PROBE_EVERY == 0:
            changed = (
                cur.join(snap.withColumnRenamed("p", "p0"), ["id", "dir"])
                .filter(F.col("p") != F.col("p0"))
                .limit(1)
                .count()
            )
            if changed == 0:
                break
            snap = cur
    else:
        raise RuntimeError("min-label propagation did not converge in "
                           f"{max_iter} rounds")
    return (
        cur.groupBy("id")
        .agg(
            F.min(F.when(F.col("dir") == "f", F.col("p"))).alias("f"),
            F.min(F.when(F.col("dir") == "b", F.col("p"))).alias("b"),
        )
    )


def strongly_connected_components(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = 20,
    budget_factor: int = 32, finish_nodes: int | None = None,
) -> DataFrame:
    """SCC labels over directed (src, sink) edges. Returns (id, scc)
    where scc is the component's minimum member id.

    Two-strategy design:

    - **Closure-direct (preferred):** compute the transitive closure
      by path-doubling (_shortcut_closure, O(log diameter) jobs). If
      it completes within the edge budget, SCCs fall out in ONE more
      self-join: u and v are in the same SCC iff both (u,v) and (v,u)
      are reach pairs, so each node's label is the minimum over its
      mutual-reach partners. Near-DAG graphs — referral trees, dedup
      pair graphs, deduplicated web-link graphs, i.e. what a training
      corpus actually yields — have O(V·depth) closures and take this
      path.
    - **Iterative FW-BW peel (fallback, _scc_peel):** when the
      closure blows the budget (dense cyclic graphs), peel with the
      bounded-memory coloring loop — O(V) state per round, one
      shuffle per propagation step — the same structure as the public
      GraphX StronglyConnectedComponents. Slower in rounds, never in
      memory."""
    # no eager checkpoint here: the closure's seed materialization IS
    # the one pass over the edge lineage; the peel fallback checkpoints
    # what it needs itself
    e = edges.select("src", "sink")
    closure, complete = _shortcut_closure(e, budget_factor)
    if not complete:
        return _scc_peel(nodes, e, max_rounds, finish_nodes=finish_nodes)
    return _scc_from_closure(nodes.select("id"), closure)


def _scc_from_closure(ids: DataFrame, closure: DataFrame) -> DataFrame:
    """SCC labels from a COMPLETE reachability closure: u, v share an
    SCC iff both (u,v) and (v,u) are reach pairs, so each node's label
    is the min over its mutual-reach partners (itself when none)."""
    mutual = closure.join(
        closure.select(F.col("sink").alias("src"),
                       F.col("src").alias("sink")),
        ["src", "sink"],
    )
    partner_min = (
        mutual.groupBy("src").agg(F.min("sink").alias("m"))
        .withColumnRenamed("src", "id")
    )
    return ids.join(partner_min, "id", "left").select(
        "id",
        F.least(F.col("id"), F.coalesce(F.col("m"), F.col("id"))
                ).alias("scc"),
    )


def _scc_peel(nodes: DataFrame, e: DataFrame,
              max_rounds: int = 20,
              finish_nodes: int | None = None) -> DataFrame:
    """Iterative FW-BW/coloring SCC peel — the bounded-memory fallback
    for graphs whose reachability closure exceeds the shortcut budget.

    Each round computes f = min reachable-ancestor label and b = min
    reachable-descendant label as (xxhash64(id), id) structs in ONE
    fused fixpoint (_propagate_fb). Three peel rules then fire
    together, all consequences of the FW-BW partition theorem (every
    SCC lies inside one (f, b) class):

    - f == b → the node is in the SCC of that pivot (the pivot is both
      its ancestor and its descendant); whole SCCs share (f, b), so
      they peel atomically;
    - |class| == 1 → the node is a singleton SCC even when f != b
      (its SCC can't extend beyond the class) — this disposes of DAG
      fringes in the first round instead of one layer per round;
    - surviving nodes keep only edges whose endpoints agree on the
      full (f, b) class, so the graph disconnects into shrinking
      independent classes and later fixpoints span class diameters,
      not the whole graph.

    Each round peels at least every class's min-hash pivot, so the
    peel always progresses. Hashed pivot order keeps monotone-id
    graphs from degrading to one SCC per round. Labels are then
    canonicalized to the component minimum so both strategies return
    identical frames.

    A TRIM pre-pass (the standard FW-BW companion step — Slota,
    Rajamanickam & Madduri, "BFS and Coloring-Based Parallel
    Algorithms for Strongly Connected Components", IPDPS 2014) first
    peels nodes with zero in- or out-degree in the residual graph
    iteratively: none can lie on a cycle, so each is a singleton SCC.
    Trim rounds are two semi-joins on node id — ~20× cheaper than an
    FB fixpoint round — and on tree-plus-cycles graphs (the sf1 scale
    fixture) they dispose of the entire acyclic fringe so the FB
    fixpoints run only on the small cyclic core (measured: the first
    FB fixpoint alone cost 45 s at 150k nodes pre-trim)."""
    remaining = nodes.select("id").transform(_ckpt_eager)
    parts: list[DataFrame] = []
    with _loop_regime(nodes.sparkSession) as size_shuffle:
        remaining, e = _scc_trim(remaining, e, parts, size_shuffle)
        _scc_peel_rounds(remaining, e, parts, max_rounds, size_shuffle,
                         finish_nodes=finish_nodes)
    if not parts:
        return nodes.sparkSession.createDataFrame(
            [], "id long, scc long")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    canon = out.groupBy("scc").agg(F.min("id").alias("cmin"))
    return out.join(canon, "scc").select("id", F.col("cmin").alias("scc"))


def _scc_trim(remaining, e, parts, size_shuffle, max_rounds: int = 256):
    """Iterative trim (see _scc_peel): peel nodes whose residual in- or
    out-degree is zero as singleton SCCs until a fixpoint. Each round
    is two distinct projections + semi/anti joins on node id and ONE
    count probe; rounds = the graph's trim depth (tree height for the
    acyclic fringe). Returns the (remaining, edges) cyclic core.

    Shuffle sizing rides the EDGE count, not the node residual (ADVICE
    r8 #3): the dominant per-round jobs — the two distinct projections
    and the two edge semi-joins — shuffle the edge frame, which on the
    high-fanout graphs trim targets can be orders of magnitude larger
    than the node set; sizing on nodes alone under-partitioned them
    with AQE off. The per-round edge count() doubles as the lazy
    checkpoint's materializing action (the next round's scans reuse the
    materialized RDD), so it promotes work that was due anyway rather
    than adding a pass."""
    n_rem = remaining.count()
    n_edge = e.count()
    for _ in range(max_rounds):
        if n_rem == 0:
            return remaining, e
        size_shuffle(max(n_rem, n_edge))
        srcs = e.select(F.col("src").alias("id")).distinct()
        sinks = e.select(F.col("sink").alias("id")).distinct()
        keep = (
            remaining.join(srcs, "id", "semi")
            .join(sinks, "id", "semi")
            .transform(_ckpt_lazy)
        )
        # Round 13 probe: fusing the two per-round count jobs (n_keep +
        # n_edge) into one tagged union count was tried and MEASURED
        # SLOWER at sf1 (trim 11.1 → 12.5 s, graph_scc 31.4 → 33.4 s):
        # the fused job serializes keep's and the restriction's
        # materialization and pays a deeper plan, the same failure mode
        # as _propagate_fb's rejected two-step fusion. The two-job
        # shape below stands.
        n_keep = keep.count()
        if n_keep == n_rem:
            return remaining, e
        parts.append(
            remaining.join(keep, "id", "anti")
            .select("id", F.col("id").alias("scc"))
            .transform(_ckpt_lazy)
        )
        e = (
            e.join(keep.select(F.col("id").alias("src")), "src", "semi")
            .join(keep.select(F.col("id").alias("sink")), "sink", "semi")
            .select("src", "sink")
            .transform(_ckpt_lazy)
        )
        n_edge = e.count()
        remaining, n_rem = keep, n_keep
    return remaining, e  # depth cap: peel handles whatever is left


# residual size below which the peel hands the remainder to the
# closure-direct path: after trim + a few FB rounds the class-
# restricted residual is a sliver, and finishing it with O(log d)
# closure jobs beats more FB fixpoints (measured at the sf1 scale
# fixture: the 998-node tail round cost more than the whole peel to
# that point). A closure attempt that still blows its budget or
# compose prediction bails in bounded work and FB peeling resumes.
_SCC_FINISH_NODES = 4096
# re-run the peel's closure-mass verdict only after the class
# restriction shrank the residual edge frame geometrically (≤0.8× the
# count at the last doomed verdict) — see _scc_peel_rounds round-13 note
_SCC_RECHECK_SHRINK = 0.8
# ADVICE r9 #2: the peel's mass-verdict budget and the routed closure
# attempt's own budget MUST be the same number — if they diverge, the
# verdict can say "fits" while the attempt trips (or vice versa). One
# constant feeds both (the verdict at _scc_peel_rounds and the
# _shortcut_closure call it routes to).
_PEEL_BUDGET_FACTOR = 32


def _scc_peel_rounds(remaining, e, parts, max_rounds, size_shuffle,
                     finish_nodes: int | None = None):
    """Peel loop body (see _scc_peel): mutates ``parts`` in place so the
    caller can union outside the loop regime. ``finish_nodes``
    overrides _SCC_FINISH_NODES (0 disables the closure-direct finish —
    the oracle-gated peel fixture uses this so the FB fixpoint leg
    stays driver-verified instead of being short-circuited)."""
    cutoff = _SCC_FINISH_NODES if finish_nodes is None else finish_nodes
    doomed_at_edges = None
    for _ in range(max_rounds):
        n_remaining = remaining.count()
        if n_remaining == 0:
            return
        size_shuffle(n_remaining)
        try_closure = n_remaining <= cutoff
        if not try_closure and cutoff:
            # Round 9: the node-count cutoff alone leaves big-but-easy
            # residuals (the sf1 trim core: ~30k nodes of short mutual
            # chains, closure mass ~15 pairs/node) paying FB fixpoints
            # (~35s at sf1) when O(log depth) closure squarings finish
            # them in seconds. One sampled-BFS mass estimate — the same
            # estimator the top-level strategy pick uses — decides.
            # Round 13 (VERDICT r12 "Next #5"): the verdict is
            # re-evaluated after any round whose class restriction cut
            # the edge frame below _SCC_RECHECK_SHRINK × the count at
            # the last DOOMED verdict — "checked once" left the sf1
            # residual paying an extra FB fixpoint when the first
            # round's restriction had already made the closure finish
            # viable. Measured (same-process alternated A/B at sf1,
            # _SCC_RECHECK_SHRINK 0.8 vs disabled): graph_scc
            # 32.1/35.5 s vs 45.5/45.1 s — the re-checked verdict
            # routes the residual to a ~3 s closure finish instead of
            # a ~12 s propagate round. A re-check only fires on a
            # geometric edge shrink, so a peel whose restriction never
            # bites pays the estimator exactly once, as before; a
            # fit-verdict that still fails pays the attempt's own
            # bounded guards, then FB resumes.
            # finish_nodes=0 disables this with the cutoff, keeping
            # the oracle-gated FB-leg fixture on the FB path.
            n_e = e.count()
            if (doomed_at_edges is None
                    or n_e <= _SCC_RECHECK_SHRINK * doomed_at_edges):
                budget = _PEEL_BUDGET_FACTOR * max(n_e, 1)
                try_closure = not _closure_mass_doomed(
                    e, budget, n_edges=n_e)
                if not try_closure:
                    doomed_at_edges = n_e
        if try_closure:
            # skip_mass_check: this round's verdict (or the ≤cutoff
            # size) already routed here — re-estimating inside the
            # attempt would double the cost and, on marginal cores,
            # could DISAGREE with the verdict that sent us (measured
            # at sf3: two back-to-back verdicts on the same core,
            # ~80s, opposite answers at the sampling-noise boundary)
            closure, complete = _shortcut_closure(
                e, budget_factor=_PEEL_BUDGET_FACTOR,
                skip_mass_check=True)
            if complete:
                parts.append(_scc_from_closure(remaining, closure))
                return
            # residual still closure-hostile: keep peeling
        lab = remaining.select(
            "id", F.struct(F.xxhash64("id").alias("h"),
                           F.col("id").alias("pid")).alias("p")
        )
        cls = (
            _propagate_fb(lab, e)
            .withColumn(
                "n", F.count(F.lit(1)).over(
                    W.partitionBy("f", "b")
                )
            )
            .transform(_ckpt_lazy)
        )
        peel = (F.col("f") == F.col("b")) | (F.col("n") == 1)
        sccs = (
            cls.filter(peel)
            .select(
                "id",
                F.when(F.col("f") == F.col("b"), F.col("f.pid"))
                .otherwise(F.col("id")).alias("scc"),
            )
            .transform(_ckpt_lazy)
        )
        parts.append(sccs)
        survivors = cls.filter(~peel).transform(_ckpt_lazy)
        remaining = survivors.select("id")
        # class restriction: only same-(f,b)-class edges can sit inside
        # a still-unresolved SCC. Node-sized side tables: plain
        # equi-joins on the stable src/sink partitioning (broadcasting
        # them would ship the whole node set to every executor at
        # scale).
        lhs = survivors.select(F.col("id").alias("src"),
                               F.col("f").alias("_fs"),
                               F.col("b").alias("_bs"))
        rhs = survivors.select(F.col("id").alias("sink"),
                               F.col("f").alias("_ft"),
                               F.col("b").alias("_bt"))
        e = (
            e.join(lhs, "src")
            .join(rhs, "sink")
            .filter((F.col("_fs") == F.col("_ft"))
                    & (F.col("_bs") == F.col("_bt")))
            .select("src", "sink")
            .transform(_ckpt_lazy)
        )
    raise RuntimeError(f"SCC did not converge in {max_rounds} rounds")


def _distance_closure(e: DataFrame, budget_factor: int = 32,
                      max_squarings: int = 12,
                      materialize: bool = False
                      ) -> tuple[DataFrame, bool]:
    """Min-plus path-doubling: D ← min(D, D∘D) with dist summed along
    the composition — k squarings give exact shortest distances for
    paths up to 2^k edges, fixpoint = all-pairs shortest distances.
    Same O(log diameter) job count and the same edge budget rationale
    as _shortcut_closure (near-DAG closures are O(V·depth); dense
    graphs must use per-source frontier BFS instead). Fixpoint test
    compares (pair count, total distance) — both monotone, so equality
    means no pair appeared and no distance improved. Returns
    ((src, sink, dist), complete); self-pairs excluded from the seed so
    dist ≥ 1 (cycles may introduce them later; they carry the true
    cycle length).

    Same two per-round cost cuts as _shortcut_closure: seminaive delta
    composition (only pairs whose distance appeared or improved last
    round compose — exactness by the same path-splitting argument, with
    "fresh" meaning the half's final exact value just arrived) and the
    non-eager checkpoint whose materializing action IS the fixpoint
    probe (one job per squaring). Runs under _loop_regime;
    ``materialize=True`` eager-checkpoints the result BEFORE the regime
    exits, so a closure that outlives the call (the per-app cache)
    materializes under the loop's shuffle shape, not the restored
    session conf (the _loop_regime escape caveat)."""
    def _finish(frame, complete):
        out = frame.select("src", "sink", "dist")
        if materialize and complete:
            out = out.transform(_ckpt_eager)
        return out, complete

    with _loop_regime(e.sparkSession) as size_shuffle:
        # seed covers dist ≤ 2 exactly (min over the 1-hop ∪ 2-hop
        # union): the first squaring rides the seed materialization.
        # The edge dedup runs under the SESSION regime (the input may
        # be arbitrarily large); its count sizes the loop regime.
        d0 = (
            e.select("src", "sink").distinct()
            .select("src", "sink", F.lit(1).cast("long").alias("dist"))
            .transform(_ckpt_lazy)
        )
        n_e = d0.agg(F.count(F.lit(1))).first()[0]
        budget = budget_factor * max(n_e, 1)
        if (n_e >= _MASS_ESTIMATE_MIN_EDGES
                and _closure_mass_doomed(d0, budget, n_edges=n_e)):
            # sampled-BFS mass estimate: the finished distance closure
            # cannot fit — skip the attempt (see _closure_mass_doomed)
            return _finish(d0, False)
        if _pred_if_big(d0, n_e, delta_is_all=True) > _PREDICT_SLACK * budget:
            # even the dist≤2 seed fold would enumerate a blowup —
            # bail to the bounded-memory per-seed path with dist≤1
            return _finish(d0, False)
        size_shuffle(n_e)
        # hint only the join's build side (hinting d0 itself would dangle
        # on the union below and log a hint error)
        d0b = F.broadcast(d0) if n_e < _LOOP_BCAST_ROWS else d0
        two0 = (
            d0b.alias("a")
            .join(d0.alias("b"), F.col("a.sink") == F.col("b.src"))
            .select(F.col("a.src").alias("src"),
                    F.col("b.sink").alias("sink"),
                    (F.col("a.dist") + F.col("b.dist")).alias("dist"))
        )
        d = (
            d0.unionByName(two0)
            .groupBy("src", "sink").agg(F.min("dist").alias("dist"))
            .withColumn("fresh", F.lit(1))
            .transform(_ckpt_lazy)
        )
        n = d.agg(F.count(F.lit(1))).first()[0]
        pred = _pred_if_big(d, n)
        n_delta = n
        # budget on the RAW distinct-edge count (ADVICE r6 #2: basing
        # it on the post-dist≤2-fold row count silently ~doubled the
        # effective budget, tripping the bounded-memory fallback later
        # than budget_factor advertises); set above the seed fold
        for i in range(max_squarings):
            if pred > _PREDICT_SLACK * budget:
                # next compose would enumerate a blowup before the
                # materialized budget could see it (see _compose_pred)
                return _finish(d, False)
            size_shuffle(n)
            delta = d.filter(F.col("fresh") == 1)
            if n_delta < _LOOP_BCAST_ROWS:
                delta = F.broadcast(delta)
            compose = [
                delta.alias("a")
                .join(d.alias("b"), F.col("a.sink") == F.col("b.src"))
                .select(F.col("a.src").alias("src"),
                        F.col("b.sink").alias("sink"),
                        (F.col("a.dist") + F.col("b.dist")).alias("dist")),
            ]
            if i > 0:  # round 1: delta == d, one composition covers both
                compose.append(
                    d.alias("a")
                    .join(delta.alias("b"), F.col("a.sink") == F.col("b.src"))
                    .select(F.col("a.src").alias("src"),
                            F.col("b.sink").alias("sink"),
                            (F.col("a.dist") + F.col("b.dist")).alias("dist"))
                )
            two = compose[0]
            for c in compose[1:]:
                two = two.unionByName(c)
            d2 = (
                d.select("src", "sink", "dist", F.col("dist").alias("_old"))
                .unionByName(two.select(
                    "src", "sink", "dist",
                    F.lit(None).cast("long").alias("_old")
                ))
                .groupBy("src", "sink")
                .agg(F.min("dist").alias("dist"), F.min("_old").alias("_old"))
                .select(
                    "src", "sink", "dist",
                    F.when(
                        F.col("_old").isNull()
                        | (F.col("dist") < F.col("_old")), 1
                    ).otherwise(0).alias("fresh"),
                )
                .transform(_ckpt_lazy)
            )
            row = d2.agg(F.count(F.lit(1)), F.sum("fresh")).first()
            n2, n_fresh = row[0], row[1]
            # None on an empty frame = converged (see _shortcut_closure)
            if n2 == 0 or not n_fresh:
                return _finish(d, True)
            pred = _pred_if_big(d2, n2)
            grow = n2 / max(n, 1)
            d, n, n_delta = d2, n2, n_fresh
            if n > budget:
                return _finish(d, False)
            if (n >= _PREDICT_MIN_ROWS and grow >= _DOOMED_GROWTH
                    and n * grow > budget
                    and _probe_next_mass(d) > budget):
                # doomed next squaring (sampled dry run): see
                # _shortcut_closure
                return _finish(d, False)
        return _finish(d, False)


CLOSENESS_SEEDS = 8
# BFS horizon for the closeness budget-trip fallback (ADVICE r8 #2):
# multi_source_distances fails LOUD past its horizon (a silent cut
# would under-report sum_dist for every seed that reaches beyond it),
# so the closeness query threads a horizon deep enough for any graph
# the budget-tripped closure could plausibly hand it. 240 hops ≈ 4× the
# default BFS horizon; a Refers chain deeper than that raises with the
# instruction to raise this constant rather than return wrong sums.
CLOSENESS_MAX_DEPTH = 240


# (app, sf_dir) → (distance-closure frame, complete) for the Refers
# graph — closeness AND betweenness consume the identical closure, so
# it is built once per app and shared, the same session-artifact
# discipline as the MinHash signature cache (operators/dedup.py).
_REFERS_CLOSURE_CACHE: dict[tuple[str, str], tuple[DataFrame, bool]] = {}


def _refers_edges(g):
    nodes = g.nodes["Customer"]
    key = nodes.select("GlobalNodeId", "c_custkey")
    return (
        g.edge_with_id("Customer.Refers")
        .join(key.select(F.col("GlobalNodeId").alias("src"),
                         F.col("c_custkey").alias("src_key")), "src")
        .join(key.select(F.col("GlobalNodeId").alias("sink"),
                         F.col("c_custkey").alias("sink_key")), "sink")
        .select(F.col("src_key").alias("src"),
                F.col("sink_key").alias("sink"))
    )


def _cached_refers_closure(spark, sf_dir: str, g) -> tuple[DataFrame, bool]:
    from graphview_spark.plans import lazy as _lazy

    if _lazy.is_lazy():  # plan audit: full pipeline, no cache, no jobs
        return _distance_closure(_refers_edges(g))
    ckey = (spark.sparkContext.applicationId, sf_dir)
    hit = _REFERS_CLOSURE_CACHE.get(ckey)
    if hit is None:
        from graphview_spark.session import evict_dead_app_entries

        evict_dead_app_entries(_REFERS_CLOSURE_CACHE, ckey[0])
        D, complete = _distance_closure(_refers_edges(g), materialize=True)
        hit = (D, complete)
        _REFERS_CLOSURE_CACHE[ckey] = hit
    return hit


def q_graph_closeness(spark, sf_dir: str) -> DataFrame:
    """Closeness centrality for the first 8 customers over the Refers
    tree: n_reach (reachable nodes), sum_dist (total hop distance) and
    closeness = n_reach / sum_dist, computed from one min-plus
    distance closure (exact shortest paths in O(log diameter) jobs,
    edge-budget-guarded) instead of one BFS per seed. The ratio is
    rounded with the integer round-half-up identity so both engines
    agree at decimal halfway points. At 100 TB the standard posture is
    the same: seed-sampled closeness over a distance table — built with
    ONE batched (seed, node)-keyed BFS when the closure budget trips
    (multi_source_distances: job count = graph depth, independent of
    seed count; no per-seed driver loop)."""
    from graphview_spark.graph_queries import tpch_graph

    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes["Customer"]
    key = nodes.select("GlobalNodeId", "c_custkey")
    D, complete = _cached_refers_closure(spark, sf_dir, g)
    if complete:
        seed_rows = D.filter(F.col("src") <= CLOSENESS_SEEDS)
    else:  # bounded-memory fallback: one batched multi-seed BFS
        seed_ids = (
            nodes.filter(F.col("c_custkey") <= CLOSENESS_SEEDS)
            .select("GlobalNodeId")
        )  # same seed set as the closure path's src <= CLOSENESS_SEEDS
        sp = multi_source_distances(
            seed_ids, g.edge_with_id("Customer.Refers"),
            max_depth=CLOSENESS_MAX_DEPTH)
        seed_rows = (
            sp.filter(F.col("dist") > 0)
            .join(key.select(F.col("GlobalNodeId").alias("s"),
                             F.col("c_custkey").alias("src")), "s")
            .join(key.select(F.col("GlobalNodeId").alias("id"),
                             F.col("c_custkey").alias("sink")), "id")
            .select(F.col("src").cast("long").alias("src"),
                    F.col("sink").alias("sink"),
                    F.col("dist").cast("long").alias("dist"))
        )
    # every sampled seed emits a row, even with zero outgoing reach
    # (left join from the seed list; closeness NULL when sum_dist=0 —
    # mirrored by the oracle's CASE guard), so the query is not
    # silently coupled to the tree shape of the tested data
    seeds = (
        nodes.filter(F.col("c_custkey") <= CLOSENESS_SEEDS)
        .select(F.col("c_custkey").cast("long").alias("src"))
    )
    agg = (
        seeds.join(
            seed_rows.groupBy("src").agg(
                F.count(F.lit(1)).alias("n_reach"),
                F.sum("dist").alias("sum_dist"),
            ),
            "src", "left",
        )
        .select(
            "src",
            F.coalesce(F.col("n_reach"), F.lit(0).cast("long"))
            .alias("n_reach"),
            F.coalesce(F.col("sum_dist"), F.lit(0).cast("long"))
            .alias("sum_dist"),
        )
    )
    scale = 10 ** 6
    closeness = F.when(
        F.col("sum_dist") > 0,
        F.floor((2 * scale * F.col("n_reach") + F.col("sum_dist"))
                / (2 * F.col("sum_dist"))) / F.lit(float(scale)),
    )
    return agg.select(
        F.col("src").alias("c_custkey"), "n_reach", "sum_dist",
        closeness.alias("closeness"),
    )


def _oracle_closeness() -> str:
    from graphview_spark.graph_queries import _ORACLE_REFERS

    scale = 10 ** 6
    ratio = (f"CASE WHEN sum_dist > 0 THEN "
             f"((({2 * scale} * n_reach + sum_dist) // (2 * sum_dist))"
             f" / {scale}.0) END")
    return f"""
WITH RECURSIVE refers AS ({_ORACLE_REFERS}),
bfs AS (
  SELECT c_custkey AS seed, c_custkey AS id, 0 AS dist
  FROM customer WHERE c_custkey <= {CLOSENESS_SEEDS}
  UNION ALL
  SELECT b.seed, e.sink, b.dist + 1 FROM bfs b JOIN refers e ON e.src = b.id
),
agg AS (
  SELECT seed, count(*) - 1 AS n_reach, sum(dist)::BIGINT AS sum_dist
  FROM bfs GROUP BY seed
)
SELECT seed AS c_custkey, n_reach, sum_dist, {ratio} AS closeness
FROM agg
"""


def multi_source_levels(
    seeds: DataFrame, edges: DataFrame, max_depth: int = 60
) -> tuple[list[DataFrame], DataFrame]:
    """Batched multi-source BFS: ALL seeds advance together as one
    (seed, node)-keyed frontier, so the job count is the graph depth
    regardless of how many seeds are sampled, and per-round work is one
    shuffle on (seed, node). Returns ``(levels, edges)`` where
    ``levels[d]`` is the frame of (s, id, sigma) settled at hop d
    (sigma = number of shortest s→id paths, summed where fronts meet)
    and ``edges`` is the deduplicated, checkpointed (src, sink) frame —
    returned so callers (the Brandes reverse sweep) reuse the
    materialized lineage instead of re-scanning.

    Shared forward pass for ``brandes_betweenness`` AND the
    bounded-memory closeness fallback (``multi_source_distances``) —
    memory is bounded by the per-level frontier, not an all-pairs
    closure. Raises if the frontier is still live after ``max_depth``
    levels: a silent cut would undercount distances/δ for every node
    beyond the horizon."""
    sid = seeds.columns[0]
    spark = seeds.sparkSession
    with _loop_regime(spark) as size_shuffle:
        edges = (
            edges.select("src", "sink").distinct()
            .transform(_ckpt_eager)
        )
        size_shuffle(edges.count())
        lvl = (
            seeds.select(F.col(sid).alias("s"))
            .distinct()
            .select("s", F.col("s").alias("id"),
                    F.lit(1.0).alias("sigma"))
            .transform(_ckpt_eager)
        )
        levels = [lvl]
        # settled = plain union of already-checkpointed level frames:
        # no checkpoint of its own (the lineage is just LogicalRDD
        # unions, nothing recomputes), and the per-level count() probe
        # doubles as the checkpoint-materializing action — ONE job per
        # BFS level (count computes every partition, so the lazy
        # checkpoint is fully cached; isEmpty would leave partitions
        # unmaterialized)
        settled = lvl.select("s", "id")
        for _ in range(max_depth):
            frontier = levels[-1]
            nxt = (
                frontier.join(edges, frontier["id"] == edges["src"])
                .select("s", F.col("sink").alias("id"), "sigma")
                .groupBy("s", "id")
                .agg(F.sum("sigma").alias("sigma"))
                .join(settled, ["s", "id"], "left_anti")
                .transform(_ckpt_lazy)
            )
            if nxt.count() == 0:
                return levels, edges
            levels.append(nxt)
            settled = settled.unionByName(nxt.select("s", "id"))
    raise ValueError(
        f"multi_source_levels: BFS frontier still live after "
        f"max_depth={max_depth} levels — the graph is deeper "
        "than the horizon; raise max_depth"
    )


def multi_source_distances(
    seeds: DataFrame, edges: DataFrame, max_depth: int = 60
) -> DataFrame:
    """Hop distances from every seed as ONE batched (seed, node) BFS —
    (s, id, dist) for each reachable pair, dist 0 at the seed itself.
    This is the bounded-memory leg closeness degrades to when the
    distance-closure budget trips: job count is the graph depth, not
    depth × seed count (the per-seed driver loop this replaced paid
    full job-submission latency per seed)."""
    levels, _ = multi_source_levels(seeds, edges, max_depth=max_depth)
    out = levels[0].select("s", "id", F.lit(0).cast("long").alias("dist"))
    for d, lvl in enumerate(levels[1:], start=1):
        out = out.unionByName(
            lvl.select("s", "id", F.lit(d).cast("long").alias("dist"))
        )
    return out


def brandes_betweenness(
    seeds: DataFrame, edges: DataFrame, max_depth: int = 60
) -> DataFrame:
    """σ-weighted Brandes betweenness restricted to a sampled source
    set (Brandes 2001, "A Faster Algorithm for Betweenness
    Centrality"), with ALL sources advanced together as one
    (seed, node)-keyed frontier — not one driver loop per seed, so the
    round count is the graph depth regardless of how many seeds are
    sampled, and per-round work is one shuffle on (seed, node).

    Forward pass: multi-source BFS carrying σ (the number of shortest
    s→v paths, summed across predecessors when fronts meet — the
    groupBy below). Reverse pass: walk the recorded levels deepest-
    first accumulating δ_s(v) = Σ_{w ∈ succ(v)} (σ_sv/σ_sw)(1 + δ_s(w))
    where succ(v) = BFS-tree successors (edge v→w with w settled one
    level deeper for the same seed). Betweenness(v) = Σ_s δ_s(v), the
    source level excluded.

    Memory is bounded by the per-level frontier (≤ |seeds|·|V| rows
    total across levels, in practice far less), NOT by the all-pairs
    distance closure — this is the bounded-memory leg that
    ``seed_betweenness`` degrades to when the closure budget trips,
    mirroring q_graph_closeness's batched multi-seed-BFS fallback
    (both ride ``multi_source_levels``). Reference
    analog: iterative computation via T-SQL WHILE loops is GraphView's
    advertised path for algorithms (/root/reference/README.md:16).

    ``seeds``: one-column DataFrame of source node ids. ``edges``:
    (src, sink) directed. Returns (v, betweenness double) for every v
    with δ > 0. On unique-shortest-path graphs every σ is 1 and each
    δ_s(v) is the integer count of targets behind v, so the result
    coincides exactly with the closure pair count; on multi-path
    graphs it is the σ-fractional centrality (property-tested against
    brute-force Brandes in tests/test_property_closure.py)."""
    spark = seeds.sparkSession
    # forward pass: shared batched multi-seed BFS (also the closeness
    # fallback's distance engine); raises rather than silently
    # undercounting past max_depth
    levels, edges = multi_source_levels(seeds, edges, max_depth=max_depth)
    # reverse sweep: δ at the deepest level is 0; each shallower level
    # joins its BFS-tree successors one level down. Lazy checkpoints
    # keep the δ-chain's plan linear; the caller's single action
    # materializes the chain (outside the loop regime: one analytical
    # plan where AQE earns its keep — the loop-regime caveat applies
    # only to the per-level probe jobs above).
    zero = F.lit(0.0).alias("delta")
    deltas = levels[-1].select("s", "id", zero)
    acc = [deltas] if len(levels) > 1 else []
    for d in range(len(levels) - 2, -1, -1):
        cur = levels[d]
        succ = (
            levels[d + 1].join(deltas, ["s", "id"])
            .select("s", F.col("id").alias("w"),
                    F.col("sigma").alias("sigma_w"), "delta")
        )
        contrib = (
            cur.join(edges, cur["id"] == edges["src"])
            .select("s", "id", "sigma", F.col("sink").alias("w"))
            .join(succ, ["s", "w"])
            .groupBy("s", "id")
            .agg(F.sum(
                F.col("sigma") / F.col("sigma_w") * (1 + F.col("delta"))
            ).alias("delta"))
        )
        deltas = (
            cur.select("s", "id")
            .join(contrib, ["s", "id"], "left")
            .select("s", "id", F.coalesce("delta", F.lit(0.0)).alias("delta"))
            .transform(_ckpt_lazy)
        )
        if d >= 1:  # level 0 is the sources themselves: excluded
            acc.append(deltas)
    if not acc:
        return spark.createDataFrame([], "v long, betweenness double")
    out = acc[0]
    for a in acc[1:]:
        out = out.unionByName(a)
    return (
        out.groupBy(F.col("id").alias("v"))
        .agg(F.sum("delta").alias("betweenness"))
        .filter(F.col("betweenness") > 0)
    )


def betweenness(
    seeds: DataFrame, edges: DataFrame, variant: str = "brandes",
    budget_factor: int = 32, max_depth: int = 60,
) -> DataFrame:
    """Public seed-sampled betweenness surface.

    variant="brandes" (default): σ-weighted Brandes via batched
    multi-seed BFS (``brandes_betweenness``) — (v, betweenness double).
    variant="stress": pair-count through-node centrality from the
    min-plus distance closure (``seed_betweenness``); when the closure
    edge budget trips, degrades to the Brandes leg (documented there) —
    (v, betweenness long). The gate queries use "stress" on graphs with
    unique shortest paths, where the two variants coincide exactly."""
    if variant == "brandes":
        return brandes_betweenness(seeds, edges, max_depth=max_depth)
    if variant != "stress":
        raise ValueError(f"unknown betweenness variant: {variant!r}")
    D, complete = _distance_closure(edges, budget_factor=budget_factor)
    return seed_betweenness(
        D, seeds, budget_ok=complete, edges=edges, seeds=seeds,
        max_depth=max_depth)


def seed_betweenness(
    d_all: DataFrame, seeds_pred, budget_ok: bool = True,
    edges: DataFrame | None = None, seeds: DataFrame | None = None,
    max_depth: int = 60,
) -> DataFrame:
    """Seed-sampled betweenness from a complete distance closure: node
    v lies on a shortest s→t path iff dist(s,v) + dist(v,t) = dist(s,t)
    (v ∉ {s, t}); count qualifying (s, t) pairs per v over sampled
    sources s. On unique-shortest-path graphs (trees, forests of
    referral/ownership edges — the shapes these queries derive) this IS
    Brandes betweenness restricted to sampled sources; with multiple
    shortest paths it counts each pair once per through-node (the
    stress-indicator variant) rather than σ-fractionally — the
    σ-weighted refinement needs per-pair path counts, which the closure
    deliberately does not carry. ``betweenness(variant="brandes")`` is
    the σ-weighted alternative.

    ``seeds_pred`` is either a Column-predicate callable or a
    one-column seed DataFrame (filtered via semi-join — no literal
    predicate needed, no driver collect).

    Bounded-memory fallback: when ``budget_ok`` is False (the closure
    edge budget tripped, so ``d_all`` is incomplete and the pair count
    would silently undercount), and ``edges``+``seeds`` are provided,
    the computation degrades to ``brandes_betweenness`` — per-level
    BFS memory instead of all-pairs closure memory, mirroring
    q_graph_closeness's batched multi-seed-BFS fallback. The Brandes
    result is
    rounded to the closure path's long schema; on unique-shortest-path
    graphs the values are identical integers, on multi-path graphs the
    fallback reports the (rounded) σ-weighted centrality rather than
    the stress pair count — the principled quantity, noted here so the
    semantics switch is explicit.

    Plan: two joins of the seed-filtered closure slice against the full
    closure — (s,v) ⋈ᵥ (v,t) ⋈ₛ,ₜ (s,t) — then one count per v. Join
    volume is Σᵥ reach_in_from_seeds(v)·reach_out(v), bounded by the
    closure budget that produced ``d_all``."""
    if not budget_ok:
        if edges is None or seeds is None:
            raise ValueError(
                "seed_betweenness: the closure edge budget tripped and "
                "no (edges, seeds) were provided for the bounded-memory "
                "Brandes fallback — pass them, or rebuild the closure "
                "with a larger budget_factor"
            )
        bt = brandes_betweenness(seeds, edges, max_depth=max_depth)
        return bt.select(
            "v", F.round("betweenness").cast("long").alias("betweenness"))

    def _seed_slice(frame):
        if callable(seeds_pred):
            return frame.filter(seeds_pred(F.col("src")))
        s = seeds_pred.select(
            F.col(seeds_pred.columns[0]).alias("src")).distinct()
        return frame.join(s, "src", "left_semi")

    # (s, s, L) closure self-pairs — cycles introduce them — are NOT
    # Brandes targets or through-nodes (its BFS settles the source at
    # distance 0 and never revisits), so both seed slices exclude them;
    # without this guard the stress count and the Brandes fallback
    # disagree on cyclic graphs even with unique shortest paths.
    no_self = F.col("sink") != F.col("src")
    sv = _seed_slice(d_all).filter(no_self).select(
        F.col("src").alias("s"), F.col("sink").alias("v"),
        F.col("dist").alias("d1"),
    )
    st = _seed_slice(d_all).filter(no_self).select(
        F.col("src").alias("s"), F.col("sink").alias("t"),
        F.col("dist").alias("d"),
    )
    vt = d_all.select(
        F.col("src").alias("v"), F.col("sink").alias("t"),
        F.col("dist").alias("d2"),
    )
    through = (
        sv.join(vt, "v")
        .join(st, ["s", "t"])
        .filter(F.col("d1") + F.col("d2") == F.col("d"))
        .filter(F.col("v") != F.col("t"))  # v == s excluded above: d1 ≥ 1
    )
    return through.groupBy("v").agg(
        F.count(F.lit(1)).alias("betweenness"))


def q_graph_betweenness(spark, sf_dir: str) -> DataFrame:
    """Betweenness for the Refers tree's interior nodes w.r.t. the
    CLOSENESS_SEEDS sampled sources — the remaining classic centrality
    (degree/closeness/PageRank/HITS/k-core live elsewhere in the
    family). Reuses the same min-plus distance closure as
    q_graph_closeness; paths in the tree are unique, so the count is
    exact Brandes betweenness for the seed set (see seed_betweenness).
    Output: every node on ≥1 seed-pair shortest path, with its pair
    count."""
    from graphview_spark.graph_queries import tpch_graph

    g = tpch_graph(spark, sf_dir)
    D, complete = _cached_refers_closure(spark, sf_dir, g)
    edges = _refers_edges(g)
    seeds = edges.select("src").filter(
        F.col("src") <= CLOSENESS_SEEDS).distinct()
    # ADVICE r9 #1: the Brandes fallback consumes the SAME
    # budget-tripped Refers closure as closeness, so it needs the same
    # deepened horizon — a 61-240-hop Refers chain must degrade loudly
    # in NEITHER query, not just closeness.
    bt = seed_betweenness(
        D, lambda c: c <= CLOSENESS_SEEDS, budget_ok=complete,
        edges=edges, seeds=seeds, max_depth=CLOSENESS_MAX_DEPTH)
    return bt.select(
        F.col("v").alias("c_custkey"), "betweenness",
    )


def _oracle_betweenness() -> str:
    from graphview_spark.graph_queries import _ORACLE_REFERS

    return f"""
WITH RECURSIVE refers AS ({_ORACLE_REFERS}),
d AS (
  SELECT src, sink, 1 AS dist FROM refers
  UNION
  SELECT d.src, e.sink, d.dist + 1 FROM d JOIN refers e ON e.src = d.sink
),
sv AS (SELECT src AS s, sink AS v, dist AS d1 FROM d
       WHERE src <= {CLOSENESS_SEEDS}),
st AS (SELECT src AS s, sink AS t, dist AS dd FROM d
       WHERE src <= {CLOSENESS_SEEDS}),
vt AS (SELECT src AS v, sink AS t, dist AS d2 FROM d)
SELECT sv.v AS c_custkey, count(*) AS betweenness
FROM sv JOIN vt USING (v) JOIN st ON st.s = sv.s AND st.t = vt.t
WHERE sv.d1 + vt.d2 = st.dd AND sv.v <> vt.t
GROUP BY sv.v
"""


def q_graph_scc(spark, sf_dir: str) -> DataFrame:
    """SCC summary over the Refers tree plus deterministic back-edges
    (every edge whose child key is divisible by 5 also gets the reverse
    direction) — the reversals thread mutual chains k ↔ 2k ↔ 4k…
    through the heap-shaped tree, so nontrivial SCCs exist at every
    scale. Output is label-agnostic (counts and sizes only).

    Oracle note: on THIS derived graph, every directed cycle descends a
    tree path and must climb back up the same unique parent chain, so
    all cycle edges are bidirectional — hence SCCs coincide with the
    connected components of the mutual-edge subgraph, which is what the
    DuckDB oracle computes (unrolled propagate+compress, same form as
    _oracle_components). The Spark side runs the general algorithm; the
    3-cycle fixture in tests/test_algorithms.py covers cycles with no
    mutual edges, which the oracle's specialization cannot."""
    from graphview_spark.graph_queries import tpch_graph

    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes["Customer"]
    key = nodes.select("GlobalNodeId", "c_custkey")
    refers = (
        g.edge_with_id("Customer.Refers")
        .join(key.select(F.col("GlobalNodeId").alias("src"),
                         F.col("c_custkey").alias("src_key")), "src")
        .join(key.select(F.col("GlobalNodeId").alias("sink"),
                         F.col("c_custkey").alias("sink_key")), "sink")
        .select(F.col("src_key").alias("src"), F.col("sink_key").alias("sink"))
    )
    directed = refers.unionByName(
        refers.filter(F.col("sink") % 5 == 0)
        .select(F.col("sink").alias("src"), F.col("src").alias("sink"))
    )
    scc = strongly_connected_components(
        nodes.select(F.col("c_custkey").alias("id")), directed
    )
    sizes = scc.groupBy("scc").agg(F.count(F.lit(1)).alias("n"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_sccs"),
        F.max("n").alias("largest"),
        F.count(F.when(F.col("n") >= 2, 1)).alias("n_nontrivial"),
    )


def _oracle_scc(rounds: int = 8) -> str:
    """CC of the mutual-edge subgraph (valid for the derived graph —
    see q_graph_scc docstring) via unrolled propagate+compress; mutual
    chains k↔2k↔4k… have diameter ≤ log₂(max key), far under 2⁸."""
    from graphview_spark.graph_queries import _ORACLE_REFERS

    parts = [
        f"refers AS ({_ORACLE_REFERS})",
        "mutual AS (SELECT src, sink FROM refers WHERE sink % 5 = 0)",
        "sym AS (SELECT src, sink FROM mutual "
        "UNION ALL SELECT sink, src FROM mutual)",
        "l0 AS (SELECT c_custkey AS id, c_custkey AS label FROM customer)",
    ]
    for i in range(1, rounds + 1):
        prev = f"l{i - 1}"
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT n.id, "
            f"least(n.label, coalesce(min(l.label), n.label)) AS label "
            f"FROM {prev} n LEFT JOIN sym e ON e.sink = n.id "
            f"LEFT JOIN {prev} l ON l.id = e.src "
            f"GROUP BY n.id, n.label)"
        )
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT a.id, "
            f"coalesce(b.label, a.label) AS label "
            f"FROM p{i} a LEFT JOIN p{i} b ON b.id = a.label)"
        )
    return (
        "WITH " + ",\n".join(parts) + f""",
sizes AS (SELECT label, count(*) AS n FROM l{rounds} GROUP BY label)
SELECT count(*) AS n_sccs, max(n) AS largest,
       count(*) FILTER (n >= 2) AS n_nontrivial
FROM sizes
"""
    )


_PEEL_CYCLE = 6       # cycle length per block in the peel-gate graph
_PEEL_EDGE_MAX = 480  # keys with edges (80 six-cycles)
_PEEL_NODE_MAX = 500  # 20 extra keys stay singleton SCCs


def q_graph_scc_peel(spark, sf_dir: str) -> DataFrame:
    """Drives the FW-BW peel fallback (_scc_peel) END-TO-END under an
    oracle — the leg q_graph_scc's near-DAG graph never reaches because
    its closure fits the budget. The derived graph is 80 directed
    6-cycles over c_custkey ≤ 480 (block b = (k-1) div 6, edge k → next
    position in the block's cycle) plus 20 isolated keys ≤ 500:
    budget_factor=2 trips at the second squaring (dist≤4 pairs = 4|E| >
    2|E|), so the general peel runs — the trim pre-pass disposes of the
    isolated keys, f==b peels every cycle whole; finish_nodes=0 keeps
    the closure-direct residual finish OFF so the FB fixpoint leg
    itself stays under the oracle (the query's whole purpose). The
    DuckDB oracle does an honest recursive reachability closure +
    mutual-reach minimum, not the generator's closed form. Summary
    output is label-agnostic, same shape as q_graph_scc."""
    from graphview_spark.session import read_table

    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    nodes = cust.filter(F.col("c_custkey") <= _PEEL_NODE_MAX).select(
        F.col("c_custkey").alias("id"))
    b = _PEEL_CYCLE
    edges = (
        cust.filter(F.col("c_custkey") <= _PEEL_EDGE_MAX)
        .select(
            F.col("c_custkey").alias("src"),
            (F.expr(f"(c_custkey - 1) div {b}") * b
             + F.pmod(F.col("c_custkey"), F.lit(b)) + 1
             ).alias("sink"),
        )
    )
    scc = strongly_connected_components(
        nodes, edges, budget_factor=2, finish_nodes=0)
    sizes = scc.groupBy("scc").agg(F.count(F.lit(1)).alias("n"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_sccs"),
        F.max("n").alias("largest"),
        F.count(F.when(F.col("n") >= 2, 1)).alias("n_nontrivial"),
    )


def _oracle_scc_peel() -> str:
    b = _PEEL_CYCLE
    return f"""
WITH RECURSIVE cyc AS (
  SELECT c_custkey AS src,
         ((c_custkey - 1) // {b}) * {b}
           + ((c_custkey - 1) % {b} + 1) % {b} + 1 AS sink
  FROM customer WHERE c_custkey <= {_PEEL_EDGE_MAX}
),
reach AS (
  SELECT src, sink FROM cyc
  UNION
  SELECT r.src, e.sink FROM reach r JOIN cyc e ON e.src = r.sink
),
mutual AS (
  SELECT a.src AS id, a.sink AS partner
  FROM reach a JOIN reach rev ON rev.src = a.sink AND rev.sink = a.src
),
lab AS (
  SELECT n.c_custkey AS id,
         least(n.c_custkey, coalesce(min(m.partner), n.c_custkey)) AS scc
  FROM customer n LEFT JOIN mutual m ON m.id = n.c_custkey
  WHERE n.c_custkey <= {_PEEL_NODE_MAX}
  GROUP BY n.c_custkey
),
sizes AS (SELECT scc, count(*) AS n FROM lab GROUP BY scc)
SELECT count(*) AS n_sccs, max(n) AS largest,
       count(*) FILTER (n >= 2) AS n_nontrivial
FROM sizes
"""


_BFS_BT_SEED_MAX = 9  # block 0 fully seeded + half of block 1: varied counts


def q_graph_betweenness_bfs(spark, sf_dir: str) -> DataFrame:
    """Drives the bounded-memory Brandes fallback of seed_betweenness
    END-TO-END under an oracle — the leg q_graph_betweenness's Refers
    tree never reaches because its closure fits the budget. Same
    derived graph as q_graph_scc_peel (80 directed 6-cycles over
    c_custkey ≤ 480): budget_factor=2 trips the min-plus closure at the
    second squaring, so seed_betweenness degrades to the batched
    multi-seed Brandes BFS (forward σ pass + reverse δ accumulation).
    Directed cycles have UNIQUE shortest paths, so the σ-weighted
    accumulation is integral and equals the closure pair count the
    DuckDB oracle computes (depth-capped recursive closure + min-dist
    fold). Seeds ≤ 9 leave block 1 partially seeded, so per-node counts
    vary (1..10) rather than collapsing to one constant."""
    from graphview_spark.session import read_table

    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    b = _PEEL_CYCLE
    edges = (
        cust.filter(F.col("c_custkey") <= _PEEL_EDGE_MAX)
        .select(
            F.col("c_custkey").alias("src"),
            (F.expr(f"(c_custkey - 1) div {b}") * b
             + F.pmod(F.col("c_custkey"), F.lit(b)) + 1
             ).alias("sink"),
        )
    )
    seeds = cust.filter(F.col("c_custkey") <= _BFS_BT_SEED_MAX).select(
        F.col("c_custkey").alias("s"))
    D, complete = _distance_closure(edges, budget_factor=2)
    bt = seed_betweenness(
        D, seeds, budget_ok=complete, edges=edges, seeds=seeds)
    return bt.select(F.col("v").alias("c_custkey"), "betweenness")


def _oracle_betweenness_bfs() -> str:
    """Depth-capped recursive distance closure (dist < cycle length
    bounds the recursion on the cyclic graph) + min-dist fold, then the
    same through-node pair count as _oracle_betweenness with the
    cycle-specific guards: t ≠ s and v ≠ s (the closure of a cycle
    contains (x, x, L) self-pairs that Brandes never visits — its BFS
    settles the source at distance 0)."""
    b = _PEEL_CYCLE
    return f"""
WITH RECURSIVE cyc AS (
  SELECT c_custkey AS src,
         ((c_custkey - 1) // {b}) * {b}
           + ((c_custkey - 1) % {b} + 1) % {b} + 1 AS sink
  FROM customer WHERE c_custkey <= {_PEEL_EDGE_MAX}
),
d AS (
  SELECT src, sink, 1 AS dist FROM cyc
  UNION
  SELECT d.src, e.sink, d.dist + 1 FROM d JOIN cyc e ON e.src = d.sink
  WHERE d.dist < {b}
),
dm AS (SELECT src, sink, min(dist) AS dist FROM d GROUP BY src, sink),
sv AS (SELECT src AS s, sink AS v, dist AS d1 FROM dm
       WHERE src <= {_BFS_BT_SEED_MAX} AND sink <> src),
st AS (SELECT src AS s, sink AS t, dist AS dd FROM dm
       WHERE src <= {_BFS_BT_SEED_MAX} AND sink <> src),
vt AS (SELECT src AS v, sink AS t, dist AS d2 FROM dm)
SELECT sv.v AS c_custkey, count(*) AS betweenness
FROM sv JOIN vt USING (v) JOIN st ON st.s = sv.s AND st.t = vt.t
WHERE sv.d1 + vt.d2 = st.dd AND sv.v <> vt.t
GROUP BY sv.v
"""


EXTRA_QUERIES: dict = {
    "graph_betweenness": q_graph_betweenness,
    "graph_betweenness_bfs": q_graph_betweenness_bfs,
    "graph_scc_peel": q_graph_scc_peel,
    "graph_kcore": q_graph_kcore,
    "graph_ppr": q_graph_ppr,
    "graph_node_sim": q_graph_node_sim,
    "graph_ktruss": q_graph_ktruss,
    "graph_scc": q_graph_scc,
    "graph_closeness": q_graph_closeness,
}
EXTRA_ORACLES: dict = {
    "graph_betweenness": _oracle_betweenness(),
    "graph_betweenness_bfs": _oracle_betweenness_bfs(),
    "graph_scc_peel": _oracle_scc_peel(),
    "graph_kcore": _oracle_kcore(),
    "graph_ppr": _oracle_ppr(),
    "graph_node_sim": _oracle_node_sim(),
    "graph_ktruss": _oracle_ktruss(),
    "graph_scc": _oracle_scc(),
    "graph_closeness": _oracle_closeness(),
}
