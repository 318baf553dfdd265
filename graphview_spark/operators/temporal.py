"""Temporal joins — as-of join and range (band) join.

The reference has no temporal operators (GraphView is a graph layer over
SQL Server; SURVEY.md §2.7); these are net-new surface for the
event/feature side of a training-data pipeline: point-in-time feature
lookup (as-of) and bounded-window event correlation (range join).

Scale design:

- ``asof_join`` is the union-sort formulation: both sides are unioned
  with a side marker, ONE shuffle on the ``by`` key sorts each group by
  time, and ``last(<right struct>, ignorenulls=True)`` over a running
  window carries the most recent right row forward onto each left row.
  No Python, no per-key loop, no range condition the optimizer can't
  use — the cost is exactly one shuffle + sort, the same as any
  groupBy on ``by``. Skew bound: a hot ``by`` key sorts on one
  reducer — inherent to per-key ordered semantics. ``split_seconds``
  lifts that bound: the partition key becomes (by, time-range), each
  range sorts independently on its own reducer, and the last right row
  of every preceding range is injected as one boundary "carry" row per
  (key, range) — computed from a tiny per-range summary (#keys ×
  #ranges rows), so results are identical to the unsplit path while no
  partition ever holds more than one range of the hot key's history.
  (A cogrouped ``applyInPandas`` + ``merge_asof`` would give the same
  semantics through Arrow but leaves the JVM; this stays in
  whole-stage codegen.)

- ``banded_range_join`` is the bucketed band join: a join condition
  ``r.ts BETWEEN l.ts - W AND l.ts`` is not an equi-join, and Spark
  would fall back to a per-key cross product (or worse, a broadcast
  nested loop). Bucketing time into width-W cells turns it into an
  equi-join on (key, bucket): the left side explodes to the (at most 2)
  cells its window overlaps, the right side maps to its single cell,
  and the exact BETWEEN runs only on cell-collided pairs. Candidate
  count is bounded by events-per-key-per-window, independent of total
  data size.

Matched-row integrity: the carried right columns travel inside ONE
struct, so a null in an individual right column can never cause values
from two different right rows to be stitched together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_cols: list[str],
    tiebreak: str | None = None,
    suffix: str = "_r",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    split_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach ``right_cols`` from the most recent right
    row with ``right.on <= left.on`` (direction='backward', inclusive;
    'forward' = earliest right row with ``right.on >= left.on``), matched
    within ``by``. Unmatched left rows keep nulls (left-outer semantics,
    like DuckDB/pandas ASOF LEFT).

    Ties: right rows sharing (by, on) are resolved to the one with the
    greatest ``tiebreak`` value (backward) / least (forward); pass the
    right side's unique id for deterministic results.

    ``tolerance_seconds`` nulls the match when the matched timestamp is
    further than the tolerance from the left row's timestamp.

    ``split_seconds`` is the hot-key mitigation: rows are additionally
    partitioned by a coarse time range of that width, so a skewed ``by``
    key (one user producing months of events) never sorts its full
    history on a single reducer. The last qualifying right row of every
    preceding range is carried across the boundary, so the result is
    row-for-row identical to the unsplit path.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join direction must be backward/forward: {direction}")
    carried = [c for c in right_cols]
    lpayload = [c for c in left.columns if c not in by and c != on]
    # the right row travels as one struct; `on` rides inside it so the
    # tolerance check and every output column come from the same row
    rstruct = F.struct(
        F.col(on).alias("_on"), *[F.col(c).alias(c) for c in carried]
    )
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    l = left.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast("long").alias("_tb"),
        *[F.col(c).alias(c) for c in lpayload],
        F.lit(None).cast(
            "struct<_on:" + dict(right.dtypes)[on] + ","
            + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in carried)
            + ">"
        ).alias("_match"),
    )
    r = right.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(0).alias("_is_left"),
        tb.cast("long").alias("_tb"),
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in lpayload],
        rstruct.alias("_match"),
    )
    u = l.unionByName(r)
    part: list[str] = list(by)
    if split_seconds is not None:
        # Hot-key range split: each (by, range) sorts independently; the
        # best right row of all preceding (backward) / following
        # (forward) ranges is injected as ONE boundary carry row per
        # (key, range). The carry keeps its true timestamp, which is
        # outside the target range by construction, so it sorts
        # before/after every in-range row with no extra sort column.
        S = float(split_seconds)
        u = u.withColumn(
            "_rid", F.floor(F.col("_t").cast("double") / F.lit(S))
        )
        rr = u.filter(F.col("_is_left") == 0).select(
            *by, "_rid", "_t", "_tb", "_match"
        )
        pick = F.struct("_t", "_tb", "_match")
        key = F.struct(F.col("_t"), F.col("_tb"))
        if direction == "backward":
            best = rr.groupBy(*by, "_rid").agg(
                F.max_by(pick, key).alias("_b")
            )
            wc = (
                W.partitionBy(*by).orderBy("_rid")
                .rowsBetween(W.unboundedPreceding, -1)
            )
            carry = F.last("_b", ignorenulls=True).over(wc)
        else:
            best = rr.groupBy(*by, "_rid").agg(
                F.min_by(pick, key).alias("_b")
            )
            wc = (
                W.partitionBy(*by).orderBy("_rid")
                .rowsBetween(1, W.unboundedFollowing)
            )
            carry = F.first("_b", ignorenulls=True).over(wc)
        # every (key, range) that has ANY row needs a carry — ranges
        # with left rows but no right rows still inherit earlier matches
        rids = u.select(*by, "_rid").distinct()
        carries = (
            rids.join(best, [*by, "_rid"], "left")
            .withColumn("_c", carry)
            .filter(F.col("_c").isNotNull())
            .select(
                *by,
                F.col("_c._t").alias("_t"),
                F.lit(0).alias("_is_left"),
                F.col("_c._tb").alias("_tb"),
                *[
                    F.lit(None)
                    .cast(dict(left.dtypes).get(c, "string"))
                    .alias(c)
                    for c in lpayload
                ],
                F.col("_c._match").alias("_match"),
                "_rid",
            )
        )
        u = u.unionByName(carries)
        part = [*by, "_rid"]
    if direction == "backward":
        # at equal _t the right row sorts first (inclusive >=); among tied
        # right rows the greatest tiebreak sorts last and last() wins
        order = [F.col("_t").asc(), F.col("_is_left").asc(), F.col("_tb").asc()]
        w = (
            W.partitionBy(*part)
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        matched = F.last("_match", ignorenulls=True).over(w)
    else:
        order = [F.col("_t").asc(), F.col("_is_left").desc(), F.col("_tb").asc()]
        w = (
            W.partitionBy(*part)
            .orderBy(*order)
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        matched = F.first("_match", ignorenulls=True).over(w)
    out = u.withColumn("_m", matched).filter(F.col("_is_left") == 1)
    if tolerance_seconds is not None:
        within = (
            F.abs(
                F.col("_t").cast("double") - F.col("_m._on").cast("double")
            )
            <= F.lit(float(tolerance_seconds))
        )
        out = out.withColumn("_m", F.when(within, F.col("_m")))
    return out.select(
        *by,
        F.col("_t").alias(on),
        *lpayload,
        *[F.col(f"_m.{c}").alias(c + suffix) for c in carried],
        F.col("_m._on").alias(on + suffix),
    )


# ---------------------------------------------------------------------------
# range (band) join
# ---------------------------------------------------------------------------


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 300,
) -> DataFrame:
    """Inner-join pairs where ``right_ts`` lies in
    ``[left_ts - window, left_ts]`` within ``by`` — as an equi-join.

    Bucket id = unix_micros // (window · 1e6) (exact integer math, no
    float truncation slop); a window of width W overlaps at most 2
    buckets, so the left side explodes ×2 and the join runs on
    (by, bucket). Right columns that collide with left names get a
    ``_r`` suffix.
    """
    usec = int(window_seconds) * 1_000_000
    lb = F.floor(F.unix_micros(F.col(left_ts)) / F.lit(usec))
    rb = F.floor(F.unix_micros(F.col(right_ts)) / F.lit(usec))
    lcols = set(left.columns)
    r = right.withColumn("_bucket", rb).select(
        "_bucket",
        *by,
        *[
            F.col(c).alias(c + "_r" if c in lcols else c)
            for c in right.columns
            if c not in by
        ],
    )
    rts = right_ts + "_r" if right_ts in lcols else right_ts
    l = left.withColumn(
        "_bucket", F.explode(F.array(lb - 1, lb))
    )
    joined = l.join(r, [*by, "_bucket"], "inner").drop("_bucket")
    lo = F.col(left_ts) - F.expr(f"INTERVAL {int(window_seconds)} SECOND")
    return joined.filter(F.col(rts).between(lo, F.col(left_ts)))


# ---------------------------------------------------------------------------
# correctness-gate entries
# ---------------------------------------------------------------------------


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup: each purchase joined to the same user's most
    recent click at-or-before the purchase (backward inclusive as-of)."""
    from graphview_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value", F.col("event_id").alias("_id")
    )
    out = asof_join(
        purchases,
        clicks,
        on="ts",
        by=["user_id"],
        right_cols=["value"],
        tiebreak="_id",
        suffix="_click",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_trunc("second", F.col("ts")).alias("purchase_ts"),
        F.date_trunc("second", F.col("ts_click")).alias("click_ts"),
        F.round("value_click", 2).alias("click_value"),
    )


# DuckDB's native ASOF LEFT JOIN is the oracle; its right side is
# pre-deduped per (user_id, ts) to the max event_id — the same tie rule
# asof_join applies via the tiebreak column.
ORACLE_EVENTS_ASOF = """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
r AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1)
SELECT l.event_id, l.user_id,
       date_trunc('second', l.ts) AS purchase_ts,
       date_trunc('second', r.ts) AS click_ts,
       round(r.value, 2) AS click_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_events_range_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-join correlation: for every error event, how many clicks did
    the same user make in the preceding 5 minutes (inclusive)?"""
    from graphview_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts"), F.col("event_id").alias("click_id")
    )
    pairs = banded_range_join(
        errors, clicks, by=["user_id"], window_seconds=300
    )
    counts = pairs.groupBy("event_id").agg(
        F.count("click_id").alias("n_clicks_5m")
    )
    return (
        errors.join(counts, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.date_trunc("second", F.col("ts")).alias("error_ts"),
            F.coalesce(F.col("n_clicks_5m"), F.lit(0)).alias("n_clicks_5m"),
        )
    )


ORACLE_EVENTS_RANGE_COUNT = """
SELECT e.event_id, e.user_id,
       date_trunc('second', e.ts) AS error_ts,
       count(c.event_id) AS n_clicks_5m
FROM events e
LEFT JOIN events c
  ON c.user_id = e.user_id AND c.event_type = 'click'
 AND c.ts BETWEEN e.ts - INTERVAL 5 MINUTE AND e.ts
WHERE e.event_type = 'error'
GROUP BY e.event_id, e.user_id, date_trunc('second', e.ts)
"""


def hypertable_rollup(events: DataFrame) -> dict[str, DataFrame]:
    """Multi-resolution continuous aggregate (the hypertable-rollup
    shape): minute → hour → day, each level computed FROM the level
    below, never from raw events. All tracked statistics are mergeable
    (count/sum/min/max — avg derives as sum/count at read time), so the
    hour level aggregates 60 minute-rows per key instead of re-scanning
    the raw table, and day aggregates 24 hour-rows: at 100 TB the raw
    scan happens exactly once, and each higher level costs a shuffle of
    the (already tiny) level below on the same (event_type, bucket)
    keys. The same minute-level transformation runs under readStream
    (streaming/events.py windows) — this is the batch backfill path."""
    minute = (
        events.groupBy(
            "event_type",
            F.date_trunc("minute", F.col("ts")).alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )

    def up(lower: DataFrame, unit: str) -> DataFrame:
        return (
            lower.groupBy(
                "event_type",
                F.date_trunc(unit, F.col("bucket")).alias("bucket"),
            )
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_value").alias("sum_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )

    hour = up(minute, "hour")
    day = up(hour, "day")
    return {"minute": minute, "hour": hour, "day": day}


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate view of the rollup: the DAY level (computed minute → hour →
    day), rounded for oracle-stable hashing."""
    from graphview_spark.session import read_table

    events = read_table(spark, sf_dir, "events")
    day = hypertable_rollup(events)["day"]
    return day.select(
        "event_type",
        F.col("bucket").cast("date").alias("day"),
        "n",
        F.round("sum_value", 3).alias("sum_value"),
        F.round("min_value", 3).alias("min_value"),
        F.round("max_value", 3).alias("max_value"),
        # avg derives as sum/n at read time; it is NOT part of the gate
        # output because a halfway quotient (e.g. 3175.34/56 = 56.70250)
        # rounds differently from binary doubles vs decimal strings
    )


ORACLE_EVENTS_ROLLUP = """
WITH minute AS (
  SELECT event_type, date_trunc('minute', ts) AS bucket,
         count(*) AS n, sum(value) AS sum_value,
         min(value) AS min_value, max(value) AS max_value
  FROM events GROUP BY 1, 2),
hour AS (
  SELECT event_type, date_trunc('hour', bucket) AS bucket,
         sum(n) AS n, sum(sum_value) AS sum_value,
         min(min_value) AS min_value, max(max_value) AS max_value
  FROM minute GROUP BY 1, 2),
day AS (
  SELECT event_type, date_trunc('day', bucket) AS bucket,
         sum(n) AS n, sum(sum_value) AS sum_value,
         min(min_value) AS min_value, max(max_value) AS max_value
  FROM hour GROUP BY 1, 2)
SELECT event_type, bucket::DATE AS day, n::BIGINT AS n,
       round(sum_value, 3) AS sum_value,
       round(min_value, 3) AS min_value,
       round(max_value, 3) AS max_value
FROM day
"""


QUERIES = {
    "events_asof": q_events_asof,
    "events_range_count": q_events_range_count,
}
ORACLES = {
    "events_asof": ORACLE_EVENTS_ASOF,
    "events_range_count": ORACLE_EVENTS_RANGE_COUNT,
}
# rollup/funnel/retention/gapfill are appended to QUERIES at module end
# (they are defined below this point); rotated into the driver gate in
# round 4.

FUNNEL_STEPS = ["view", "click", "purchase"]


def funnel(events: DataFrame, steps: list[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel analysis: for each user, the earliest time step 1
    occurred, then the earliest step 2 STRICTLY AFTER that, and so on —
    the standard event-analytics conversion funnel.

    Plan: one conditional-min aggregation per step over the SAME
    per-user grouping — k map-side-combinable groupBys joined on
    user_id (AQE collapses the joins onto one partitioning; no sort, no
    window over a user's whole history, no per-user Python). Returns
    (user, t_1..t_k) with nulls where the funnel broke."""
    step_times = None
    prev_t = None
    for i, step in enumerate(steps, start=1):
        ev = events.filter(F.col(type_col) == step)
        if step_times is None:
            cur = ev.groupBy(F.col(user_col).alias("u")).agg(
                F.min(ts_col).alias(f"t_{i}")
            )
            step_times = cur
        else:
            joined = ev.join(
                step_times.select("u", F.col(prev_t).alias("__prev")),
                ev[user_col] == F.col("u"),
            ).filter(F.col(ts_col) > F.col("__prev"))
            cur = joined.groupBy("u").agg(F.min(ts_col).alias(f"t_{i}"))
            step_times = step_times.join(cur, "u", "left")
        prev_t = f"t_{i}"
    return step_times


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase conversion counts (per-step user counts,
    the funnel report shape)."""
    from graphview_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    f = funnel(ev, FUNNEL_STEPS)
    return f.agg(
        F.count("t_1").alias("n_step1"),
        F.count("t_2").alias("n_step2"),
        F.count("t_3").alias("n_step3"),
    )


ORACLE_EVENTS_FUNNEL = """
WITH s1 AS (
  SELECT user_id AS u, min(ts) AS t_1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
s2 AS (
  SELECT e.user_id AS u, min(e.ts) AS t_2
  FROM events e JOIN s1 ON e.user_id = s1.u AND e.ts > s1.t_1
  WHERE e.event_type = 'click' GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id AS u, min(e.ts) AS t_3
  FROM events e JOIN s2 ON e.user_id = s2.u AND e.ts > s2.t_2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT count(t_1) AS n_step1, count(t_2) AS n_step2, count(t_3) AS n_step3
FROM s1 LEFT JOIN s2 USING (u) LEFT JOIN s3 USING (u)
"""


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week
    (the cohort), counted distinct per week offset since their cohort —
    the classic retention triangle.

    Plan: first-activity week is one map-side-combinable min per user;
    joining it back (broadcast-friendly: one short row per user) tags
    every event with its offset, and the triangle is a distinct-count
    groupBy on (cohort, offset). No window over per-user history."""
    from graphview_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            F.col("cohort").cast("date").alias("cohort_week"),
            F.datediff(F.col("wk"), F.col("cohort")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .withColumn("week_offset", (F.col("week_offset") / 7).cast("int"))
    )


ORACLE_EVENTS_RETENTION = """
WITH e AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
f AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY user_id)
SELECT cohort::DATE AS cohort_week,
       cast(date_diff('day', cohort, wk) / 7 AS INT) AS week_offset,
       count(DISTINCT user_id) AS n_users
FROM e JOIN f USING (user_id)
GROUP BY 1, 2
"""


def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-grid gap-fill with last-observation-carried-forward: every
    (event_type, hour) cell between the global min and max hour exists
    in the output; hours with no events get n=0 and carry the most
    recent earlier hour's avg value forward (the dashboard/time-series
    regularization pass).

    Plan: the dense hour grid generates from ONE 1-row min/max
    aggregate (sequence + explode — no driver loop), cross-joins the
    (tiny) type list, left-joins the hourly aggregate, and LOCF is a
    last(ignorenulls) window per type ordered by hour — the window's
    partition is the (small) grid, never raw events."""
    from pyspark.sql import Window as W

    from graphview_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr"), "value"
    )
    hourly = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 3).alias("sum_value"),
    )
    span = ev.agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    grid = span.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr")
    )
    types = ev.select("event_type").distinct()
    w = (
        W.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.crossJoin(types)
        .join(hourly, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("sum_value", ignorenulls=True).over(w).alias("locf_sum"),
        )
    )


ORACLE_EVENTS_GAPFILL = """
WITH e AS (SELECT event_type, date_trunc('hour', ts) AS hr, value FROM events),
hourly AS (SELECT event_type, hr, count(*) AS n,
                  round(sum(value), 3) AS sum_value
           FROM e GROUP BY 1, 2),
span AS (SELECT min(hr) AS lo, max(hr) AS hi FROM e),
grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
         FROM span),
types AS (SELECT DISTINCT event_type FROM e),
dense AS (SELECT t.event_type, g.hr, coalesce(h.n, 0) AS n, h.sum_value
          FROM grid g CROSS JOIN types t
          LEFT JOIN hourly h ON h.event_type = t.event_type AND h.hr = g.hr)
SELECT event_type, hr, n,
       last_value(sum_value IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY hr
         ROWS UNBOUNDED PRECEDING) AS locf_sum
FROM dense
"""


# outside the driver gate's ~50-entry cap — checked via extra_queries()
QUERIES.update({
    "events_rollup": q_events_rollup,
    "events_funnel": q_events_funnel,
    "events_retention": q_events_retention,
    "events_gapfill": q_events_gapfill,
})
ORACLES.update({
    "events_rollup": ORACLE_EVENTS_ROLLUP,
    "events_funnel": ORACLE_EVENTS_FUNNEL,
    "events_retention": ORACLE_EVENTS_RETENTION,
    "events_gapfill": ORACLE_EVENTS_GAPFILL,
})
HIST_BINS = 20


def q_events_histogram(spark, sf_dir: str):
    """Fixed-width histogram of event values, counted per event type
    over GLOBAL bin edges (one (min, max) aggregate broadcast back —
    global on purpose, so bins are comparable across event types);
    binning is a per-row expression; counts are a map-side-combinable
    groupBy. No sort, no window — the profile pass that sizes
    downstream quantile/clip decisions. The max value folds into the
    top bin (standard closed upper edge). The bin width is floored at
    1e-12 so a degenerate hi==lo span yields bin 0 on both engines
    (unguarded, 0/0 is NULL on Spark but NaN in DuckDB's IEEE math)."""
    from graphview_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    span = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = ev.join(F.broadcast(span)).select(
        "event_type",
        F.least(
            F.lit(HIST_BINS - 1),
            F.floor(
                (F.col("value") - F.col("lo"))
                / (F.greatest(
                    F.col("hi") - F.col("lo"), F.lit(1e-12)
                ) / HIST_BINS)
            ),
        ).alias("bin"),
    )
    return binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )


ORACLE_EVENTS_HISTOGRAM = f"""
WITH span AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
b AS (
  SELECT event_type,
         least({HIST_BINS - 1},
               floor((value - lo)
                     / (greatest(hi - lo, 1e-12) / {HIST_BINS}))::BIGINT) AS bin
  FROM events, span
)
SELECT event_type, bin, count(*)::BIGINT AS n
FROM b GROUP BY event_type, bin
"""


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def q_events_sessionize(spark, sf_dir: str):
    """Batch sessionization (the offline complement of the streaming
    session_window operator): per user, an inactivity gap > 30 min
    starts a new session; one output row per session with bounds,
    event count, and total value. Gap comparison in exact integer
    MICROSECONDS (unix_micros/epoch_us) so the boundary decision is
    bit-identical across engines; value totals in integer cents.

    Scale: one shuffle on user_id serves both windows (lag + running
    sum share the partitioning) and the session aggregate — per-user
    event counts are bounded (human activity), so no skew salting
    needed; at 100 TB this is the classic sessionize-in-one-pass
    layout."""
    from pyspark.sql import Window as W

    from graphview_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    new_sess = (
        (us - F.lag(us).over(w) > SESSION_GAP_US)
        | F.lag(us).over(w).isNull()
    ).cast("long")
    sess = ev.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "value_cents"
        ),
    )


ORACLE_EVENTS_SESSIONIZE = f"""
WITH o AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_US}
              OR lag(epoch_us(ts)) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
s AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT user_id, session_id::BIGINT AS session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       sum(round(value * 100)::BIGINT)::BIGINT AS value_cents
FROM s GROUP BY user_id, session_id
"""


def q_events_json(spark, sf_dir: str):
    """Semi-structured props extraction (§2.2 function surface — the
    JSON path every telemetry/training-metadata pipeline hits): pull
    ``$.k`` out of the JSON props column and aggregate per event type
    and k-decile. ``get_json_object`` evaluates JVM-side (codegen path
    expression, no Python); the whole query is one scan + one
    map-side-combinable groupBy — the props column never leaves its
    partition unparsed at 100 TB."""
    from graphview_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"), "value")
        .groupBy("event_type", (F.col("k") - F.col("k") % 10).alias("k_decade"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


ORACLE_EVENTS_JSON = """
SELECT event_type,
       (k - k % 10) AS k_decade,
       count(*) AS n, min(k) AS k_min, max(k) AS k_max,
       round(sum(value), 2) AS sum_value
FROM (SELECT event_type, TRY_CAST(props->>'k' AS INT) AS k, value
      FROM events)  -- TRY_CAST mirrors Spark's NULL-on-failure cast
GROUP BY event_type, (k - k % 10)
"""


ANOMALY_MAD_K = 3


def q_events_anomaly(spark, sf_dir: str):
    """Robust per-type anomaly flags: |value − median| > k·MAD (median
    absolute deviation — outlier-resistant where mean/stddev are not).
    Two grouped exact medians (Spark's interpolating ``median`` matches
    DuckDB's for DOUBLE inputs bit-for-bit — same (a+b)/2 IEEE math),
    both over the same event_type partitioning, then a broadcast of the
    5-row stats table back onto the stream; rounded to 4dp before the
    comparison so the flag is engine-stable. Returns only the flagged
    rows (the 100 TB-relevant output — shipping every row with a flag
    column would dwarf the anomalies)."""
    from graphview_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("median(value)"), 4).alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.round(F.expr("median(abs(value - med))"), 4).alias("mad"),
             F.first("med").alias("med"))
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .filter(F.abs(F.col("value") - F.col("med"))
                > ANOMALY_MAD_K * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "mad")
    )


ORACLE_EVENTS_ANOMALY = f"""
WITH med AS (
  SELECT event_type, round(median(value), 4) AS med
  FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type, round(median(abs(e.value - m.med)), 4) AS mad,
         min(m.med) AS med
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_id, e.event_type, e.value, m.med, m.mad
FROM events e JOIN mad m USING (event_type)
WHERE abs(e.value - m.med) > {ANOMALY_MAD_K} * m.mad
"""


EXTRA_QUERIES: dict = {
    "events_histogram": q_events_histogram,
    "events_sessionize": q_events_sessionize,
    "events_json": q_events_json,
    "events_anomaly": q_events_anomaly,
}
EXTRA_ORACLES: dict = {
    "events_histogram": ORACLE_EVENTS_HISTOGRAM,
    "events_sessionize": ORACLE_EVENTS_SESSIONIZE,
    "events_json": ORACLE_EVENTS_JSON,
    "events_anomaly": ORACLE_EVENTS_ANOMALY,
}
