"""Structured Streaming surface over the ``events`` table shape.

The reference has NO streaming operators (SURVEY.md §2.7 — GraphView is
request/response over SQL Server), so this is net-new surface designed
per the project north star: the same ``events`` schema can run either as
a batch DataFrame or through ``readStream`` with watermarked windows.

Design rules carried from batch:
  - the transformation is ONE function used by both batch and streaming
    paths (build_* below take any DataFrame, batch or streaming);
  - watermarks bound state for late data; tumbling/sliding windows via
    ``F.window``, sessions via ``F.session_window`` (JVM-side state
    store, no Python in the hot path);
  - the custom stateful operator (running per-user totals) uses
    ``applyInPandasWithState`` — the Arrow-batched stateful escape hatch
    for semantics the built-ins can't express.

Scale notes: streaming aggs shuffle on the grouping key exactly like
batch; state store size is bounded by watermark horizon × key
cardinality. ``foreachBatch`` sinks reuse the batch writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

SESSION_GAP = "10 minutes"


def events_stream(spark: SparkSession, path: str, watermark: str = "1 hour") -> DataFrame:
    """File-source stream over event parquet files in ``path``."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(path)
        .withWatermark("ts", watermark)
    )


# ---- transformations usable on batch AND streaming frames ----------------

def build_windowed_counts(
    events: DataFrame, window: str = "1 hour", slide: str | None = None
) -> DataFrame:
    """Tumbling (or sliding) windowed counts per event type."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return events.groupBy(win.alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "n_events",
        "total_value",
    )


def build_sessions(events: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """Per-user sessions via the native session window (state closes when
    no event arrives within ``gap``). Output bounds derive from the
    observed min/max ts so batch results are engine-portable (Spark's
    ``session_window.end`` includes the gap padding)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.date_trunc("second", F.min("ts")).alias("session_start"),
            F.date_trunc("second", F.max("ts")).alias("session_end"),
        )
        .select(
            "user_id", "session_start", "session_end", "n_events", "total_value"
        )
    )


def run_stream_to_memory(
    spark: SparkSession, streaming_df: DataFrame, name: str, mode: str = "complete"
):
    """Drain a (finite) file-source stream into an in-memory table with
    availableNow — the batch-equivalence test harness."""
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def build_dedup(events: DataFrame, within: str | None = None) -> DataFrame:
    """Streaming deduplication on event_id — the at-least-once →
    exactly-once repair step in front of every downstream aggregate.
    Batch: plain dropDuplicates. Streaming with ``within``:
    ``dropDuplicatesWithinWatermark`` keeps each key's state only for
    the watermark horizon, so state is bounded by (arrival rate x
    horizon), not by stream lifetime — the only formulation that
    survives an unbounded 100 TB/day stream."""
    if within is not None and events.isStreaming:
        return events.withWatermark("ts", within).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def build_purchase_click_join(
    clicks: DataFrame, purchases: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the same
    user's click within the preceding ``horizon``. In streaming both
    sides carry watermarks and the time-bound condition lets Spark expire
    join state (unbounded-state stream joins are rejected by the
    planner); in batch the identical condition is a plain range join."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("amount"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")
        ),
    ).select(
        F.col("p_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        F.round("amount", 2).alias("amount"),
    )


# ---- custom stateful operator (applyInPandasWithState) -------------------

RUNNING_STATE_SCHEMA = "total double, n long"
RUNNING_OUT_SCHEMA = "user_id long, running_total double, n_events long"


def _running_totals_fn(key, pdf_iter, state):
    """Per-user running totals — the applyInPandasWithState kernel.
    Arrow-batched; state is one (total, n) tuple per user."""
    import pandas as pd

    (user_id,) = key
    if state.exists:
        total, n = state.get
    else:
        total, n = 0.0, 0
    for pdf in pdf_iter:
        total += float(pdf["value"].sum())
        n += int(len(pdf))
    state.update((total, n))
    yield pd.DataFrame(
        {"user_id": [user_id], "running_total": [round(total, 2)], "n_events": [n]}
    )


def build_running_totals(events: DataFrame) -> DataFrame:
    """Streaming: continuously-updated per-user totals with explicit
    state. (Batch equivalent: groupBy(user_id).agg(sum, count).)"""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_OUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---- correctness-gate entry (batch shape of the session operator) --------

def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of ``build_sessions`` over the events table — the gate
    entry proving session semantics against a gaps-and-islands oracle."""
    from graphview_spark.session import read_table

    return build_sessions(read_table(spark, sf_dir, "events"))


# DuckDB has no session_window; the oracle is the classic gaps-and-islands
# rewrite: a session starts where the gap from the previous event of the
# same user exceeds the threshold; session id = running count of starts.
ORACLE_STREAM_SESSIONS = """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 10 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events),
s AS (
  SELECT user_id, ts, value,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o)
SELECT user_id,
       date_trunc('second', min(ts)) AS session_start,
       date_trunc('second', max(ts)) AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM s GROUP BY user_id, session_id
"""


def q_stream_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of ``build_windowed_counts`` — tumbling 1-hour windows
    per event type; the identical transformation runs under readStream
    with a watermark (tests/test_streaming.py asserts the equivalence)."""
    from graphview_spark.session import read_table

    return build_windowed_counts(read_table(spark, sf_dir, "events"))


# Spark's window() aligns tumbling windows to the epoch; DuckDB's
# time_bucket does the same.
ORACLE_STREAM_WINDOWED = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2, 3
"""


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour every 30 minutes): each event lands in two
    overlapping windows — the standard rolling-metric shape."""
    from graphview_spark.session import read_table

    return build_windowed_counts(
        read_table(spark, sf_dir, "events"), window="1 hour", slide="30 minutes"
    )


# An event at ts belongs to the two 1-hour windows starting at
# time_bucket(30min, ts) and time_bucket(30min, ts) - 30min — Spark's
# sliding window() enumerates exactly those epoch-aligned starts.
ORACLE_STREAM_SLIDING = """
WITH expanded AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE AS ws,
         event_type, value
  FROM events, (VALUES (0), (1)) t(k))
SELECT ws AS window_start,
       ws + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM expanded
GROUP BY 1, 2, 3
"""


def q_stream_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling (1h) AND sliding (1h every 30min) windowed aggregation in
    one tagged result — both batch forms of ``build_windowed_counts``,
    whose identical transformation runs under readStream with a
    watermark (tests/test_streaming.py asserts the equivalence)."""
    tumbling = q_stream_windowed(spark, sf_dir).withColumn(
        "kind", F.lit("tumbling")
    )
    sliding = q_stream_sliding(spark, sf_dir).withColumn(
        "kind", F.lit("sliding")
    )
    return tumbling.unionByName(sliding)


ORACLE_STREAM_WINDOWS = f"""
SELECT *, 'tumbling' AS kind FROM ({ORACLE_STREAM_WINDOWED})
UNION ALL
SELECT *, 'sliding' AS kind FROM ({ORACLE_STREAM_SLIDING})
"""


TRENDING_K = 3


def build_trending(counts: DataFrame, k: int = TRENDING_K) -> DataFrame:
    """Top-k event types per window ranked by count, with the
    window-over-window momentum (delta vs the type's previous window).

    Composes on ``build_windowed_counts`` output. In streaming this
    ranking runs in the ``foreachBatch`` sink over the watermark-closed
    windows (per-window ranks are only final once the window closes —
    the standard trending-dashboard layout); in batch it is the same
    two window functions. Both windows partition on tiny aggregated
    keys (#windows × #types rows), so the sorts never see raw events."""
    w_rank = W.partitionBy("window_start").orderBy(
        F.desc("n_events"), "event_type"
    )
    w_hist = W.partitionBy("event_type").orderBy("window_start")
    return (
        counts.withColumn(
            "delta",
            F.col("n_events")
            - F.coalesce(F.lag("n_events").over(w_hist), F.lit(0)),
        )
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= k)
        .select("window_start", "event_type", "n_events", "delta", "rank")
    )


def q_stream_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the trending ranking over tumbling 1-hour windows."""
    from graphview_spark.session import read_table

    counts = build_windowed_counts(read_table(spark, sf_dir, "events"))
    return build_trending(counts)


ORACLE_STREAM_TRENDING = f"""
WITH counts AS ({ORACLE_STREAM_WINDOWED}),
hist AS (
  SELECT window_start, event_type, n_events,
         n_events - coalesce(lag(n_events) OVER
           (PARTITION BY event_type ORDER BY window_start), 0) AS delta,
         row_number() OVER (PARTITION BY window_start
                            ORDER BY n_events DESC, event_type) AS rank
  FROM counts
)
SELECT window_start, event_type, n_events::BIGINT AS n_events,
       delta::BIGINT AS delta, rank::BIGINT AS rank
FROM hist WHERE rank <= {TRENDING_K}
"""


QUERIES = {
    "stream_sessions": q_stream_sessions,
    "stream_windows": q_stream_windows,
    "stream_trending": q_stream_trending,
}
ORACLES = {
    "stream_sessions": ORACLE_STREAM_SESSIONS,
    "stream_windows": ORACLE_STREAM_WINDOWS,
    "stream_trending": ORACLE_STREAM_TRENDING,
}
EXTRA_QUERIES: dict = {}
EXTRA_ORACLES: dict = {}
