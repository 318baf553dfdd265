"""Semantics tests for the temporal joins (operators/temporal.py):
as-of tie/tolerance/direction rules on hand-built fixtures, band-join
bucket-boundary coverage, and plan shape (no cartesian, no Python)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from graphview_spark.operators.temporal import asof_join, banded_range_join


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:10:00")),
            (2, 10, _ts("2024-01-01 00:20:00")),
            (3, 10, _ts("2024-01-01 00:00:30")),   # before every right row
            (4, 20, _ts("2024-01-01 09:00:00")),   # user with no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:05:00"), 1.0, 101),
            (10, _ts("2024-01-01 00:10:00"), 2.0, 102),  # tie with left #1
            (10, _ts("2024-01-01 00:10:00"), 3.0, 103),  # same ts, higher id
            (10, _ts("2024-01-01 00:15:00"), None, 104), # null value col
        ],
        "user_id long, ts timestamp, value double, _id long",
    )
    return left, right


def test_asof_backward_inclusive_and_ties(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="ts", by=["user_id"], right_cols=["value"],
        tiebreak="_id",
    )
    rows = {r["event_id"]: r for r in out.collect()}
    # tie at 00:10: inclusive match, max _id (103) wins -> value 3.0
    assert rows[1]["value_r"] == 3.0
    # 00:20 matches the 00:15 row WITH ITS OWN null value (not an older
    # row's value) — matched-row integrity through the struct
    assert rows[2]["value_r"] is None
    assert rows[2]["ts_r"] == _ts("2024-01-01 00:15:00")
    # left row before all right rows and user without right rows -> null
    assert rows[3]["value_r"] is None and rows[3]["ts_r"] is None
    assert rows[4]["value_r"] is None and rows[4]["ts_r"] is None
    assert out.count() == 4


def test_asof_forward_and_tolerance(spark):
    left, right = _frames(spark)
    fwd = asof_join(
        left, right, on="ts", by=["user_id"], right_cols=["value"],
        tiebreak="_id", direction="forward",
    )
    rows = {r["event_id"]: r for r in fwd.collect()}
    # forward from 00:00:30 -> earliest right at-or-after = 00:05
    assert rows[3]["ts_r"] == _ts("2024-01-01 00:05:00")
    # forward tie at 00:10 -> least _id (102) wins
    assert rows[1]["value_r"] == 2.0
    # 00:20 has no later right row
    assert rows[2]["ts_r"] is None

    tol = asof_join(
        left, right, on="ts", by=["user_id"], right_cols=["value"],
        tiebreak="_id", tolerance_seconds=60,
    )
    trows = {r["event_id"]: r for r in tol.collect()}
    assert trows[1]["value_r"] == 3.0            # 0s away, kept
    assert trows[2]["value_r"] is None           # 300s away, nulled
    assert trows[2]["ts_r"] is None


def _skewed_frames(spark):
    """One hot user (90% of rows) + a sparse user whose matches must
    carry across many range boundaries."""
    import random

    rnd = random.Random(7)
    base = int(_ts("2024-01-01 00:00:00").timestamp())
    lrows = [
        (i, 10, datetime.fromtimestamp(base + rnd.randrange(0, 36000)))
        for i in range(200)
    ] + [
        (1000 + i, 20, datetime.fromtimestamp(base + 3600 * 9 + i))
        for i in range(5)
    ]
    rrows = [
        (10, datetime.fromtimestamp(base + rnd.randrange(0, 36000)),
         float(i), i)
        for i in range(300)
    ] + [
        # user 20's only right row sits hours before its left rows —
        # the match must carry across every intermediate time range
        (20, datetime.fromtimestamp(base + 30), 99.0, 9000),
    ]
    left = spark.createDataFrame(
        lrows, "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        rrows, "user_id long, ts timestamp, value double, _id long"
    )
    return left, right


def test_asof_split_equals_unsplit(spark):
    left, right = _skewed_frames(spark)
    kw = dict(on="ts", by=["user_id"], right_cols=["value"], tiebreak="_id")
    for direction in ("backward", "forward"):
        plain = asof_join(left, right, direction=direction, **kw)
        split = asof_join(
            left, right, direction=direction, split_seconds=600, **kw
        )
        assert sorted(map(tuple, split.collect()), key=lambda t: t[:2]) == \
            sorted(map(tuple, plain.collect()), key=lambda t: t[:2])
    # tolerance composes with the split the same way
    plain = asof_join(left, right, tolerance_seconds=120, **kw)
    split = asof_join(
        left, right, tolerance_seconds=120, split_seconds=600, **kw
    )
    assert sorted(map(tuple, split.collect()), key=lambda t: t[:2]) == \
        sorted(map(tuple, plain.collect()), key=lambda t: t[:2])


def test_asof_split_partitions_by_time_range(spark):
    # the sort partition key must include the range id — that is the
    # guarantee that no single partition holds a hot key's full history
    left, right = _skewed_frames(spark)
    split = asof_join(
        left, right, on="ts", by=["user_id"], right_cols=["value"],
        tiebreak="_id", split_seconds=600,
    )
    plan = split._jdf.queryExecution().executedPlan().toString()
    import re as _re

    main_windows = [
        ln for ln in plan.splitlines()
        if "Window" in ln and "_match" in ln
    ]
    assert main_windows, plan
    assert all("_rid" in ln for ln in main_windows), main_windows


def test_banded_range_join_boundaries(spark):
    # window 300s; pairs that straddle a bucket boundary must still match
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:05:01"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:01"), 201),  # exactly -300s: included
            (10, _ts("2024-01-01 00:00:00"), 202),  # -301s: out
            (10, _ts("2024-01-01 00:05:01"), 203),  # 0s: included
            (10, _ts("2024-01-01 00:05:02"), 204),  # future: out
            (20, _ts("2024-01-01 00:05:01"), 205),  # other user: out
        ],
        "user_id long, ts timestamp, click_id long",
    )
    pairs = banded_range_join(left, right, by=["user_id"], window_seconds=300)
    got = sorted(r["click_id"] for r in pairs.collect())
    assert got == [201, 203]


def test_temporal_plan_shape(spark, sf_dir):
    from graphview_spark.operators.temporal import (
        q_events_asof,
        q_events_range_count,
    )
    from graphview_spark.plans.inspect import plan_facts

    asof_facts = plan_facts(q_events_asof(spark, sf_dir))
    assert asof_facts.n_cartesian == 0
    assert asof_facts.n_python_evals == 0
    range_facts = plan_facts(q_events_range_count(spark, sf_dir))
    assert range_facts.n_cartesian == 0
    assert range_facts.n_python_evals == 0


def test_gate_queries_match_oracle(spark, duck, sf_dir):
    from tests.conftest import assert_df_matches_oracle
    from graphview_spark.operators import temporal

    for name, fn in temporal.QUERIES.items():
        assert_df_matches_oracle(
            fn(spark, sf_dir), duck, temporal.ORACLES[name]
        )


def test_rollup_levels_merge_exactly(spark, sf_dir):
    """Each rollup level computed from the level below equals the same
    aggregate computed directly from raw events (mergeable stats)."""
    from pyspark.sql import functions as F

    from graphview_spark.operators.temporal import hypertable_rollup
    from graphview_spark.session import read_table

    events = read_table(spark, sf_dir, "events")
    levels = hypertable_rollup(events)
    direct_hour = (
        events.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    rolled = {
        (r["event_type"], r["bucket"]): (r["n"], round(r["sum_value"], 6))
        for r in levels["hour"].collect()
    }
    direct = {
        (r["event_type"], r["bucket"]): (r["n"], round(r["sum_value"], 6))
        for r in direct_hour.collect()
    }
    assert rolled == direct
    assert levels["day"].count() <= levels["hour"].count()


def test_funnel_strict_ordering(spark):
    from datetime import datetime as dt

    from graphview_spark.operators.temporal import funnel

    ev = spark.createDataFrame(
        [
            # user 1: full funnel in order
            (1, "view", dt(2024, 1, 1, 0)), (1, "click", dt(2024, 1, 1, 1)),
            (1, "purchase", dt(2024, 1, 1, 2)),
            # user 2: click BEFORE view — funnel must not count it
            (2, "click", dt(2024, 1, 1, 0)), (2, "view", dt(2024, 1, 1, 1)),
            # user 3: view only
            (3, "view", dt(2024, 1, 1, 0)),
        ],
        "user_id long, event_type string, ts timestamp",
    )
    out = {r["u"]: r for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert out[1]["t_3"] == dt(2024, 1, 1, 2)
    assert out[2]["t_1"] is not None and out[2]["t_2"] is None
    assert out[3]["t_2"] is None


def test_retention_offsets(spark, sf_dir):
    from graphview_spark.operators.temporal import q_events_retention

    rows = q_events_retention(spark, sf_dir).collect()
    assert rows
    # offset 0 of each cohort counts every user of that cohort exactly once
    week0 = {r["cohort_week"]: r["n_users"] for r in rows if r["week_offset"] == 0}
    assert week0 and all(n > 0 for n in week0.values())
    # retention never exceeds the cohort's size
    for r in rows:
        assert r["n_users"] <= week0[r["cohort_week"]]
    assert all(r["week_offset"] >= 0 for r in rows)


def test_gapfill_dense_and_locf(spark, sf_dir):
    from pyspark.sql import functions as F

    from graphview_spark.operators.temporal import q_events_gapfill

    out = q_events_gapfill(spark, sf_dir)
    per_type = out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.min("hr").alias("lo"),
        F.max("hr").alias("hi"),
    ).collect()
    # every type covers the same dense hour grid
    cells = {r["n_cells"] for r in per_type}
    assert len(cells) == 1
    lo, hi = per_type[0]["lo"], per_type[0]["hi"]
    expected = int((hi - lo).total_seconds() // 3600) + 1
    assert cells == {expected}
    # after the first observed hour, locf_sum is never null
    first_obs = out.filter("n > 0").groupBy("event_type").agg(
        F.min("hr").alias("f")
    )
    holes = (
        out.join(first_obs, "event_type")
        .filter((F.col("hr") >= F.col("f")) & F.col("locf_sum").isNull())
        .count()
    )
    assert holes == 0
