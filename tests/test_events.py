"""Funnel and cohort-retention operators over event streams."""

from __future__ import annotations

from datetime import datetime as dt

from pyspark.sql import functions as F

from datamine_v2_0_spark.operators import events as ev


def _events(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "ts", "event_type"])


def _funnel(spark, rows, steps=("view", "click", "purchase")):
    df = _events(spark, rows)
    out = ev.funnel_steps(df, list(steps), "user_id", "ts", "event_type")
    return {r["step"]: (r["step_name"], r["users"]) for r in out.collect()}


def test_funnel_strict_order(spark):
    rows = [
        # user 1 completes the whole funnel in order
        (1, dt(2024, 1, 1, 10), "view"),
        (1, dt(2024, 1, 1, 11), "click"),
        (1, dt(2024, 1, 1, 12), "purchase"),
        # user 2 clicks BEFORE viewing -> stops at stage 0
        (2, dt(2024, 1, 1, 9), "click"),
        (2, dt(2024, 1, 1, 10), "view"),
        # user 3 views only
        (3, dt(2024, 1, 1, 10), "view"),
    ]
    got = _funnel(spark, rows)
    assert got[0] == ("view", 3)
    assert got[1] == ("click", 1)
    assert got[2] == ("purchase", 1)


def test_funnel_same_timestamp_not_counted(spark):
    """Strictly-after semantics: a click at the exact view instant
    does not advance the funnel."""
    rows = [
        (1, dt(2024, 1, 1, 10), "view"),
        (1, dt(2024, 1, 1, 10), "click"),
    ]
    got = _funnel(spark, rows)
    assert got[0][1] == 1 and got[1][1] == 0


def test_funnel_later_step_can_recover(spark):
    """An early out-of-order click doesn't consume the stage: a second
    click after the view still completes stage 1."""
    rows = [
        (1, dt(2024, 1, 1, 9), "click"),
        (1, dt(2024, 1, 1, 10), "view"),
        (1, dt(2024, 1, 1, 11), "click"),
    ]
    got = _funnel(spark, rows)
    assert got[0][1] == 1 and got[1][1] == 1


def test_funnel_counts_non_increasing(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    out = ev.funnel_steps(
        df, ["view", "click", "purchase"], "user_id", "ts", "event_type"
    ).orderBy("step").collect()
    users = [r["users"] for r in out]
    assert users == sorted(users, reverse=True)
    assert len(out) == 3


def test_cohort_offsets(spark):
    rows = [
        # user 1 first seen Mon 2024-01-01 week, active again 2 weeks later
        (1, dt(2024, 1, 2, 10), "view"),
        (1, dt(2024, 1, 16, 10), "view"),
        # user 2 same cohort week, never returns
        (2, dt(2024, 1, 4, 10), "view"),
        # user 3 cohort of the following week
        (3, dt(2024, 1, 10, 10), "view"),
    ]
    out = ev.cohort_retention(_events(spark, rows), "user_id", "ts").collect()
    got = {(str(r["cohort_week"]), r["week_offset"]): r["users"] for r in out}
    assert got[("2024-01-01", 0)] == 2
    assert got[("2024-01-01", 2)] == 1
    assert got[("2024-01-08", 0)] == 1
    assert ("2024-01-01", 1) not in got


def test_cohort_max_offset_filter(spark):
    rows = [
        (1, dt(2024, 1, 2, 10), "view"),
        (1, dt(2024, 3, 2, 10), "view"),
    ]
    out = ev.cohort_retention(
        _events(spark, rows), "user_id", "ts", max_offset=1
    ).collect()
    assert [r["week_offset"] for r in out] == [0]


def test_transition_matrix_counts_and_probs(spark):
    rows = [
        (1, dt(2024, 1, 1, 0), "a"),
        (1, dt(2024, 1, 1, 1), "b"),
        (1, dt(2024, 1, 1, 2), "a"),
        (1, dt(2024, 1, 1, 3), "c"),
        (2, dt(2024, 1, 1, 0), "a"),
        (2, dt(2024, 1, 1, 1), "b"),
    ]
    out = ev.transition_matrix(_events(spark, rows), "user_id", "ts", "event_type")
    got = {(r["from_state"], r["to_state"]): (r["n"], r["prob"]) for r in out.collect()}
    # from 'a': 2x a->b, 1x a->c
    assert got[("a", "b")] == (2, 0.666667)
    assert got[("a", "c")] == (1, 0.333333)
    assert got[("b", "a")] == (1, 1.0)
    # transitions never cross users: no c->anything, no b->a from user 2
    assert ("c", "a") not in got and len(got) == 3


def test_transition_matrix_single_event_user_no_rows(spark):
    rows = [(1, dt(2024, 1, 1), "a")]
    out = ev.transition_matrix(_events(spark, rows), "user_id", "ts", "event_type")
    assert out.count() == 0


def test_funnel_empty_slice_reports_zero_rows_per_step(spark):
    """Regression: a slice with no step events returned an EMPTY frame
    while the SQL form reports every step with users=0."""
    from datamine_v2_0_spark.operators import events as ev

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "other")],
        "user_id long, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = ev.funnel_steps(df, ["view", "click"], "user_id", "ts", "event_type")
    got = {(r.step, r.step_name): r.users for r in out.collect()}
    assert got == {(0, "view"): 0, (1, "click"): 0}
