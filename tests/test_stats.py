"""OLS trend / Mann–Whitney / seasonal anomalies / SCD2 — numpy and
hand-built ground truths (the contract oracles certify engine parity;
these certify the math)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from datamine_v2_0_spark.operators import stats, windows as win
from datamine_v2_0_spark.operators.timeseries import seasonal_baseline_anomalies


def test_linreg_matches_numpy(spark):
    rng = np.random.RandomState(3)
    x = rng.uniform(0, 10, 400)
    y = 2.5 * x - 4.0 + rng.normal(0, 0.5, 400)
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * 400, "x": x, "y": y})
    )
    row = stats.grouped_linreg(df, ["g"], "x", "y").first()
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert row.n == 400
    assert abs(row.slope - slope) < 1e-6
    assert abs(row.intercept - intercept) < 1e-6
    assert abs(row.r2 - r * r) < 1e-6


def test_linreg_degenerate_group_nulls(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["c", "c"], "x": [1.0, 1.0], "y": [2.0, 5.0]})
    )
    row = stats.grouped_linreg(df, ["g"], "x", "y").first()
    assert row.slope is None and row.r2 is None


def test_mann_whitney_hand_computed(spark):
    # A = {1,2,3}, B = {2,4,5}: midranks 1, 2.5, 2.5, 4, 5, 6
    # R_A = 1 + 2.5 + 4 = 7.5; U = 7.5 - 6 = 1.5
    df = spark.createDataFrame(
        pd.DataFrame(
            {"g": ["A", "A", "A", "B", "B", "B"],
             "v": [1.0, 2.0, 3.0, 2.0, 4.0, 5.0]}
        )
    )
    row = stats.mann_whitney_u(df, "g", "v", "A", "B").first()
    assert row.n_a == 3 and row.n_b == 3
    assert abs(row.u_stat - 1.5) < 1e-9
    # sigma^2 = 9/12 * (7 - (2^3-2)/(6*5)) = 0.75 * 6.8 = 5.1
    want_z = (1.5 - 4.5) / np.sqrt(5.1)
    assert abs(row.z_score - want_z) < 1e-6


def test_mann_whitney_matches_scipy_when_available(spark):
    scipy_stats = pytest.importorskip("scipy.stats")
    rng = np.random.RandomState(11)
    a = rng.normal(0, 1, 80)
    b = rng.normal(0.4, 1.2, 120)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"g": ["a"] * 80 + ["b"] * 120, "v": np.concatenate([a, b])}
        )
    )
    row = stats.mann_whitney_u(df, "g", "v", "a", "b").first()
    res = scipy_stats.mannwhitneyu(a, b, alternative="two-sided", method="asymptotic")
    assert abs(row.u_stat - res.statistic) < 1e-6


def test_seasonal_flags_planted_anomaly(spark):
    base = dt.datetime(2024, 1, 1)  # a Monday
    rows = []
    # 12 weeks of a flat-ish 10 +/- jitter signal at Monday 09:00 (the
    # spike contaminates its own slot's baseline, so enough clean
    # observations are needed for the z to clear threshold)
    for wk in range(12):
        rows.append(("k", base + dt.timedelta(weeks=wk, hours=9),
                     10.0 + 0.1 * wk))
    # the planted spike on the 13th Monday
    rows.append(("k", base + dt.timedelta(weeks=12, hours=9), 500.0))
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = seasonal_baseline_anomalies(df, ["key"], "ts", "value", 3.0)
    got = out.select("ts", "z_score").collect()
    assert len(got) == 1
    assert got[0].ts == base + dt.timedelta(weeks=12, hours=9)
    assert got[0].z_score > 2.0


def test_seasonal_zero_variance_slot_silent(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [("k", base + dt.timedelta(weeks=w, hours=9), 7.0) for w in range(4)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    assert seasonal_baseline_anomalies(df, ["key"], "ts", "value", 3.0).count() == 0


def test_scd_type2_planted_history(spark):
    d = dt.datetime
    rows = [
        (1, "LOW", d(2024, 1, 1), 10),
        (1, "LOW", d(2024, 1, 5), 11),
        (1, "HIGH", d(2024, 2, 1), 12),
        (1, "LOW", d(2024, 3, 1), 13),
        (2, "MED", d(2024, 1, 2), 14),
    ]
    df = spark.createDataFrame(
        rows, "k long, pri string, ts timestamp, ord long"
    )
    out = {
        (r.k, r.version): r
        for r in win.scd_type2(df, "k", "pri", "ts", "ord").collect()
    }
    assert len(out) == 4
    v1, v2, v3 = out[(1, 1)], out[(1, 2)], out[(1, 3)]
    assert (v1.pri, v1.valid_from, v1.valid_to, v1.is_current) == (
        "LOW", d(2024, 1, 1), d(2024, 2, 1), False)
    assert (v2.pri, v2.valid_from, v2.valid_to) == ("HIGH", d(2024, 2, 1), d(2024, 3, 1))
    assert (v3.pri, v3.valid_to, v3.is_current) == ("LOW", None, True)
    assert out[(2, 1)].is_current


def test_scd_type2_intervals_partition_time(spark, sf_dir):
    """Half-open intervals per key: each valid_from equals the previous
    valid_to, exactly one current version per key."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    scd = win.scd_type2(o, "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
    bad_chain = (
        scd.alias("a")
        .join(
            scd.alias("b"),
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("b.version") == F.col("a.version") + 1),
        )
        .filter(F.col("a.valid_to") != F.col("b.valid_from"))
        .count()
    )
    assert bad_chain == 0
    cur = scd.filter("is_current").groupBy("o_custkey").count()
    assert cur.filter("count != 1").count() == 0


def test_scd_type2_null_attr_opens_its_own_version(spark):
    """Regression: `!=` is NULL-unsafe, so a transition to or from a
    NULL attr produced NULL -> no change flag and the NULL run merged
    into the prior version. NULL runs must version like any value."""
    d = dt.datetime
    rows = [
        (1, "LOW", d(2024, 1, 1), 1),
        (1, None, d(2024, 2, 1), 2),
        (1, None, d(2024, 2, 5), 3),
        (1, "LOW", d(2024, 3, 1), 4),
        (3, None, d(2024, 1, 1), 5),  # key whose FIRST attr is NULL
        (3, "HI", d(2024, 2, 1), 6),
    ]
    df = spark.createDataFrame(
        rows, "k long, pri string, ts timestamp, ord long"
    )
    out = {
        (r.k, r.version): r
        for r in win.scd_type2(df, "k", "pri", "ts", "ord").collect()
    }
    assert len(out) == 5
    assert out[(1, 1)].pri == "LOW" and out[(1, 1)].valid_to == d(2024, 2, 1)
    assert out[(1, 2)].pri is None and out[(1, 2)].valid_from == d(2024, 2, 1)
    assert out[(1, 2)].valid_to == d(2024, 3, 1)
    assert out[(1, 3)].pri == "LOW" and out[(1, 3)].is_current
    assert out[(3, 1)].pri is None and not out[(3, 1)].is_current
    assert out[(3, 2)].pri == "HI" and out[(3, 2)].is_current
