"""Skew operators + sessionize/bfill: semantics-preservation checks."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import Row, functions as F

from datamine_v2_0_spark.operators import windows as win
from datamine_v2_0_spark.operators.skew import salted_agg, salted_join
from datamine_v2_0_spark.plans import count_exchanges

T0 = datetime(2025, 1, 1, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def skewed_df(spark):
    # one hot key (90%), many cold keys
    rows = [Row(k="hot", v=float(i)) for i in range(900)]
    rows += [Row(k=f"c{i}", v=float(i)) for i in range(100)]
    return spark.createDataFrame(rows)


def test_salted_agg_matches_plain(spark, skewed_df):
    plain = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in skewed_df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
             F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in salted_agg(
            skewed_df,
            ["k"],
            {"n": (F.count(F.lit(1)), F.sum("n")),
             "s": (F.sum("v"), F.sum("s")),
             "mx": (F.max("v"), F.max("mx"))},
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, skewed_df):
    dim = spark.createDataFrame(
        [Row(k="hot", label="H")] + [Row(k=f"c{i}", label=f"L{i}") for i in range(100)]
    )
    plain = sorted(
        (r["k"], r["v"], r["label"])
        for r in skewed_df.join(dim, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["label"])
        for r in salted_join(skewed_df, dim, "k", salt_buckets=4).collect()
    )
    assert salted == plain


def test_salted_join_rejects_right_outer(spark, skewed_df):
    # replication of the small side makes right/full joins emit unmatched
    # rows once per salt bucket — the operator must refuse them
    dim = spark.createDataFrame([Row(k="hot", label="H")])
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(skewed_df, dim, "k", salt_buckets=4, how="right")
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(skewed_df, dim, "k", salt_buckets=4, how="full")


def test_sessionize(spark):
    rows = [
        Row(u=1, ts=T0 + timedelta(seconds=s), i=n)
        for n, s in enumerate([0, 10, 20, 5000, 5010, 99999])
    ]
    df = spark.createDataFrame(rows)
    w = win.ordered_window(["u"], ["ts", "i"])
    got = [r["s"] for r in
           df.select(win.sessionize("ts", w, 60.0).alias("s")).orderBy("ts").collect()]
    assert got == [1, 1, 1, 2, 2, 3]


def test_bfill(spark):
    df = spark.createDataFrame(
        [Row(g="a", i=1, v=None), Row(g="a", i=2, v=2.0),
         Row(g="a", i=3, v=None), Row(g="a", i=4, v=4.0)],
        "g string, i int, v double",
    )
    w = win.ordered_window(["g"], ["i"])
    got = [r["b"] for r in df.select(win.bfill("v", w).alias("b")).orderBy("i").collect()]
    assert got == [2.0, 2.0, 4.0, 4.0]
