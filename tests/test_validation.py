"""Validation-suite operator tests: ground-truth diff, overlap recall,
proximity matching."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import Row

from datamine_v2_0_spark.operators.validation import (
    ground_truth_diff,
    overlap_recall,
    proximity_match,
)

T0 = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _t(s):
    return T0 + timedelta(seconds=s)


def test_ground_truth_diff(spark):
    pred = spark.createDataFrame(
        [Row(dev="a", ts=_t(0), pred="load"), Row(dev="a", ts=_t(1), pred="dump"),
         Row(dev="a", ts=_t(2), pred="load"), Row(dev="a", ts=_t(9), pred="x")]
    )
    truth = spark.createDataFrame(
        [Row(dev="a", ts=_t(0), actual="load"), Row(dev="a", ts=_t(1), actual="load"),
         Row(dev="a", ts=_t(2), actual="load")]
    )
    got = {(r["predicted"], r["actual"]): (r["n"], r["match"])
           for r in ground_truth_diff(pred, truth, ["dev", "ts"], "pred", "actual").collect()}
    assert got[("load", "load")] == (2, True)
    assert got[("dump", "load")] == (1, False)
    assert ("x", None) not in got  # unmatched rows excluded by inner join


def test_overlap_recall(spark):
    truth = spark.createDataFrame(
        [Row(gid=1, dev="a", s=_t(0), e=_t(10)),
         Row(gid=2, dev="a", s=_t(100), e=_t(110)),
         Row(gid=3, dev="b", s=_t(0), e=_t(10))]
    )
    det = spark.createDataFrame(
        [Row(ddev="a", ds=_t(8), de=_t(12)),     # overlaps gid 1
         Row(ddev="a", ds=_t(50), de=_t(60)),    # overlaps nothing
         Row(ddev="b", ds=_t(200), de=_t(210))]  # wrong window
    )
    r = overlap_recall(
        truth, det, "gid", [("dev", "ddev")], "s", "e", "ds", "de"
    ).first()
    assert (r["n_truth"], r["n_detected"]) == (3, 1)
    assert r["recall"] == pytest.approx(1 / 3)


def test_proximity_match(spark):
    truth = spark.createDataFrame(
        [Row(gid=1, dev="a", ts=_t(60)), Row(gid=2, dev="a", ts=_t(1000))]
    )
    cands = spark.createDataFrame(
        [Row(cdev="a", cts=_t(50)), Row(cdev="a", cts=_t(65)),
         Row(cdev="a", cts=_t(5000))]
    )
    got = {r["gid"]: r for r in proximity_match(
        truth, cands, [("dev", "cdev")], "ts", "cts", 120.0, "gid"
    ).collect()}
    assert got[1]["cts"].replace(tzinfo=timezone.utc) == _t(65)   # nearest within ±120s
    assert got[2]["cts"] is None                                  # no candidate in range


def test_integrity_report_full_bundle(spark):
    """The reference's post-load check bundle: count, PK uniqueness,
    null criticals, time range (05_load_candidates_to_db.py:197-259)."""
    from datetime import datetime, timezone

    from datamine_v2_0_spark.operators.aggregates import integrity_report

    t = lambda s: datetime(2025, 1, 1, 0, 0, s, tzinfo=timezone.utc)
    df = spark.createDataFrame(
        [(1, "a", t(0)), (2, None, t(30)), (2, "c", t(10))],
        "k long, v string, ts timestamp",
    )
    r = integrity_report(df, "k", ["v"], ts_col="ts").first()
    assert r["row_count"] == 3
    assert r["distinct_keys"] == 2       # duplicate PK surfaces here
    assert r["null_v"] == 1
    assert r["time_min"] == t(0).replace(tzinfo=None)
    assert r["time_max"] == t(30).replace(tzinfo=None)
