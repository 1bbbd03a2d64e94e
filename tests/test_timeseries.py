"""Regular-grid resample with locf / linear-interpolation gap fill."""

from __future__ import annotations

from datetime import datetime as dt

import pytest

from datamine_v2_0_spark.operators import timeseries as tsr


def _run(spark, rows, bucket_seconds=3600, **kw):
    df = spark.createDataFrame(rows, ["dev", "ts", "v"])
    out = tsr.resample_gapfill(df, ["dev"], "ts", "v", bucket_seconds, **kw)
    return {
        (r["dev"], str(r["bucket"])): (r["value"], r["value_locf"], r["value_interp"])
        for r in out.collect()
    }


def test_gapfill_fills_interior_gap(spark):
    rows = [
        ("a", dt(2024, 1, 1, 0, 10), 10.0),
        ("a", dt(2024, 1, 1, 3, 20), 40.0),  # hours 1 and 2 are gaps
    ]
    got = _run(spark, rows)
    assert len(got) == 4
    raw, locf, interp = got[("a", "2024-01-01 01:00:00")]
    assert raw is None
    assert locf == 10.0
    assert interp == pytest.approx(20.0, abs=1e-9)  # 10 + (40-10)*1/3
    _, locf2, interp2 = got[("a", "2024-01-01 02:00:00")]
    assert locf2 == 10.0
    assert interp2 == pytest.approx(30.0, abs=1e-9)


def test_gapfill_bucket_agg_and_edges(spark):
    rows = [
        ("a", dt(2024, 1, 1, 0, 5), 1.0),
        ("a", dt(2024, 1, 1, 0, 55), 3.0),  # same bucket -> avg 2.0
        ("a", dt(2024, 1, 1, 1, 30), 7.0),
    ]
    got = _run(spark, rows)
    assert got[("a", "2024-01-01 00:00:00")] == (2.0, 2.0, 2.0)
    assert got[("a", "2024-01-01 01:00:00")] == (7.0, 7.0, 7.0)
    assert len(got) == 2  # grid spans observed buckets only


def test_gapfill_per_key_grids_independent(spark):
    rows = [
        ("a", dt(2024, 1, 1, 0, 0), 1.0),
        ("a", dt(2024, 1, 1, 2, 0), 3.0),
        ("b", dt(2024, 1, 1, 5, 0), 9.0),
    ]
    got = _run(spark, rows)
    a_buckets = {k for k in got if k[0] == "a"}
    b_buckets = {k for k in got if k[0] == "b"}
    assert len(a_buckets) == 3 and len(b_buckets) == 1


def test_gapfill_agg_variants(spark):
    rows = [
        ("a", dt(2024, 1, 1, 0, 5), 1.0),
        ("a", dt(2024, 1, 1, 0, 55), 3.0),
    ]
    got = _run(spark, rows, agg="max")
    assert got[("a", "2024-01-01 00:00:00")][0] == 3.0
    got = _run(spark, rows, agg="count")
    assert got[("a", "2024-01-01 00:00:00")][0] == 2.0


def test_ewma_recurrence_hand_computed(spark):
    rows = [
        ("a", dt(2024, 1, 1, 0), 10.0),
        ("a", dt(2024, 1, 1, 1), 20.0),
        ("a", dt(2024, 1, 1, 2), 0.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = tsr.ewma_smooth(df, ["k"], "ts", "v", alpha=0.5)
    got = {str(r["ts"]): r["ewma"] for r in out.collect()}
    assert got["2024-01-01 00:00:00"] == pytest.approx(10.0)
    assert got["2024-01-01 01:00:00"] == pytest.approx(15.0)   # .5*20+.5*10
    assert got["2024-01-01 02:00:00"] == pytest.approx(7.5)    # .5*0+.5*15
    assert out.count() == 3  # one row per input row


def test_ewma_keys_independent_and_sorted(spark):
    # rows arrive out of ts order; each key folds its own series
    rows = [
        ("b", dt(2024, 1, 1, 1), 100.0),
        ("a", dt(2024, 1, 1, 1), 0.0),
        ("b", dt(2024, 1, 1, 0), 0.0),
        ("a", dt(2024, 1, 1, 0), 8.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = tsr.ewma_smooth(df, ["k"], "ts", "v", alpha=0.25)
    got = {(r["k"], str(r["ts"])): r["ewma"] for r in out.collect()}
    assert got[("a", "2024-01-01 00:00:00")] == pytest.approx(8.0)
    assert got[("a", "2024-01-01 01:00:00")] == pytest.approx(6.0)
    assert got[("b", "2024-01-01 00:00:00")] == pytest.approx(0.0)
    assert got[("b", "2024-01-01 01:00:00")] == pytest.approx(25.0)


def test_ohlc_first_last_and_envelope(spark):
    rows = [
        ("a", dt(2024, 1, 1, 2), 5.0, 1),
        ("a", dt(2024, 1, 1, 0), 3.0, 2),   # earliest -> open
        ("a", dt(2024, 1, 1, 23), 1.0, 3),  # latest -> close
        ("a", dt(2024, 1, 1, 12), 9.0, 4),  # high
        ("a", dt(2024, 1, 2, 1), 4.0, 5),   # next day bucket
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v", "eid"])
    out = tsr.ohlc_resample(df, ["k"], "ts", "v", 86400, tiebreak="eid")
    got = {str(r["bucket"]): r for r in out.collect()}
    d1 = got["2024-01-01 00:00:00"]
    assert (d1["open"], d1["high"], d1["low"], d1["close"]) == (3.0, 9.0, 1.0, 1.0)
    assert d1["vsum"] == pytest.approx(18.0)
    assert d1["n"] == 4
    assert got["2024-01-02 00:00:00"]["open"] == 4.0


def test_ohlc_same_ts_tiebreak(spark):
    rows = [
        ("a", dt(2024, 1, 1), 1.0, 2),
        ("a", dt(2024, 1, 1), 7.0, 1),  # same ts, lower eid -> open
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v", "eid"])
    r = tsr.ohlc_resample(df, ["k"], "ts", "v", 86400, tiebreak="eid").collect()[0]
    assert r["open"] == 7.0 and r["close"] == 1.0


def test_cusum_accumulates_persistent_shift(spark):
    # target 10: first half on-target, second half shifted by +2 —
    # cusum_up must ramp through the shifted tail and alarm
    rows = [("a", i, 10.0) for i in range(10)] + [
        ("a", 10 + i, 12.0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = {r["ts"]: r for r in tsr.cusum_detect(
        df, ["k"], "ts", "v", target=10.0, slack=0.5, threshold=10.0
    ).collect()}
    assert out[9]["cusum_up"] == 0.0          # on-target: no accumulation
    assert out[19]["cusum_up"] == pytest.approx(15.0)  # 10 * (2 - 0.5)
    assert out[19]["alarm"] and not out[9]["alarm"]
    assert all(out[i]["cusum_down"] == 0.0 for i in out)


def test_cusum_resets_at_zero(spark):
    # a downward excursion cannot push the upper statistic negative
    rows = [("a", 0, 0.0), ("a", 1, 100.0), ("a", 2, 0.0), ("a", 3, 0.0)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = {r["ts"]: r for r in tsr.cusum_detect(
        df, ["k"], "ts", "v", target=50.0
    ).collect()}
    assert out[0]["cusum_up"] == 0.0
    assert out[1]["cusum_up"] == 50.0
    assert out[2]["cusum_up"] == 0.0          # max(0, 50 - 50)
    assert out[3]["cusum_up"] == 0.0
    # the down statistic keeps accumulating across the low tail
    assert out[2]["cusum_down"] == pytest.approx(50.0)
    assert out[3]["cusum_down"] == pytest.approx(100.0)


def test_ewma_null_emits_null_and_carries_state(spark):
    rows = [("a", 0, 10.0), ("a", 1, None), ("a", 2, 20.0)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = {r["ts"]: r["ewma"] for r in tsr.ewma_smooth(
        df, ["k"], "ts", "v", alpha=0.5
    ).collect()}
    assert out[0] == 10.0
    assert out[1] is None                      # null emits null...
    assert out[2] == pytest.approx(15.0)       # ...but state survives


def test_cusum_null_emits_null_and_carries_state(spark):
    rows = [("a", 0, 60.0), ("a", 1, None), ("a", 2, 60.0)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = {r["ts"]: r["cusum_up"] for r in tsr.cusum_detect(
        df, ["k"], "ts", "v", target=50.0
    ).collect()}
    assert out[0] == 10.0 and out[1] is None
    assert out[2] == pytest.approx(20.0)
