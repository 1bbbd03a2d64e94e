"""End-to-end CPD stage test (FIXTURES.md §7 guidance): synthesize
piecewise-constant telemetry with programmed step changes; detected change
points must land within one 5 s bucket of the programmed steps. Also
exercises the dual-signal fallback branch."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import numpy as np
import pytest
from pyspark.sql import Row

from datamine_v2_0_spark.pipeline import cpd

T0 = datetime(2025, 7, 30, 0, 0, 0, tzinfo=timezone.utc)


def _telemetry(device: str, levels, seg_seconds=300, hz=2.0, seed=1,
               speed_levels=None, payload_noise=50.0):
    """~2 Hz rows; load_weight steps through `levels` every seg_seconds."""
    rng = np.random.default_rng(seed)
    rows = []
    i = 0
    for si, lvl in enumerate(levels):
        n = int(seg_seconds * hz)
        for j in range(n):
            t = T0 + timedelta(seconds=(si * seg_seconds) + j / hz)
            speed = (speed_levels[si] if speed_levels else 5.0) + rng.normal(0, 0.1)
            rows.append(
                Row(
                    device_date=f"{device}_2025-07-30",
                    ts=t,
                    load_weight=float(lvl + rng.normal(0, payload_noise)),
                    speed=float(speed),
                    hash_id=f"{device}-{i}",
                )
            )
            i += 1
    return rows


def test_cpd_detects_programmed_steps(spark):
    levels = [0.0, 40000.0, 0.0]     # load -> haul -> dump
    df = spark.createDataFrame(_telemetry("lake-605", levels))
    out = cpd.cpd_pipeline(
        df, "device_date", "ts", ["load_weight", "speed"], "hash_id",
        duration="5 seconds", penalty=1e7, min_size=10,
    ).collect()
    got = sorted(r["bucket_ts"] for r in out)
    expected = [T0 + timedelta(seconds=300), T0 + timedelta(seconds=600)]
    assert len(got) == 2, out
    for g, e in zip(got, expected):
        assert abs((g.replace(tzinfo=timezone.utc) - e).total_seconds()) <= 5.0


def test_cpd_dual_signal_fallback(spark):
    # payload flat (broken sensor) but speed carries the steps -> fallback
    rows = _telemetry(
        "lake-775g", [0.0, 0.0, 0.0], speed_levels=[2.0, 12.0, 2.0],
        payload_noise=0.01,
    )
    df = spark.createDataFrame(rows)
    out = cpd.cpd_pipeline(
        df, "device_date", "ts", ["load_weight", "speed"], "hash_id",
        duration="5 seconds", penalty=10.0, min_size=10,
        dual_threshold_stddev=1000.0,
    ).collect()
    assert out, "fallback produced no change points"
    assert all(r["signal_name"] == "speed" for r in out)
    got = sorted(r["bucket_ts"] for r in out)
    expected = [T0 + timedelta(seconds=300), T0 + timedelta(seconds=600)]
    assert len(got) == 2, out
    for g, e in zip(got, expected):
        assert abs((g.replace(tzinfo=timezone.utc) - e).total_seconds()) <= 5.0


def test_cpd_short_partition_no_output(spark):
    # < 2*min_size downsampled buckets -> insufficient data branch
    rows = _telemetry("lake-605-short", [0.0], seg_seconds=60)
    df = spark.createDataFrame(rows)
    out = cpd.cpd_pipeline(
        df, "device_date", "ts", ["load_weight"], "hash_id",
        duration="5 seconds", penalty=0.05, min_size=10,
    ).collect()
    assert out == []


def test_downsample_bucket_semantics(spark):
    rows = _telemetry("d", [10.0], seg_seconds=20, payload_noise=0.0)
    df = spark.createDataFrame(rows)
    ds = cpd.downsample(df, "device_date", "ts", ["load_weight"], "hash_id").collect()
    # 20 s at 2 Hz -> 4 left-closed 5 s buckets
    assert len(ds) == 4
    starts = sorted(r["bucket_ts"].replace(tzinfo=timezone.utc) for r in ds)
    assert starts == [T0 + timedelta(seconds=5 * i) for i in range(4)]
    for r in ds:
        assert r["load_weight"] == pytest.approx(10.0)
        # first id in bucket (min by ts)
        assert r["hash_id"].startswith("d-")


def test_penalty_sweep_and_tuning(spark):
    levels = [0.0, 40000.0, 0.0, 40000.0]
    df = spark.createDataFrame(_telemetry("lake-605", levels))
    ds = cpd.downsample(df, "device_date", "ts", ["load_weight"], "hash_id")
    penalties = [1e7, 1e14]  # sane / absurdly high
    sweep = cpd.penalty_sweep(
        ds, "device_date", "load_weight", "hash_id", penalties, min_size=10
    )
    # ground truth: one +/-30s window around each programmed step
    truth = spark.createDataFrame(
        [
            Row(
                gt_id=i,
                key="lake-605_2025-07-30",
                start=T0 + timedelta(seconds=300 * (i + 1) - 30),
                end=T0 + timedelta(seconds=300 * (i + 1) + 30),
            )
            for i in range(3)
        ]
    )
    tuned = {
        r["penalty"]: r
        for r in cpd.tune_penalty(
            sweep, truth, "key", "gt_id", "start", "end", penalties=penalties
        ).collect()
    }
    assert tuned[1e7]["recall"] == pytest.approx(1.0)      # finds all 3 steps
    assert tuned[1e14]["n_detected"] == 0                  # over-penalized
    assert tuned[1e14]["n_truth"] == 3
