"""The SURVEY.md §7 minimum end-to-end slice as one test: raw telemetry
CSV on disk → validated read → silver transform → feature stack → 5 s
downsample + PELT → candidate events written as partitioned parquet —
and the programmed load/dump steps come back out."""

from __future__ import annotations

import csv
from datetime import datetime, timedelta, timezone

import numpy as np
import pytest
from pyspark.sql import functions as F

from datamine_v2_0_spark.operators.validation import proximity_match
from datamine_v2_0_spark.pipeline.cpd import cpd_pipeline
from datamine_v2_0_spark.pipeline.features import build_features
from datamine_v2_0_spark.pipeline.silver import silver_transform
from datamine_v2_0_spark.schemas import RAW_TELEMETRY_COLUMNS, RAW_TELEMETRY_SCHEMA
from datamine_v2_0_spark.sources.csv_io import read_csv_validated
from datamine_v2_0_spark.sources.parquet_io import (
    list_partitions,
    write_parquet_partitioned,
)

T0 = datetime(2025, 7, 30, 6, 0, 0, tzinfo=timezone.utc)
STEP_SECONDS = [600, 1200, 1800]   # programmed load/dump boundaries


def _write_raw_csv(path):
    """~2 Hz single device-day with load_weight steps at STEP_SECONDS."""
    rng = np.random.default_rng(5)
    rows = []
    levels = [0.0, 45000.0, 45000.0, 0.0]   # empty -> loaded -> ... -> dumped
    bounds = [0] + STEP_SECONDS + [2400]
    for seg, lvl in enumerate(levels):
        for s2 in range(bounds[seg] * 2, bounds[seg + 1] * 2):
            t = T0 + timedelta(seconds=s2 / 2.0)
            ts = t.strftime("%Y-%m-%d %H:%M:%S.%f") + "+00"
            w = lvl + rng.normal(0, 300.0)
            speed = max(0.0, 3.0 + rng.normal(0, 0.2))
            rows.append(
                [
                    ts, "lake-605-8-0896", "loadToDump", "autonomous", "t",
                    f"{speed:.3f}", "{33.25793,-97.83007,210.0}",
                    f"{w:.1f}", "d", "f", '{"seq": %d}' % s2,
                ]
            )
    with open(path, "w", newline="") as fh:
        wtr = csv.writer(fh)
        wtr.writerow(RAW_TELEMETRY_COLUMNS)
        wtr.writerows(rows)
    return len(rows)


def test_full_pipeline_csv_to_candidates(spark, tmp_path):
    raw_csv = tmp_path / "raw.csv"
    n_raw = _write_raw_csv(raw_csv)

    raw = read_csv_validated(spark, str(raw_csv), RAW_TELEMETRY_SCHEMA)
    silver = silver_transform(
        raw, ingested_at=F.lit("2025-08-01").cast("timestamp")
    )
    assert silver.count() == n_raw
    assert silver.select("raw_event_hash_id").distinct().count() == n_raw

    feats = build_features(silver)
    row = feats.orderBy("timestamp").limit(1).collect()[0]
    assert row["location_type"] == "Crusher"
    assert row["state"] == "hauling"

    candidates = cpd_pipeline(
        feats,
        "device_date",
        "timestamp",
        ["load_weight"],
        "raw_event_hash_id",
        duration="5 seconds",
        penalty=1e8,        # raw-scale l2 cost: high penalty isolates the 2 jumps
        min_size=10,
    )
    out_dir = str(tmp_path / "candidates")
    write_parquet_partitioned(
        candidates.withColumnRenamed("partition_key", "device_date"),
        out_dir,
        ["device_date"],
    )
    assert list_partitions(spark, out_dir, "device_date") == [
        "lake-605-8-0896_2025-07-30"
    ]
    back = spark.read.parquet(out_dir)
    got = sorted(
        r["bucket_ts"].replace(tzinfo=timezone.utc) for r in back.collect()
    )
    # weight steps at 600 s and 1800 s (the 1200 s boundary has no level
    # change); each detected within one 5 s bucket
    expected = [T0 + timedelta(seconds=600), T0 + timedelta(seconds=1800)]
    assert len(got) == 2, got
    for g, e in zip(got, expected):
        assert abs((g - e).total_seconds()) <= 5.0

    # the candidate hash ids resolve back to real silver rows near the steps
    matched = proximity_match(
        back.select(
            F.col("bucket_ts").alias("cts"),
            F.lit("lake-605-8-0896").alias("cdev"),
            F.monotonically_increasing_id().alias("cid"),
        ),
        silver.select(F.col("timestamp").alias("sts"), F.col("device_id").alias("sdev")),
        [("cdev", "sdev")],
        "cts",
        "sts",
        10.0,
        "cid",
    )
    assert matched.filter(F.col("sts").isNotNull()).count() == 2


def test_pelt_kernel_meets_reference_anchor():
    """Reference anchor: ~9k downsampled points -> 666 cps in ~10 s
    (BASELINE.md). The pruned DP must stay well under that."""
    import time

    from datamine_v2_0_spark.functions.signal import pelt_l2

    rng = np.random.default_rng(7)
    seg_lens = rng.integers(8, 20, 666)
    levels = rng.uniform(0, 60000, 666)
    sig = np.concatenate(
        [np.full(l, v) + rng.normal(0, 500, l) for l, v in zip(seg_lens, levels)]
    )[:9000]
    z = (sig - sig.mean()) / sig.std()
    t0 = time.time()
    bkps = pelt_l2(z, penalty=0.05, min_size=10, jump=1)
    elapsed = time.time() - t0
    assert len(bkps) > 400          # dense change points detected
    assert elapsed < 5.0, f"kernel too slow: {elapsed:.1f}s"
