"""Silver transform + feature stage tests over a synthetic raw fixture
(FIXTURES.md §1/§3/§4 shapes)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row, functions as F

from datamine_v2_0_spark.pipeline.features import build_features
from datamine_v2_0_spark.pipeline.silver import silver_transform
from datamine_v2_0_spark.schemas import RAW_TELEMETRY_SCHEMA


def _raw_row(ts, dev="lake-605-8-0896", state="idle", sw="autonomous",
             eng="t", speed=1.0, pos="{33.25793,-97.83007,200.0}",
             weight=100.0, prndl="drive", brake="f", extras='{"k":1}'):
    return Row(
        timestamp=ts, device_id=dev, state=state, software_state=sw,
        system_engaged=eng, current_speed=speed, current_position=pos,
        load_weight=weight, prndl=prndl, parking_brake_applied=brake,
        extras=extras,
    )


@pytest.fixture(scope="module")
def raw_df(spark):
    rows = [
        _raw_row("2025-07-30 00:00:05.734539+00"),
        _raw_row("2025-07-30 00:00:06.100000+00", state="loadToDump",
                 prndl="d", extras="not json"),
        _raw_row("2025-07-30 00:00:06.600000+00", state="JUNKSTATE",
                 pos="garbage", eng="x"),
        _raw_row(None),                       # dropped: null ts
        _raw_row("2025-07-30 00:00:07+00", dev=None),   # dropped: null dev
        _raw_row("2025-07-31 00:00:01+00"),   # second device_date
    ]
    return spark.createDataFrame(rows, RAW_TELEMETRY_SCHEMA)


def test_silver_transform_semantics(spark, raw_df):
    out = silver_transform(raw_df, ingested_at=F.lit("2025-08-01").cast("timestamp"))
    rows = {r["raw_event_hash_id"]: r for r in out.collect()}
    assert len(rows) == 4  # two dropped

    expected_hash = hashlib.sha256(
        b"lake-605-8-0896|2025-07-30 00:00:05.734539+00"
    ).hexdigest()
    assert expected_hash in rows
    r0 = rows[expected_hash]
    assert r0["device_date"] == "lake-605-8-0896_2025-07-30"
    assert r0["state"] == "idle" and r0["system_engaged"] is True
    assert r0["current_position"]["latitude"] == pytest.approx(33.25793)
    assert r0["extras"] == '{"k":1}'

    # trailing-zero microsecond trim: .100000 -> .1 in the hashed text
    h_trim = hashlib.sha256(
        b"lake-605-8-0896|2025-07-30 00:00:06.1+00"
    ).hexdigest()
    assert h_trim in rows
    assert rows[h_trim]["state"] == "hauling"   # loadToDump
    assert rows[h_trim]["prndl"] == "drive"     # d
    assert rows[h_trim]["extras"] == '"not json"'

    h_junk = hashlib.sha256(
        b"lake-605-8-0896|2025-07-30 00:00:06.6+00"
    ).hexdigest()
    junk = rows[h_junk]
    assert junk["state"] == "unknown"
    assert junk["current_position"] is None
    assert junk["system_engaged"] is None


def test_silver_incremental_anti_join(spark, raw_df):
    first = silver_transform(raw_df)
    again = silver_transform(raw_df, existing=first.select("raw_event_hash_id"))
    assert again.count() == 0


def test_build_features(spark, raw_df):
    silver = silver_transform(raw_df)
    feats = build_features(silver)
    rows = sorted(feats.collect(), key=lambda r: (str(r["device_date"]), r["timestamp"]))
    day1 = [r for r in rows if r["device_date"] == "lake-605-8-0896_2025-07-30"]
    assert len(day1) == 3

    # zone join: the fixture position sits inside the Crusher polygon
    assert day1[0]["location_type"] == "Crusher"
    assert day1[0]["is_in_dumping_zone"] is True
    assert day1[0]["is_in_loading_zone"] is False
    # garbage position -> default zone
    assert day1[2]["location_type"] == "Haul Road / Other"

    # windows: first row's delta is NULL, later ones positive
    assert day1[0]["time_delta_s"] is None
    assert day1[1]["time_delta_s"] == pytest.approx(0.365461, abs=1e-6)

    # one-hot + interactions
    assert day1[0]["prndl_drive"] is True and day1[0]["prndl_park"] is False
    assert day1[0]["is_heavy_load"] is False
    # speed 1.0 >= 0.5 -> not stationary -> time_in_stationary_state == 0
    assert day1[0]["is_stationary"] is False
    assert day1[0]["time_in_stationary_state"] == 0.0

    # load_weight constant 100 -> stddev 0 -> unreliable payload
    assert day1[0]["has_reliable_payload"] is False


def test_feature_stage_single_exchange(spark, raw_df):
    """All per-device-date windows must share ONE sort+exchange: the plan
    should contain exactly one shuffle for (device_id, device_date) windows
    plus one for the device_id partition stddev."""
    silver = silver_transform(raw_df)
    feats = build_features(silver)
    plan = feats._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, f"window stack re-shuffles: {n_exchanges} exchanges"
