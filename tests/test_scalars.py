"""Golden tests for the scalar parity contracts — above all the Postgres
``timestamptz::text`` rendering that every downstream join key depends on
(SURVEY.md §7 risk 1)."""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone

import pytest
from pyspark.sql import Row, functions as F

from datamine_v2_0_spark.functions.scalars import (
    bool_from_text,
    clamp,
    device_date,
    enum_decode,
    json_string_literal,
    null_if_outside,
    parse_position,
    pg_timestamptz_text,
    raw_event_hash_id,
    validate_json,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


# Known Postgres renderings: trailing zeros trimmed, dot dropped when zero.
PG_GOLDEN = [
    ("2025-07-30 00:00:05.734539", "2025-07-30 00:00:05.734539+00"),
    ("2025-07-30 00:00:05.100000", "2025-07-30 00:00:05.1+00"),
    ("2025-07-30 00:00:05.000000", "2025-07-30 00:00:05+00"),
    ("2025-07-30 00:00:05.120000", "2025-07-30 00:00:05.12+00"),
    ("2025-07-30 00:00:05.000001", "2025-07-30 00:00:05.000001+00"),
    ("1999-12-31 23:59:59.999999", "1999-12-31 23:59:59.999999+00"),
    ("2025-01-01 00:00:00.000000", "2025-01-01 00:00:00+00"),
]


@pytest.mark.parametrize("raw,expected", PG_GOLDEN)
def test_pg_timestamptz_text_golden(spark, raw, expected):
    df = spark.createDataFrame([Row(ts=_ts(raw))])
    got = df.select(pg_timestamptz_text(F.col("ts")).alias("t")).first()["t"]
    assert got == expected


def test_raw_event_hash_id_matches_sha256(spark):
    dev, raw = "lake-605-8-0896", "2025-07-30 00:00:05.734539"
    expected = hashlib.sha256(
        f"{dev}|2025-07-30 00:00:05.734539+00".encode()
    ).hexdigest()
    df = spark.createDataFrame([Row(device_id=dev, ts=_ts(raw))])
    got = df.select(
        raw_event_hash_id(F.col("device_id"), F.col("ts")).alias("h")
    ).first()["h"]
    assert got == expected
    assert len(got) == 64


def test_raw_event_hash_id_null_propagates(spark):
    df = spark.createDataFrame(
        [Row(device_id=None, ts=_ts("2025-07-30 00:00:05")),
         Row(device_id="d", ts=None)],
        "device_id string, ts timestamp",
    )
    got = [r["h"] for r in df.select(
        raw_event_hash_id(F.col("device_id"), F.col("ts")).alias("h")
    ).collect()]
    assert got == [None, None]


def test_device_date(spark):
    df = spark.createDataFrame([Row(d="lake-605", ts=_ts("2025-07-30 13:00:00"))])
    got = df.select(device_date(F.col("d"), F.col("ts")).alias("dd")).first()["dd"]
    assert got == "lake-605_2025-07-30"


def test_parse_position(spark):
    rows = [
        Row(p="{12.5,-61.25,100.5}"),
        Row(p="  {12.5 , -61.25 , 100.5}  "),
        Row(p="{95.0,10.0,5.0}"),   # lat out of range -> NULL
        Row(p="garbage"),
        Row(p=None),
    ]
    df = spark.createDataFrame(rows, "p string")
    got = df.select(parse_position(F.col("p")).alias("pos")).collect()
    assert got[0]["pos"].asDict() == {
        "longitude": -61.25, "latitude": 12.5, "altitude": 100.5
    }
    assert got[1]["pos"]["latitude"] == 12.5
    assert got[2]["pos"] is None
    assert got[3]["pos"] is None
    assert got[4]["pos"] is None


def test_enum_decode(spark):
    mapping = {"idle": "idle", "loading": "loading", "loadtodump": "hauling"}
    rows = [Row(s="  IDLE "), Row(s="loadToDump"), Row(s="junk"), Row(s=None)]
    df = spark.createDataFrame(rows, "s string")
    got = [r["e"] for r in df.select(
        enum_decode(F.col("s"), mapping).alias("e")
    ).collect()]
    assert got == ["idle", "hauling", "unknown", "unknown"]


def test_validate_json(spark):
    rows = [
        Row(j='{"a": 1}'),
        Row(j="[1, 2]"),
        Row(j='plain "text" with \\ backslash'),
        Row(j=""),
        Row(j=None),
    ]
    df = spark.createDataFrame(rows, "j string")
    got = [r["v"] for r in df.select(validate_json(F.col("j")).alias("v")).collect()]
    assert got[0] == '{"a": 1}'
    assert got[1] == "[1, 2]"
    assert got[2] == '"plain \\"text\\" with \\\\ backslash"'
    assert got[3] is None
    assert got[4] is None


def test_json_string_literal_roundtrip(spark):
    import json

    samples = ['simple', 'has "quotes"', "back\\slash", "unié"]
    df = spark.createDataFrame([Row(s=s) for s in samples], "s string")
    got = [r["v"] for r in df.select(
        json_string_literal(F.col("s")).alias("v")
    ).collect()]
    for raw, lit in zip(samples, got):
        assert json.loads(lit) == raw


def test_bool_from_text(spark):
    rows = [Row(b=x) for x in ["t", "TRUE", "1", "f", "False", "0", "junk", None]]
    df = spark.createDataFrame(rows, "b string")
    got = [r["v"] for r in df.select(bool_from_text(F.col("b")).alias("v")).collect()]
    assert got == [True, True, True, False, False, False, None, None]


def test_clamp_and_null_if_outside(spark):
    df = spark.createDataFrame(
        [Row(x=-5.0), Row(x=25.0), Row(x=75.0)], "x double"
    )
    got = df.select(
        clamp(F.col("x"), 0.0, 50.0).alias("c"),
        null_if_outside(F.col("x"), 0.0, 50.0).alias("n"),
    ).collect()
    assert [r["c"] for r in got] == [0.0, 25.0, 50.0]
    assert [r["n"] for r in got] == [None, 25.0, None]


def test_wkt_point_roundtrip_and_edges(spark):
    from datamine_v2_0_spark.functions.wkt import parse_wkt_point, wkt_point

    df = spark.createDataFrame(
        [Row(lon=-105.123456789, lat=40.5, alt=1609.3),
         Row(lon=0.0, lat=-0.25, alt=None)],
        "lon double, lat double, alt double",
    )
    got = df.select(
        wkt_point(F.col("lon"), F.col("lat"), F.col("alt")).alias("w3"),
        wkt_point(F.col("lon"), F.col("lat")).alias("w2"),
    ).collect()
    assert got[0]["w3"] == "POINT Z (-105.123457 40.500000 1609.300000)"
    assert got[0]["w2"] == "POINT (-105.123457 40.500000)"
    assert got[1]["w3"] is None  # null alt -> null POINT Z
    assert got[1]["w2"] == "POINT (0.000000 -0.250000)"

    back = spark.createDataFrame(
        [Row(w="POINT Z (-105.123457 40.5 1609.3)"),
         Row(w="POINT (1.5 2.5)"),
         Row(w="not wkt at all")],
        "w string",
    ).select(parse_wkt_point(F.col("w")).alias("p")).collect()
    assert back[0]["p"]["lon"] == -105.123457 and back[0]["p"]["alt"] == 1609.3
    assert back[1]["p"]["lat"] == 2.5 and back[1]["p"]["alt"] is None
    assert back[2]["p"]["lon"] is None


def test_json_extract_typed(spark):
    from datamine_v2_0_spark.functions.scalars import json_extract_typed
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [('{"k": 7, "s": "x"}',), ('{"s": "no k"}',), ("not json",), (None,),
         ('{"k": "abc", "s": "y"}',)],  # k present but uncastable to int
        ["props"],
    )
    got = df.select(
        json_extract_typed(F.col("props"), "$.k", "int").alias("k"),
        json_extract_typed(F.col("props"), "$.s", "string").alias("s"),
    ).collect()
    # the uncastable row must yield NULL, not raise — under ANSI mode
    # (PySpark 4.x default) a plain .cast would throw CAST_INVALID_INPUT
    assert [(r["k"], r["s"]) for r in got] == [
        (7, "x"), (None, "no k"), (None, None), (None, None), (None, "y"),
    ]
