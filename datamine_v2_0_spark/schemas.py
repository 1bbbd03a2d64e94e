"""Declared schemas, enum domains, and spatial reference data.

The reference is DDL-first (fixed schemas, no inference); we mirror
that with explicit StructTypes everywhere (SURVEY.md §1.3).

Sources studied (behavior only, no code copied):
- raw CSV schema: `STEP 1 - Ingest Raw Telemetry/01_ingest_raw_telemetry.py:174-178`
- silver DDL: `STEP 2 - Transform Raw Telemetry/02_raw_telemetry_transform.sql:50-65`
- enum CASE maps: `STEP 2 - Transform Raw Telemetry/02_raw_telemetry_transform.py:282-327`
- zones: `STEP 1 - Ingest Raw Telemetry/00_database_setup.sql:8-22`
- candidate events: `STEP 5 - CPD/05_load_candidates_to_db.py:96-98`
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Raw CSV input (bronze). All strings at the edge; typing happens in silver.
# 11 columns, header-validated on read.
# ---------------------------------------------------------------------------
RAW_TELEMETRY_COLUMNS = [
    "timestamp",
    "device_id",
    "state",
    "software_state",
    "system_engaged",
    "current_speed",
    "current_position",
    "load_weight",
    "prndl",
    "parking_brake_applied",
    "extras",
]

RAW_TELEMETRY_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.StringType()),
        T.StructField("device_id", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("software_state", T.StringType()),
        T.StructField("system_engaged", T.StringType()),
        T.StructField("current_speed", T.DoubleType()),
        T.StructField("current_position", T.StringType()),
        T.StructField("load_weight", T.DoubleType()),
        T.StructField("prndl", T.StringType()),
        T.StructField("parking_brake_applied", T.StringType()),
        T.StructField("extras", T.StringType()),
    ]
)

# GEOGRAPHY(POINTZ,4326) → struct; consumers only use ST_X/ST_Y/ST_Z
# (`STEP 3 - EDA Analysis/database_pipeline.py:101-103`).
POSITION_STRUCT = T.StructType(
    [
        T.StructField("longitude", T.DoubleType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("altitude", T.DoubleType()),
    ]
)

TRANSFORMED_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("ingested_at", T.TimestampType()),
        T.StructField("raw_event_hash_id", T.StringType()),
        T.StructField("device_id", T.StringType()),
        T.StructField("device_date", T.StringType()),
        T.StructField("system_engaged", T.BooleanType()),
        T.StructField("parking_brake_applied", T.BooleanType()),
        T.StructField("current_position", POSITION_STRUCT),
        T.StructField("current_speed", T.DoubleType()),
        T.StructField("load_weight", T.DoubleType()),
        T.StructField("state", T.StringType()),
        T.StructField("software_state", T.StringType()),
        T.StructField("prndl", T.StringType()),
        T.StructField("extras", T.StringType()),
    ]
)

CANDIDATE_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("device_id", T.StringType()),
        T.StructField("timestamp_start", T.TimestampType()),
        T.StructField("raw_event_hash_id", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Enum domains. The reference maps raw vendor strings to closed enums via
# CASE LOWER(TRIM(COALESCE(x,'unknown'))); unmapped → 'unknown'. We keep the
# mapping as *data* (broadcast-join-able lookup, also usable in when-chains).
# ---------------------------------------------------------------------------
STATE_MAP = {
    "idle": "idle",
    "loading": "loading",
    "loadingmaneuver": "loading",
    "dumping": "dumping",
    "dumpingmaneuver": "dumping",
    "loadtodump": "hauling",
    "dumptoload": "hauling",
    "leadqueueddumptoload": "hauling",
    "leadqueuedloadtodump": "hauling",
    "zonequeueddumptoload": "hauling",
    "zonequeuedloadtodump": "hauling",
    "waitingtodump": "stopped",
    "active": "active",
    "maintenance": "maintenance",
    "stopped": "stopped",
    "hauling": "hauling",
}

SOFTWARE_STATE_MAP = {
    "fault": "fault",
    "start": "autonomous",
    "stop": "manual",
    "dump": "autonomous",
    "slow": "intervention",
    "wait": "autonomous",
    "manual": "manual",
    "autonomous": "autonomous",
    "intervention": "intervention",
    "disabled": "disabled",
    "calibrating": "calibrating",
}

PRNDL_MAP = {
    "park": "park",
    "p": "park",
    "reverse": "reverse",
    "r": "reverse",
    "neutral": "neutral",
    "n": "neutral",
    "drive": "drive",
    "d": "drive",
    "low": "low",
    "l": "low",
}

ENUM_DEFAULT = "unknown"

TELEMETRY_STATE_VALUES = [
    "unknown", "idle", "active", "loading", "hauling", "dumping",
    "maintenance", "stopped",
]
SOFTWARE_STATE_VALUES = [
    "unknown", "manual", "autonomous", "intervention", "fault",
    "disabled", "calibrating",
]
PRNDL_VALUES = ["unknown", "park", "reverse", "neutral", "drive", "low"]

# ---------------------------------------------------------------------------
# Spatial reference: 7 quarry zones (WGS84 lon/lat rings). These are *data*
# values from the reference's zone table; each ring is closed
# (first == last vertex).
# ---------------------------------------------------------------------------
ZONES: list[tuple[int, str, list[tuple[float, float]]]] = [
    (1, "Crusher", [
        (-97.8302154, 33.2580123), (-97.8301054, 33.2578261),
        (-97.8299310, 33.2579001), (-97.8300786, 33.2580796),
        (-97.8302180, 33.2580190), (-97.8302154, 33.2580123),
    ]),
    (2, "Stockpile 1", [
        (-97.8301483, 33.2583240), (-97.8299498, 33.2579540),
        (-97.8294402, 33.2581267), (-97.8291729, 33.2590222),
        (-97.8293744, 33.2596088), (-97.8297365, 33.2593307),
        (-97.8301529, 33.2583203), (-97.8301483, 33.2583240),
    ]),
    (3, "Stockpile 2", [
        (-97.8300501, 33.2605270), (-97.8297765, 33.2599618),
        (-97.8294948, 33.2600986), (-97.8292749, 33.2605584),
        (-97.8297255, 33.2607356), (-97.8300501, 33.2605247),
        (-97.8300501, 33.2605270),
    ]),
    (4, "Stockpile 3", [
        (-97.8277426, 33.2419613), (-97.8276353, 33.2411806),
        (-97.8269916, 33.2404538), (-97.8264122, 33.2410281),
        (-97.8263157, 33.2415171), (-97.8266322, 33.2417863),
        (-97.8277372, 33.2419613), (-97.8277426, 33.2419613),
    ]),
    (5, "Pit 1", [
        (-97.8406601, 33.2732661), (-97.8406708, 33.2708980),
        (-97.8354781, 33.2709428), (-97.8358321, 33.2734634),
        (-97.8406601, 33.2732661),
    ]),
    (6, "Pit 2", [
        (-97.8365509, 33.2763763), (-97.8364115, 33.2737571),
        (-97.8321092, 33.2738737), (-97.8322487, 33.2759726),
        (-97.8365509, 33.2763763),
    ]),
    (7, "Pit 3", [
        (-97.8350793, 33.2736128), (-97.8343498, 33.2700068),
        (-97.8326761, 33.2700516), (-97.8323435, 33.2736845),
        (-97.8350793, 33.2736128),
    ]),
]

DEFAULT_LOCATION_TYPE = "Haul Road / Other"

# Sentinel: load_weight == -99 means broken payload sensor
# (`RAW TELEMETRY DATA/README.md:60-63`).
BROKEN_PAYLOAD_SENTINEL = -99.0
