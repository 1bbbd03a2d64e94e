"""Silver transform stage: raw (bronze) telemetry → typed/cleaned table.

Re-expression of ckpronto/datamine_v2.0
``STEP 2 - Transform Raw Telemetry/02_raw_telemetry_transform.py:265-378``
as ONE declarative DataFrame chain: hash id, device_date, enum decode,
position struct, JSON validation, boolean parse, incremental anti-join
dedup. The reference's driver-side date-range bin-packing + 8-thread SQL
fan-out (``:206-263,582-602``) disappears into Catalyst/task scheduling
(SURVEY.md §3.1).

Scale notes: the transform is map-only (no shuffle); the only exchange is
the anti-join on the hash key when `existing` is given, which AQE turns
into a broadcast join whenever the existing-key side is small. Writes
partition by device_date — the system's unit of parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datamine_v2_0_spark.functions.scalars import (
    bool_from_text,
    device_date,
    enum_decode,
    parse_position,
    raw_event_hash_id,
    validate_json,
)
from datamine_v2_0_spark.operators.joins import anti_join
from datamine_v2_0_spark.schemas import (
    PRNDL_MAP,
    SOFTWARE_STATE_MAP,
    STATE_MAP,
)


def silver_transform(
    raw: DataFrame,
    existing: DataFrame | None = None,
    ingested_at=None,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Bronze → silver. `raw` carries the 11 raw CSV columns (timestamp as
    string). Rows with NULL device_id/timestamp are dropped (the reference
    filters them upstream so the hash key never sees NULLs).

    `existing`: the current silver table — already-present hash ids are
    skipped (NOT EXISTS parity, 02_raw_telemetry_transform.py:367-378).
    `ingested_at`: a Column for lineage; defaults to current_timestamp().
    `passthrough`: extra raw columns carried through unchanged (the
    reference's silver is a fixed DDL schema; this is the generic hook).
    """
    ts = F.to_timestamp("timestamp")
    dev = F.col("device_id")
    out = (
        raw.withColumn("__ts", ts)
        .filter(F.col("__ts").isNotNull() & dev.isNotNull())
        .select(
            F.col("__ts").alias("timestamp"),
            (ingested_at if ingested_at is not None else F.current_timestamp()).alias(
                "ingested_at"
            ),
            raw_event_hash_id(dev, F.col("__ts")).alias("raw_event_hash_id"),
            dev.alias("device_id"),
            device_date(dev, F.col("__ts")).alias("device_date"),
            bool_from_text(F.col("system_engaged")).alias("system_engaged"),
            bool_from_text(F.col("parking_brake_applied")).alias(
                "parking_brake_applied"
            ),
            parse_position(F.col("current_position")).alias("current_position"),
            F.col("current_speed").cast("double").alias("current_speed"),
            F.col("load_weight").cast("double").alias("load_weight"),
            enum_decode(F.col("state"), STATE_MAP).alias("state"),
            enum_decode(F.col("software_state"), SOFTWARE_STATE_MAP).alias(
                "software_state"
            ),
            enum_decode(F.col("prndl"), PRNDL_MAP).alias("prndl"),
            validate_json(F.col("extras")).alias("extras"),
            *[F.col(c) for c in (passthrough or [])],
        )
    )
    if existing is not None:
        out = anti_join(
            out, existing.select("raw_event_hash_id"), "raw_event_hash_id"
        )
    return out
