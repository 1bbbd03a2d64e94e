"""Feature-engineering stage (gold part 1): the full window-function stack.

Re-expression of ckpronto/datamine_v2.0
``STEP 4 - Feature Engineering/04_worker_script.sql:4-68`` (4-CTE pipeline:
spatial join → lag/delta/smooth pass → block-id pass → rates/rolling/
time-in-state pass) + ``04_final_assembly.sql:14-25`` (one-hot +
interaction flags) as one lazy DataFrame chain. The reference's staging
table and 32-thread chunk lists vanish: every window below shares ONE
partitioning (device_id, device_date) ordered by timestamp, so Spark plans
a single sort+exchange reused across all window nodes (SURVEY.md §3.2).

Scale notes:
- All windows share W = partitionBy(device_id, device_date).orderBy(ts):
  one shuffle for the whole stage.
- The whole-partition stddev (W5) runs per device_id — a second, cheaper
  exchange on fewer keys.
- The zone join is a map-side pandas UDF over a 7-row broadcast list (J1);
  no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datamine_v2_0_spark.operators.spatial import point_in_polygon_join
from datamine_v2_0_spark.operators import windows as win
from datamine_v2_0_spark.schemas import ZONES

STATIONARY_SPEED = 0.5          # 04_worker_script.sql is_stationary threshold
RELIABLE_PAYLOAD_STDDEV = 1000.0  # 04_worker_script.sql:62
HEAVY_LOAD = 50000.0            # 04_final_assembly.sql is_heavy_load


def build_features(
    silver: DataFrame,
    zones=ZONES,
) -> DataFrame:
    """Silver → primary feature table (FIXTURES.md §4 schema)."""
    w = win.ordered_window(["device_id", "device_date"], ["timestamp"])

    df = point_in_polygon_join(
        silver,
        F.col("current_position.longitude"),
        F.col("current_position.latitude"),
        zones,
        out="location_type",
    )

    altitude = F.col("current_position.altitude")
    df = df.withColumn("altitude", altitude)
    df = df.withColumn("is_stationary", F.col("current_speed") < STATIONARY_SPEED)

    # pass 1: lag/delta/smooth (04_worker_script.sql:23-27)
    # rate-of-change uses plain 2-arg LAG (first row per partition -> NULL)
    # to match 04_worker_script.sql:59,63; the default-current 3-arg form is
    # reserved for the change-flag path (prev_stationary) as in the reference
    df = (
        df.withColumn("time_delta_s", win.time_delta_seconds("timestamp", w))
        .withColumn(
            "altitude_rate_of_change",
            F.col("altitude") - F.lag("altitude").over(w),
        )
        .withColumn("speed_rolling_avg_5s", win.rolling_mean("current_speed", w, 2, 2))
        .withColumn("load_weight_smoothed", win.rolling_mean("load_weight", w, 2, 2))
    )
    df = df.withColumn(
        "load_weight_rate_of_change",
        F.col("load_weight_smoothed") - F.lag("load_weight_smoothed").over(w),
    )

    # pass 2: gaps-and-islands stationary block id (04_worker_script.sql:30-37)
    df = df.withColumn("stationary_block_id", win.block_id("is_stationary", w))

    # pass 3: whole-partition payload reliability + time-in-state
    # (04_worker_script.sql:62-66)
    df = df.withColumn(
        "has_reliable_payload",
        win.partition_agg(F.stddev("load_weight"), ["device_id"])
        > RELIABLE_PAYLOAD_STDDEV,
    )
    w_block = Window.partitionBy(
        "device_id", "device_date", "stationary_block_id"
    ).orderBy("timestamp")
    running = F.sum(F.coalesce(F.col("time_delta_s"), F.lit(0.0))).over(
        w_block.rowsBetween(Window.unboundedPreceding, 0)
    )
    df = df.withColumn(
        "time_in_stationary_state",
        F.when(F.col("is_stationary"), running).otherwise(F.lit(0.0)),
    )

    # final assembly: one-hot + interactions (04_final_assembly.sql:14-25)
    # one flag per value PRNDL_MAP can emit — omitting 'low' left
    # low-gear rows with every indicator False, indistinguishable from
    # no category at all
    from datamine_v2_0_spark.schemas import PRNDL_VALUES

    for v in PRNDL_VALUES:
        df = df.withColumn(f"prndl_{v}", F.col("prndl") == v)
    df = (
        df.withColumn("is_heavy_load", F.col("load_weight_smoothed") > HEAVY_LOAD)
        .withColumn(
            "is_ready_for_load",
            F.col("is_stationary") & ~F.col("is_heavy_load"),
        )
        .withColumn(
            "is_hauling", F.col("is_heavy_load") & ~F.col("is_stationary")
        )
        .withColumn(
            "is_in_loading_zone",
            F.col("location_type").like("Pit%")
            | F.col("location_type").like("Stockpile%"),
        )
        .withColumn(
            "is_in_dumping_zone",
            (F.col("location_type") == "Crusher")
            | F.col("location_type").like("Stockpile%"),
        )
    )
    return df
