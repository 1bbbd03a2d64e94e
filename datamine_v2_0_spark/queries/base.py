"""Shared helpers for the contract query modules: the adaptive table loader and fixtures every family uses.

Split out of the monolithic contract.py (r3 verdict: no file > ~800
lines); registry order lives in contract.py and is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datamine_v2_0_spark.functions.scalars import (
    bool_from_text,
    clamp,
    device_date,
    json_string_literal,
    null_if_outside,
    parse_position,
    pg_timestamptz_text,
    raw_event_hash_id,
    validate_json,
)
from datamine_v2_0_spark.operators import aggregates as agg
from datamine_v2_0_spark.operators import bpe
from datamine_v2_0_spark.operators import dedup as dd
from datamine_v2_0_spark.operators import filters as flt
from datamine_v2_0_spark.operators import joins as jn
from datamine_v2_0_spark.operators import sets as st
from datamine_v2_0_spark.operators import similarity as sim
from datamine_v2_0_spark.operators import smoothing as sm
from datamine_v2_0_spark.operators import text as tx
from datamine_v2_0_spark.operators import windows as win
from datamine_v2_0_spark.operators.joins import resolve_priority
from datamine_v2_0_spark.pipeline import cpd
from datamine_v2_0_spark.pipeline.curation import curate_corpus
from datamine_v2_0_spark.pipeline.features import build_features
from datamine_v2_0_spark.pipeline.silver import silver_transform


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table; normalize the events timestamp if needed.

    Some driver generations store ``events.ts`` as parquet
    TIMESTAMP(NANOS), which Spark's vectorized reader rejects. Read it as
    a long (legacy conf) and truncate to microseconds with integer
    division (a double division would lose precision above 2^53 ns).
    Newer generations store plain TIMESTAMP(MICROS) — pass through.
    """
    # the driver supplies its own SparkSession; epoch-bucketing queries
    # (gapfill/hopping/cohort/range-bin) and NTZ->TIMESTAMP casts are only
    # oracle-parity-correct under UTC, so pin it here rather than trusting
    # the harness session's default
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type in ("bigint", "long"):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # session tz is pinned to UTC, so NTZ -> TIMESTAMP is lossless
            # and matches DuckDB's naive read of the same parquet
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")

def _events_window():
    return win.ordered_window(["user_id"], ["ts", "event_id"])

# DuckDB rendering of pg_timestamptz_text (same trim rules)
_PG_TS_SQL = (
    r"regexp_replace(regexp_replace(strftime({c}, '%Y-%m-%d %H:%M:%S.%f'),"
    r" '(\.\d*?)0+$', '\1'), '\.$', '') || '+00'"
)
