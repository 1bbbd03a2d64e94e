"""Scalar/expression-level functions (JVM-side Column expressions where
possible; pure-NumPy kernels for the pandas-UDF operators)."""

from datamine_v2_0_spark.functions.scalars import (  # noqa: F401
    pg_timestamptz_text,
    raw_event_hash_id,
    device_date,
    parse_position,
    enum_decode,
    validate_json,
    json_string_literal,
    clamp,
    null_if_outside,
    bool_from_text,
)
