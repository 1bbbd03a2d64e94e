"""Scalar Column expressions (all JVM-side — no Python UDFs here).

Parity notes reference ckpronto/datamine_v2.0 (behavior only):
- hash id: `STEP 2 - Transform Raw Telemetry/02_raw_telemetry_transform.sql:39-47`
- device_date: `.../02_raw_telemetry_transform.py:274`
- position parse: UDF referenced at `.../02_raw_telemetry_transform.py:278`
  (definition absent from repo; re-derived from the documented
  `{lat,lon,alt}` text format, `RAW TELEMETRY DATA/README.md:36-46`)
- enum decode: `.../02_raw_telemetry_transform.py:282-327`
- JSON validation: `.../02_raw_telemetry_transform.py:329-337`
- clamps / coordinate validity: `STEP 3 - EDA Analysis/database_pipeline.py:269-329`
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from datamine_v2_0_spark.schemas import ENUM_DEFAULT


def pg_timestamptz_text(ts: Column) -> Column:
    """Render a timestamp exactly like Postgres ``timestamptz::text`` in UTC.

    Postgres prints ``2025-07-30 00:00:05.734539+00`` but trims trailing
    zeros of the fractional part and drops it entirely when zero:
    ``.100000`` → ``.1``, ``.000000`` → (nothing). This byte-level contract
    is what makes ``raw_event_hash_id`` deterministic across engines
    (SURVEY.md §7 hard part 1). Implemented UDF-free with regexp cleanup so
    it stays inside whole-stage codegen.
    """
    # render in UTC regardless of the ambient session timezone: callers
    # outside session.py (which pins UTC) would otherwise hash LOCAL
    # time with a '+00' suffix and never match Postgres
    full = F.date_format(
        F.convert_timezone(
            F.current_timezone(), F.lit("UTC"), ts
        ),
        "yyyy-MM-dd HH:mm:ss.SSSSSS",
    )
    # strip trailing zeros in the fraction, then a dangling dot
    trimmed = F.regexp_replace(full, r"(\.\d*?)0+$", r"$1")
    trimmed = F.regexp_replace(trimmed, r"\.$", "")
    return F.concat(trimmed, F.lit("+00"))


def raw_event_hash_id(device_id: Column, ts: Column) -> Column:
    """sha256(device_id || '|' || timestamptz::text) as 64-char hex.

    Null-propagating like Postgres ``||``: a NULL device_id or timestamp
    yields NULL, not a hash of the surviving operand (``concat`` propagates
    NULL; ``concat_ws`` would silently skip it).
    """
    return F.sha2(F.concat(device_id, F.lit("|"), pg_timestamptz_text(ts)), 256)


def device_date(device_id: Column, ts: Column) -> Column:
    """``device_id || '_' || DATE(ts)`` — the system's unit of parallelism."""
    return F.concat_ws("_", device_id, F.date_format(ts, "yyyy-MM-dd"))


def parse_position(pos_text: Column) -> Column:
    """Parse the vendor's ``{lat,lon,alt}`` text into
    struct<longitude,latitude,altitude>; malformed/NULL → NULL struct."""
    stripped = F.regexp_replace(F.trim(pos_text), r"[{}\[\]()]", "")
    parts = F.split(stripped, r"\s*,\s*")
    # get() + try_cast: malformed/short input must yield NULL, not an ANSI
    # runtime error (getItem throws INVALID_ARRAY_INDEX, cast CAST_INVALID_INPUT)
    lat = F.get(parts, 0).try_cast("double")
    lon = F.get(parts, 1).try_cast("double")
    alt = F.get(parts, 2).try_cast("double")
    ok = lat.isNotNull() & lon.isNotNull() & lat.between(-90, 90) & lon.between(-180, 180)
    return F.when(
        ok, F.struct(lon.alias("longitude"), lat.alias("latitude"), alt.alias("altitude"))
    ).otherwise(F.lit(None).cast(
        "struct<longitude:double,latitude:double,altitude:double>"
    ))


def enum_decode(col: Column, mapping: dict[str, str], default: str = ENUM_DEFAULT) -> Column:
    """``CASE LOWER(TRIM(COALESCE(col,'unknown'))) WHEN ... ELSE 'unknown'``.

    Data-driven when-chain; stays in codegen. For very large maps prefer a
    broadcast-join lookup table (operators.joins.lookup_join).
    """
    norm = F.lower(F.trim(F.coalesce(col, F.lit(default))))
    expr = None
    for k, v in mapping.items():
        expr = F.when(norm == k, v) if expr is None else expr.when(norm == k, v)
    return (expr.otherwise(default) if expr is not None else F.lit(default))


def json_string_literal(col: Column) -> Column:
    """Render a string column as a JSON string literal (quoted + escaped),
    matching Postgres ``to_jsonb(text)`` semantics for plain text.

    ``to_json`` rejects bare StringType, so wrap in a one-field struct,
    serialize, and strip the wrapper — all JVM-side.
    """
    wrapped = F.to_json(F.struct(col.alias("v")))
    return F.regexp_extract(wrapped, r'^\{"v":(.*)\}$', 1)


def validate_json(col: Column) -> Column:
    """TEXT→validated-JSON-text: NULL/blank → NULL; looks-like-JSON passes
    through; anything else is wrapped as a JSON string literal (the
    reference's ``to_jsonb(text)`` fallback)."""
    looks_json = col.rlike(r"^\s*\{.*\}\s*$") | col.rlike(r"^\s*\[.*\]\s*$")
    return F.when(col.isNull() | (F.trim(col) == ""), F.lit(None)).when(
        looks_json, col
    ).otherwise(json_string_literal(col))


def clamp(col: Column, lo: float | None = None, hi: float | None = None) -> Column:
    """Range clamp (speed<0→0, >50→50 style repair)."""
    out = col
    if lo is not None:
        out = F.greatest(out, F.lit(lo))
    if hi is not None:
        out = F.least(out, F.lit(hi))
    return out


def null_if_outside(col: Column, lo: float, hi: float) -> Column:
    """Out-of-domain → NULL (coordinate validity repair)."""
    return F.when(col.between(lo, hi), col).otherwise(F.lit(None))


def bool_from_text(col: Column) -> Column:
    """Postgres-ish boolean text parsing: t/true/1 → true, f/false/0 → false."""
    norm = F.lower(F.trim(col))
    return (
        F.when(norm.isin("t", "true", "1", "yes", "y"), F.lit(True))
        .when(norm.isin("f", "false", "0", "no", "n"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def json_extract_typed(col: Column, path: str, dtype: str) -> Column:
    """Typed JSON path extraction: ``get_json_object`` (SQL JSONPath
    ``$.field`` form) cast to ``dtype``; invalid JSON, a missing path,
    or an uncastable value all yield NULL — the Postgres
    ``(props ->> 'k')::int`` shape the reference's JSONB columns imply.

    ``try_cast`` (not ``cast``): under ANSI mode — the PySpark 4.x
    default — a plain cast raises CAST_INVALID_INPUT on the first
    malformed value, killing the whole job; try_cast yields NULL, which
    is both the documented contract and the DuckDB TRY_CAST oracle
    behavior."""
    return F.get_json_object(col, path).try_cast(dtype)
