"""Time-series resampling with gap fill — the TimescaleDB
``time_bucket_gapfill`` / ``locf()`` / ``interpolate()`` query family
(public TimescaleDB API semantics), Spark-first.

The reference stores telemetry in TimescaleDB hypertables (`STEP 1 -
Ingest Raw Telemetry/00_database_setup.sql`); its tumbling ``time_bucket``
downsample is operator A11 (`operators/aggregates.py`). This module adds
the gap-filling counterpart: resample each series to a regular grid and
fill missing buckets by last-observation-carried-forward and/or linear
interpolation.

Plan shape at scale: bucket-agg shuffle on (keys, bucket) → per-key span
agg (tiny) → grid explode (``sequence``, no driver collect) → left join
back on (keys, bucket) → ONE (keys)×bucket window exchange shared by the
locf and both interpolation passes. No Python anywhere.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def resample_gapfill(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
    agg: str = "avg",
    round_to: int = 6,
) -> DataFrame:
    """Per-key regular-grid resample: (keys..., bucket, value,
    value_locf, value_interp).

    ``value`` is the per-bucket aggregate (``avg``/``min``/``max``/
    ``sum``/``count``) or NULL for gap buckets; ``value_locf`` carries
    the last observation forward; ``value_interp`` linearly interpolates
    between the neighboring observed buckets (TimescaleDB
    ``interpolate()`` semantics). The grid spans each key's own
    [min, max] observed bucket, so edge buckets are always observed and
    interior gaps always have both neighbors.
    """
    keys = list(keys)
    agg_fn = {
        "avg": F.avg, "min": F.min, "max": F.max, "sum": F.sum,
        "count": lambda c: F.count(c).cast("double"),
    }[agg]

    # floor(x*10^d + 0.5)/10^d instead of F.round: every step is exact
    # double math, so the quantization is bit-identical in any engine —
    # F.round (Java BigDecimal half-up) vs DuckDB ROUND diverge by one
    # ulp at half boundaries, which a hash-matched oracle can't absorb
    scale = F.lit(float(10 ** round_to))

    def q(c: Column) -> Column:
        return F.floor(c * scale + F.lit(0.5)) / scale
    bsec = F.lit(int(bucket_seconds)).cast("long")
    bucket = F.timestamp_seconds(
        (F.floor(F.unix_timestamp(F.col(ts_col)) / bsec) * bsec).cast("long")
    )
    vals = (
        df.groupBy(*keys, bucket.alias("bucket"))
        .agg(q(agg_fn(F.col(value_col))).alias("value"))
    )
    spans = vals.groupBy(*keys).agg(
        F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx")
    )
    step = F.expr(f"interval {int(bucket_seconds)} seconds")
    grid = spans.select(
        *keys, F.explode(F.sequence("__mn", "__mx", step)).alias("bucket")
    )
    g = grid.join(vals, keys + ["bucket"], "left")

    w = Window.partitionBy(*keys).orderBy("bucket")
    wp = w.rowsBetween(Window.unboundedPreceding, 0)
    wn = w.rowsBetween(0, Window.unboundedFollowing)
    t = F.unix_timestamp("bucket").cast("double")
    known_t = F.when(F.col("value").isNotNull(), t)
    pv = F.last("value", ignorenulls=True).over(wp)
    pt = F.last(known_t, ignorenulls=True).over(wp)
    nv = F.first("value", ignorenulls=True).over(wn)
    nt = F.first(known_t, ignorenulls=True).over(wn)
    interp = F.when(F.col("value").isNotNull(), F.col("value")).otherwise(
        q(pv + (nv - pv) * (t - pt) / (nt - pt))
    )
    return g.select(
        *keys,
        "bucket",
        "value",
        pv.alias("value_locf"),
        interp.alias("value_interp"),
    )
