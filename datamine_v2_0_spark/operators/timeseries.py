"""Time-series resampling, gap fill, EWMA smoothing, and OHLC bars —
the TimescaleDB ``time_bucket_gapfill`` / ``locf()`` / ``interpolate()``
query family (public TimescaleDB API semantics) plus the standard
financial/telemetry resample shapes, Spark-first.

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


def ewma_smooth(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    round_to: int = 6,
) -> DataFrame:
    """Per-key exponentially weighted moving average (the pandas
    ``ewm(alpha=..., adjust=False)`` recurrence): y_0 = x_0,
    y_t = alpha*x_t + (1-alpha)*y_{t-1}. Returns (keys..., ts, value,
    ewma) with one row per input row.

    The recurrence is inherently sequential per key, so each series folds
    ONCE through a JVM higher-order aggregate over its sorted (ts, value)
    array — no Python, no per-step window. The fold appends to the
    accumulator array (copy-per-step), so per-key series length should be
    bounded: this operator is built for the resample-then-smooth shape
    (bucket first via ``resample_gapfill``/``ohlc_resample``, then smooth
    the bounded bucket series). For raw unbounded series, bucket first —
    a 100 TB raw stream should never reach a sequential smoother anyway.

    Rows tie-break on (ts, value); the fold arithmetic is plain IEEE
    double mul/add in recurrence order, reproducible in any engine's
    recursive evaluation of the same expression. NULL values emit a
    NULL ewma and leave the state untouched (the next non-null value
    continues from the last smoothed value — same contract as
    ``streaming_ewma``), rather than poisoning the rest of the series.
    """
    keys = list(keys)
    a = F.lit(float(alpha))
    arr = F.array_sort(
        F.collect_list(
            F.struct(F.col(ts_col).alias("ts"), F.col(value_col).alias("x"))
        )
    )
    # accumulator elements are (emit, state): NULL x carries the state
    # forward and emits NULL; a bare running-value array can't tell
    # "null output" from "null state" and would poison the tail
    init = F.array().cast("array<struct<e:double,s:double>>")

    def step(acc, e):
        x = e["x"].cast("double")
        prev = F.when(F.size(acc) > 0, F.element_at(acc, -1)["s"])
        new_s = F.when(x.isNull(), prev).otherwise(
            F.when(prev.isNull(), x).otherwise(a * x + (F.lit(1.0) - a) * prev)
        )
        emit = F.when(x.isNull(), F.lit(None).cast("double")).otherwise(new_s)
        return F.concat(
            acc, F.array(F.struct(emit.alias("e"), new_s.alias("s")))
        )

    ew = F.aggregate(F.col("__pts"), init, step)
    per_key = df.groupBy(*keys).agg(arr.alias("__pts"))
    z = per_key.select(
        *keys, F.explode(F.arrays_zip(F.col("__pts"), ew.alias("__ew"))).alias("__z")
    )
    return z.select(
        *keys,
        F.col("__z.__pts.ts").alias(ts_col),
        F.col("__z.__pts.x").alias(value_col),
        F.round(F.col("__z.__ew.e"), round_to).alias("ewma"),
    )


def ohlc_resample(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
    tiebreak: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-key OHLC resample: (keys..., bucket, open, high, low, close,
    vsum, n) — the candlestick/telemetry-envelope downsample. ``open`` /
    ``close`` are the first/last values by (ts, tiebreak) within the
    bucket (``min_by``/``max_by`` over a struct — one hash aggregate, no
    window, no second shuffle); ``tiebreak`` must make the ordering total
    (an event id). Values round to ``round_to`` for cross-engine parity.
    """
    keys = list(keys)
    bsec = F.lit(int(bucket_seconds)).cast("long")
    bucket = F.timestamp_seconds(
        (F.floor(F.unix_timestamp(F.col(ts_col)) / bsec) * bsec).cast("long")
    )
    order = F.struct(F.col(ts_col), F.col(tiebreak))
    v = F.col(value_col)
    return df.groupBy(*keys, bucket.alias("bucket")).agg(
        F.round(F.min_by(v, order), round_to).alias("open"),
        F.round(F.max(v), round_to).alias("high"),
        F.round(F.min(v), round_to).alias("low"),
        F.round(F.max_by(v, order), round_to).alias("close"),
        F.round(F.sum(v), round_to).alias("vsum"),
        F.count(F.lit(1)).alias("n"),
    )


def cusum_detect(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    target: float,
    slack: float = 0.0,
    threshold: float | None = None,
    round_to: int = 6,
) -> DataFrame:
    """One-sided CUSUM drift statistics (Page 1954): per key in time
    order, s⁺_t = max(0, s⁺_{t-1} + (x_t − target − slack)) and
    s⁻_t = max(0, s⁻_{t-1} + (target − x_t − slack)) — the classic
    telemetry drift detector that accumulates small persistent shifts a
    per-point threshold misses (the sequential complement of the batch
    PELT changepoint operator). Returns one row per input row with
    (cusum_up, cusum_down) and, when ``threshold`` is set, an ``alarm``
    flag.

    Same execution shape as :func:`ewma_smooth`: the inherently
    sequential recurrence folds ONCE per series through a JVM
    higher-order aggregate over the sorted array — bucket raw streams
    first so per-key series stay bounded.
    """
    keys = list(keys)
    t = F.lit(float(target))
    kk = F.lit(float(slack))
    arr = F.array_sort(
        F.collect_list(
            F.struct(F.col(ts_col).alias("ts"), F.col(value_col).alias("x"))
        )
    )

    def fold(sign: int):
        # NULL values emit NULL and leave the statistic untouched (same
        # null contract as ewma_smooth — a bare running array would
        # poison every later element)
        def step(acc, e):
            x = e["x"].cast("double")
            dev = (x - t - kk) if sign > 0 else (t - x - kk)
            prev = F.coalesce(
                F.when(F.size(acc) > 0, F.element_at(acc, -1)["s"]), F.lit(0.0)
            )
            new_s = F.when(x.isNull(), prev).otherwise(
                F.greatest(F.lit(0.0), prev + dev)
            )
            emit = F.when(x.isNull(), F.lit(None).cast("double")).otherwise(new_s)
            return F.concat(
                acc, F.array(F.struct(emit.alias("e"), new_s.alias("s")))
            )

        return F.aggregate(
            F.col("__pts"),
            F.array().cast("array<struct<e:double,s:double>>"),
            step,
        )

    per_key = df.groupBy(*keys).agg(arr.alias("__pts"))
    z = per_key.select(
        *keys,
        F.explode(
            F.arrays_zip(
                F.col("__pts"), fold(1).alias("__up"), fold(-1).alias("__dn")
            )
        ).alias("__z"),
    )
    out = z.select(
        *keys,
        F.col("__z.__pts.ts").alias(ts_col),
        F.col("__z.__pts.x").alias(value_col),
        F.round(F.col("__z.__up.e"), round_to).alias("cusum_up"),
        F.round(F.col("__z.__dn.e"), round_to).alias("cusum_down"),
    )
    if threshold is not None:
        h = F.lit(float(threshold))
        out = out.withColumn(
            "alarm", (F.col("cusum_up") > h) | (F.col("cusum_down") > h)
        )
    return out


def seasonal_baseline_anomalies(
    df: DataFrame,
    keys,
    ts: str,
    value: str,
    z_threshold: float = 3.0,
    round_to: int = 6,
):
    """Seasonal-profile anomaly detection: learn a per-(key,
    hour-of-week) baseline (mean, stddev) from the whole frame, then
    flag rows whose value deviates more than ``z_threshold`` sigmas
    from their slot's baseline. Returns the anomalous rows with
    (baseline_mean, z_score).

    The hour-of-week slot captures both daily and weekly periodicity —
    the standard first-order seasonal model for telemetry (a Monday 9am
    spike is only anomalous vs other Monday 9ams). Two shuffles: one
    partial agg for the 168-slot baseline per key, one co-partitioned
    join back; slots with < 2 observations or zero variance produce no
    flags (no division by zero, no single-point 'anomalies')."""
    keys = list(keys)
    v = F.col(value).cast("double")
    slot = (
        (F.dayofweek(ts) - 1) * 24 + F.hour(ts)
    ).alias("how_slot")
    base = (
        df.select(*keys, slot, v.alias("__v"))
        .groupBy(*keys, "how_slot")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.avg("__v").alias("__mean"),
            F.stddev_samp("__v").alias("__sd"),
        )
        .filter((F.col("__n") >= 2) & (F.col("__sd") > 0))
    )
    z = (v - F.col("__mean")) / F.col("__sd")
    return (
        df.withColumn("how_slot", slot)
        .join(base, keys + ["how_slot"])
        .withColumn("z_score", F.round(z, round_to))
        .filter(F.abs(F.col("z_score")) > z_threshold)
        .withColumn("baseline_mean", F.round("__mean", round_to))
        .drop("__n", "__mean", "__sd")
    )
