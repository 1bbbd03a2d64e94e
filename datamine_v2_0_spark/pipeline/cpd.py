"""Change-point detection stage (gold part 2) — SURVEY.md §3.3 / §2.10 F4.

Re-expression of the reference's three-script CPD pipeline
(``STEP 5 - CPD/05_export_features_to_parquet.py`` →
``05_cpd_orchestrator_polars.py`` → ``05_load_candidates_to_db.py``,
ckpronto/datamine_v2.0) as ONE Spark job:

    5 s tumbling downsample (A11)  →  groupBy(partition_key).applyInPandas(PELT)

The ProcessPoolExecutor(90)+temp-parquet orchestration collapses into
Spark's task scheduler; the CSV/string-typed hop disappears because the
DataFrame stays typed end-to-end.

Scale notes:
- The downsample (mean per 5 s bucket, `first` hash id) runs BEFORE the
  Python stage — a 10× row reduction ahead of the O(n²)-ish kernel, the
  reference's own algorithmic key (05_cpd_orchestrator_polars.py:262-276).
- One Arrow batch per partition key (device_date): bounded group size
  (~9k rows post-downsample). Skewed/oversized days are the critical path;
  cap with `max_group_rows` (tail-truncate, logged in output).
- Dual-signal branch: devices without a reliable payload signal fall back
  to two PELT passes (speed + altitude) unioned
  (05_cpd_orchestrator_polars.py:205-222,291-390).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from datamine_v2_0_spark.functions import signal as _signal
from datamine_v2_0_spark.functions.signal import pelt_l2
from datamine_v2_0_spark.shipping import ship_by_value

ship_by_value(_signal)

CANDIDATE_SCHEMA = (
    "partition_key string, signal_name string, bucket_ts timestamp, "
    "bucket_id string"
)

# reference parameters: 05_cpd_orchestrator_polars.py:66-70
PEN = 0.05
MIN_SIZE = 10
JUMP = 1


def downsample(
    df: DataFrame,
    partition_col: str,
    ts: str,
    signal_cols: list[str],
    id_col: str,
    duration: str = "5 seconds",
) -> DataFrame:
    """Left-closed tumbling mean per signal + first id per bucket
    (group_by_dynamic parity, 05_cpd_orchestrator_polars.py:262-276)."""
    aggs = [F.avg(c).alias(c) for c in signal_cols]
    aggs.append(F.min_by(id_col, ts).alias(id_col))
    return (
        df.groupBy(partition_col, F.window(ts, duration).alias("w"))
        .agg(*aggs)
        .withColumn("bucket_ts", F.col("w.start"))
        .drop("w")
    )


def detect_change_points(
    downsampled: DataFrame,
    partition_col: str,
    signal_cols: list[str],
    id_col: str,
    penalty: float = PEN,
    min_size: int = MIN_SIZE,
    jump: int = JUMP,
    dual_threshold_stddev: float | None = None,
    max_group_rows: int | None = 200_000,
    num_tasks: int | None = None,
) -> DataFrame:
    """Per-partition PELT via applyInPandas.

    ``num_tasks`` pins the parallelism of the Python stage (defaults to
    the cluster's defaultParallelism). Without it, AQE coalesces the
    small post-downsample shuffle into ~1 partition and a single Python
    worker runs every group serially — the CPU-bound kernel stage must
    keep one task per core regardless of input bytes.

    If ``dual_threshold_stddev`` is set, a partition whose FIRST signal's
    stddev falls below it is treated as payload-unreliable and PELT runs on
    each REMAINING signal instead (the 775G dual-signal branch,
    05_cpd_orchestrator_polars.py:291-390); otherwise only signal_cols[0]
    is analyzed.

    Output: one row per detected change point:
    (partition_key, signal_name, bucket_ts, bucket_id).
    """
    primary, *fallbacks = signal_cols

    def _detect(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts").reset_index(drop=True)
        if max_group_rows is not None and len(pdf) > max_group_rows:
            pdf = pdf.iloc[:max_group_rows]
        key = pdf[partition_col].iloc[0] if len(pdf) else None
        out = []

        def run(signal_name: str):
            sig = pdf[signal_name].astype("float64").to_numpy()
            mask = ~pd.isna(sig)
            sub = pdf[mask]
            vals = sig[mask]
            for b in pelt_l2(vals, penalty, min_size=min_size, jump=jump):
                out.append(
                    {
                        "partition_key": key,
                        "signal_name": signal_name,
                        "bucket_ts": sub["bucket_ts"].iloc[b],
                        "bucket_id": sub[id_col].iloc[b],
                    }
                )

        use_fallback = False
        if dual_threshold_stddev is not None and fallbacks:
            sd = pdf[primary].astype("float64").std()
            use_fallback = not (sd == sd) or sd < dual_threshold_stddev
        if use_fallback:
            for c in fallbacks:
                run(c)
        else:
            run(primary)
        cols = ["partition_key", "signal_name", "bucket_ts", "bucket_id"]
        return pd.DataFrame(out, columns=cols)

    # bucket_id AND partition_key are declared string in CANDIDATE_SCHEMA;
    # cast BOTH JVM-side so the Arrow batch arriving in Python already
    # matches (an int device key otherwise fails the pandas->Arrow
    # conversion on output exactly like an int id would).
    downsampled = downsampled.withColumn(
        id_col, F.col(id_col).cast("string")
    ).withColumn(partition_col, F.col(partition_col).cast("string"))
    if num_tasks is None:
        num_tasks = downsampled.sparkSession.sparkContext.defaultParallelism
    # explicit repartition satisfies the groupBy's required distribution
    # (no second exchange) and its user-given partition count is exempt
    # from AQE coalescing
    downsampled = downsampled.repartition(num_tasks, partition_col)
    return downsampled.groupBy(partition_col).applyInPandas(
        _detect, schema=CANDIDATE_SCHEMA
    )


def penalty_sweep(
    downsampled: DataFrame,
    partition_col: str,
    signal_col: str,
    id_col: str,
    penalties: list[float],
    min_size: int = MIN_SIZE,
    jump: int = JUMP,
    max_group_rows: int | None = 200_000,
    num_tasks: int | None = None,
) -> DataFrame:
    """The reference's coarse penalty sweep (05_cpd_algorithm_tuning.py:
    203-227: pen 0.05…2.0 step 0.05, recall per penalty) as ONE Spark
    stage: each partition group is shuffled/sorted once and re-segmented
    for every penalty inside the same task — P penalties cost one
    applyInPandas pass, not P jobs.

    Output: (penalty, partition_key, signal_name, bucket_ts, bucket_id),
    one row per change point per penalty."""

    def _sweep(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts").reset_index(drop=True)
        if max_group_rows is not None and len(pdf) > max_group_rows:
            pdf = pdf.iloc[:max_group_rows]
        key = pdf[partition_col].iloc[0] if len(pdf) else None
        sig = pdf[signal_col].astype("float64").to_numpy()
        mask = ~pd.isna(sig)
        sub = pdf[mask]
        vals = sig[mask]
        out = []
        for pen in penalties:
            for b in pelt_l2(vals, pen, min_size=min_size, jump=jump):
                out.append(
                    {
                        "penalty": float(pen),
                        "partition_key": key,
                        "signal_name": signal_col,
                        "bucket_ts": sub["bucket_ts"].iloc[b],
                        "bucket_id": sub[id_col].iloc[b],
                    }
                )
        cols = ["penalty", "partition_key", "signal_name", "bucket_ts", "bucket_id"]
        return pd.DataFrame(out, columns=cols)

    downsampled = downsampled.withColumn(
        id_col, F.col(id_col).cast("string")
    ).withColumn(partition_col, F.col(partition_col).cast("string"))
    if num_tasks is None:
        num_tasks = downsampled.sparkSession.sparkContext.defaultParallelism
    downsampled = downsampled.repartition(num_tasks, partition_col)
    return downsampled.groupBy(partition_col).applyInPandas(
        _sweep, schema="penalty double, " + CANDIDATE_SCHEMA
    )


def tune_penalty(
    sweep: DataFrame,
    truth: DataFrame,
    truth_key: str,
    truth_id: str,
    true_start: str,
    true_end: str,
    penalties: list[float] | None = None,
) -> DataFrame:
    """Recall per penalty against ground-truth windows (any change point
    inside the window counts as detected — the reference's overlap
    matching, 05_cpd_algorithm_tuning.py:121-139). One containment join
    + one groupBy over the whole sweep; returns
    (penalty, n_truth, n_detected, recall) ordered by penalty."""
    spark = sweep.sparkSession
    # truth ids are only guaranteed unique per partition key — count
    # windows by (key, id) so per-key numbering doesn't collapse
    n_truth = truth.select(truth_key, truth_id).distinct().count()
    hits = (
        sweep.join(
            truth,
            (sweep["partition_key"] == truth[truth_key])
            & sweep["bucket_ts"].between(truth[true_start], truth[true_end]),
        )
        .groupBy("penalty")
        # disambiguated refs: a truth key named like a sweep column
        # (e.g. 'partition_key') would make the bare-string form raise
        # AMBIGUOUS_REFERENCE after the join keeps both sides
        .agg(
            F.countDistinct(truth[truth_key], truth[truth_id]).alias(
                "n_detected"
            )
        )
    )
    # pass `penalties` explicitly to also report penalties whose sweep
    # produced zero change points anywhere (they have no sweep rows)
    if penalties is not None:
        pens = spark.createDataFrame(
            [(float(p),) for p in penalties], "penalty double"
        )
    else:
        pens = sweep.select("penalty").distinct()
    return (
        pens.join(hits, "penalty", "left")
        .withColumn("n_detected", F.coalesce("n_detected", F.lit(0)))
        .withColumn("n_truth", F.lit(n_truth))
        .withColumn(
            "recall",
            F.when(F.lit(n_truth) > 0, F.col("n_detected") / n_truth).otherwise(
                F.lit(0.0)
            ),
        )
        .select("penalty", "n_truth", "n_detected", "recall")
        .orderBy("penalty")
    )


def cpd_pipeline(
    df: DataFrame,
    partition_col: str,
    ts: str,
    signal_cols: list[str],
    id_col: str,
    duration: str = "5 seconds",
    penalty: float = PEN,
    min_size: int = MIN_SIZE,
    dual_threshold_stddev: float | None = None,
) -> DataFrame:
    """Full CPD stage: downsample → per-partition PELT → candidate events."""
    ds = downsample(df, partition_col, ts, signal_cols, id_col, duration)
    return detect_change_points(
        ds,
        partition_col,
        signal_cols,
        id_col,
        penalty=penalty,
        min_size=min_size,
        dual_threshold_stddev=dual_threshold_stddev,
    )
