"""Validation-suite operators (SURVEY.md §5 items 2-4): the reference's
correctness harnesses as reusable DataFrame ops.

Behavioral reference: ckpronto/datamine_v2.0 —
- label-vs-ground-truth diff: ``STEP 3 - EDA Analysis/
  validate_with_ground_truth.py:59-101`` (inner merge on (device_id, ts),
  mismatch matrix grouped by (predicted, actual));
- recall with overlap matching: ``STEP 5 - CPD/_archive/
  05_cpd_algorithm_tuning.py:121-139`` (any overlap counts as detected);
- ±tolerance proximity validation: ``claudeinstructions.md:60-84``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datamine_v2_0_spark.operators.joins import asof_nearest_join, overlap_join


def ground_truth_diff(
    predicted: DataFrame,
    truth: DataFrame,
    on: Sequence[str],
    pred_label: str,
    true_label: str,
) -> DataFrame:
    """Confusion matrix of predicted vs hand-labeled rows: inner join on
    the composite key, grouped mismatch counts + agreement flag."""
    j = predicted.join(truth, on=list(on), how="inner")
    return (
        j.groupBy(
            F.col(pred_label).alias("predicted"),
            F.col(true_label).alias("actual"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("match", F.col("predicted") == F.col("actual"))
    )


def overlap_recall(
    truth: DataFrame,
    detected: DataFrame,
    truth_id: str,
    keys: Sequence[tuple[str, str]],
    true_start: str,
    true_end: str,
    det_start: str,
    det_end: str,
) -> DataFrame:
    """Recall via any-overlap matching: a ground-truth window counts as
    detected when >=1 detected segment overlaps it (same key). One output
    row: (n_truth, n_detected, recall). `truth_id` uniquely names each
    truth window."""
    hits = (
        overlap_join(
            truth, detected, keys, true_start, true_end, det_start, det_end
        )
        .select(truth_id)
        .distinct()
    )
    n_truth = truth.select(truth_id).distinct().count()
    n_det = hits.count()
    spark = truth.sparkSession
    recall = float(n_det) / n_truth if n_truth else 0.0
    return spark.createDataFrame(
        [(n_truth, n_det, recall)], "n_truth long, n_detected long, recall double"
    )


def proximity_match(
    truth_events: DataFrame,
    candidates: DataFrame,
    keys: Sequence[tuple[str, str]],
    true_ts: str,
    cand_ts: str,
    tolerance_seconds: float,
    truth_id: str,
) -> DataFrame:
    """±tolerance nearest-candidate validation: each ground-truth event is
    paired with its single closest candidate within the tolerance (the
    reference's ±2 min check) — unmatched truth rows are retained with NULL
    candidate columns so misses are visible."""
    matched = asof_nearest_join(
        truth_events,
        candidates,
        keys,
        true_ts,
        cand_ts,
        tolerance_seconds,
        truth_id,
    )
    return truth_events.join(
        matched.select(
            truth_id, *[c for c in matched.columns if c in candidates.columns]
        ),
        on=truth_id,
        how="left",
    )
