"""Label Studio annotation source (S11): nested task JSON → flat label
intervals.

Behavioral reference: ckpronto/datamine_v2.0
``STEP 2.1 - LD Event Labeling/02.1.2_neural_net_training_ldevents_label_recombine.py:210-274``
— task → annotations[] → result[] → value{start, end, timeserieslabels[]},
flattened to (truck_id, date, start_time, end_time, label).

Spark shape: ``spark.read.json`` + two ``explode``s + a type filter — all
JVM-side; no Python JSON parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FLAT_COLUMNS = ["truck_id", "date", "start_time", "end_time", "label"]


def read_label_studio_json(spark: SparkSession, path: str) -> DataFrame:
    """Read Label Studio export JSON (array-of-tasks or JSON-lines)."""
    return spark.read.option("multiLine", "true").json(path)


def flatten_label_studio(tasks: DataFrame) -> DataFrame:
    """Flatten task JSON to one row per labeled interval.

    Expected nesting (reference export format):
    ``data.truck_id``, ``data.date``, ``annotations[].result[]`` where each
    result has ``type='timeserieslabels'`` and
    ``value.{start, end, timeserieslabels[]}``.
    """
    ann = tasks.select(
        F.col("data.truck_id").alias("truck_id"),
        F.col("data.date").alias("date"),
        F.explode("annotations").alias("ann"),
    )
    res = ann.select(
        "truck_id", "date", F.explode("ann.result").alias("r")
    ).filter(F.col("r.type") == "timeserieslabels")
    return res.select(
        "truck_id",
        "date",
        F.to_timestamp(F.col("r.value.start")).alias("start_time"),
        F.to_timestamp(F.col("r.value.end")).alias("end_time"),
        F.explode(F.col("r.value.timeserieslabels")).alias("label"),
    )
