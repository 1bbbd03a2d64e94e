"""Label Studio annotation source/sink (S11, S13-JSON): nested task JSON
→ flat label intervals, and the per-key task-file emitter.

Behavioral reference: ckpronto/datamine_v2.0
``STEP 2.1 - LD Event Labeling/02.1.2_neural_net_training_ldevents_label_recombine.py:210-274``
— task → annotations[] → result[] → value{start, end, timeserieslabels[]},
flattened to (truck_id, date, start_time, end_time, label) — and
``02.1.1_neural_net_training_ldevents_lsprep.py:282-296`` — one
``{truck}_{date}_task.json`` pointer file per labeling unit.

Spark shape: ``spark.read.json`` + two ``explode``s + a type filter — all
JVM-side; no Python JSON parsing on the read path.
"""

from __future__ import annotations

import json
import os

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


def write_label_studio_tasks(
    df: DataFrame,
    output_dir: str,
    truck_col: str = "truck_id",
    date_col: str = "date",
    url_prefix: str = "/data/local-files/?d=datamine-input/",
) -> int:
    """S13 (JSON side): emit one ``{truck}_{date}_task.json`` per distinct
    key, pointing Label Studio at the matching per-key CSV
    (02.1.1_neural_net_training_ldevents_lsprep.py:282-296; format
    ``{"data": {"truck_id", "date", "csv_url"}}``).

    Deliberately driver-side: task files are name-addressed KB-sized
    pointers at fleet×days cardinality (the bulky timeseries flows
    through the partitioned CSV sink instead), and Spark sinks cannot
    control per-row output filenames. Only the DISTINCT keys are
    collected. Returns the number of task files written."""
    import re

    keys = (
        df.select(F.col(truck_col).alias("t"), F.col(date_col).alias("d"))
        .distinct()
        .collect()
    )
    os.makedirs(output_dir, exist_ok=True)
    seen_names: dict[str, tuple[str, str]] = {}
    for r in keys:
        if r["t"] is None or r["d"] is None:
            raise ValueError("NULL truck/date key in Label Studio task feed")
        truck, date = str(r["t"]), str(r["d"])
        # keys become filenames: refuse anything that could escape
        # output_dir (path separators, traversal) or junk the csv_url
        if not re.fullmatch(r"[A-Za-z0-9._\-]+", truck) or not re.fullmatch(
            r"[A-Za-z0-9._\-]+", date
        ) or ".." in (truck, date):
            raise ValueError(f"unsafe task key for filename: {truck!r}/{date!r}")
        # '_' is legal inside keys, so distinct key pairs can collide on
        # the joined name (('A_1','07') vs ('A','1_07')) — refuse rather
        # than silently overwrite one labeling unit with another
        name = f"{truck}_{date}"
        if name in seen_names and seen_names[name] != (truck, date):
            raise ValueError(
                f"task filename collision: {seen_names[name]!r} and "
                f"{(truck, date)!r} both map to {name!r}"
            )
        seen_names[name] = (truck, date)
        task = {
            "data": {
                "truck_id": truck,
                "date": date,
                "csv_url": f"{url_prefix}{truck}_{date}.csv",
            }
        }
        path = os.path.join(output_dir, f"{truck}_{date}_task.json")
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(task, fh, indent=2, ensure_ascii=False)
    return len(keys)
