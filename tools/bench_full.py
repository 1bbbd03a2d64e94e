"""Full-registry per-query timing sweep — the scaling-curve companion to
the headline bench.

Runs EVERY registered contract query once (after the same infra warmups
bench.py uses) at one or more sf dirs and prints one JSON line per sf:
{"sf": 0.01, "queries": {name: sec, ...}, "total": sec}.

Usage:
    python tools/bench_full.py [sf_dir ...]     # default: sf0.001 0.01 0.1

Timing is single-pass (this is a coverage/scaling artifact, not the
frozen headline protocol — bench.py's min-of-3 stays the round-over-
round comparator). tools/scaling_report.py turns multi-sf output into
SCALING.md with per-query scaling exponents.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datamine_v2_0_spark.contract import QUERIES  # noqa: E402
from datamine_v2_0_spark.session import get_spark  # noqa: E402


def warm(spark, sf_dir: str) -> None:
    from pyspark.sql import Window, functions as F
    from pyspark.sql.functions import col, pandas_udf

    spark.range(1000).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(64).select(_warm(col("id"))).count()
    warm_df = spark.range(10000).select(
        (col("id") % 8).alias("g"), col("id").cast("double").alias("v")
    )
    warm_df.groupBy("g").agg(F.percentile("v", F.lit(0.5))).count()
    w = Window.partitionBy("g").orderBy("v")
    warm_df.select(F.row_number().over(w), F.lag("v").over(w)).count()


def run_sf(spark, sf_dir: str) -> dict:
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    times: dict[str, float] = {}
    for name, (fn, _sql) in QUERIES.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:  # keep sweeping; record the failure
            times[name] = -1.0
            print(f"ERR {name}: {e}", file=sys.stderr)
    return {
        "sf": sf,
        "queries": times,
        "total": round(sum(t for t in times.values() if t > 0), 3),
    }


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("bench_full")
    warm(spark, dirs[0])
    for d in dirs:
        print(json.dumps(run_sf(spark, d)), flush=True)


if __name__ == "__main__":
    main()
