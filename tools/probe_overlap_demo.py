"""Measure the cross-corpus probe-correlation defect (round-11 ADVICE,
medium) and its fix at production sampling intensity.

dedup_against's auto probe samples the POOLED new ∪ ref corpus on a
hash of the id. The re-ingest shape the operator exists for puts the
same (id, text) on both sides: UNTAGGED, such a doc's two copies enter
the sample together or never, so its same-group collisions occur at
rate s instead of s² and the blowup estimator inflates by up to the
sampling factor K (for a fully-overlapping unique corpus the pooled
truth is blowup = 2 while the untagged estimate reads ≈ 1 + K). The
shipped fix side-tags the probe ids ("n:" / "r:" prefixes) so
inclusion decorrelates.

This tool reproduces both numbers on the 6M-doc generated corpus
(tools/probe_at_scale.py) pooled with itself — n = 12M, genuinely
above SAMPLED_PROBE_MIN_N, production constants, no monkeypatching —
plus the exact pooled truth, and appends one JSON line to
PROBE_AT_SCALE_r12.json.

Usage: python tools/probe_overlap_demo.py
"""

from __future__ import annotations

import json
import os
import time

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

SRC = "/tmp/probe6m/documents.parquet"
OUT = "/root/repo/PROBE_AT_SCALE_r12.json"


def main() -> None:
    from datamine_v2_0_spark.session import get_spark
    from datamine_v2_0_spark.operators import dedup as dd

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from probe_at_scale import build_corpus

    spark = get_spark("probe-overlap-demo")
    if not os.path.isdir(SRC):
        build_corpus(spark)
    base = spark.read.parquet(SRC)
    if "--unique-only" in sys.argv:
        # The bare defect shape: drop the planted in-corpus duplication
        # so EVERY pooled group is exactly the (new copy, ref copy)
        # pair — true pooled blowup = 2.0, and the untagged estimator's
        # rate-s collisions inflate it toward 1 + K with nothing to
        # mask them.
        base = base.filter(F.col("doc_id") >= 220_000)
    new_df = ref_df = base  # full id+text overlap: re-ingest

    untagged = new_df.select("doc_id", "text").unionAll(
        ref_df.select("doc_id", "text")
    )
    tagged = new_df.select(
        F.concat(F.lit("n:"), F.col("doc_id").cast("string")).alias("__pid"),
        F.col("text"),
    ).unionAll(
        ref_df.select(
            F.concat(F.lit("r:"), F.col("doc_id").cast("string")).alias("__pid"),
            F.col("text"),
        )
    )
    n = 2 * (6_000_000 - 220_000 if "--unique-only" in sys.argv else 6_000_000)
    p = dd._plan_parallelism(spark)
    threshold = dd._pair_cmax_threshold(n, p, dd.AGAINST_COLLAPSE_BETA)
    detect = threshold / dd.PROBE_GUARD_BAND

    readings = {}
    for name, df, id_col in (
        ("untagged", untagged, "doc_id"),
        ("tagged", tagged, "__pid"),
    ):
        dd.clear_dup_stats_cache()
        t0 = time.time()
        est = dd._dup_stats_sampled(df, "text", id_col, n, detect)
        readings[name] = {
            "n": est[0],
            "blowup_est": round(est[1], 3),
            "cmax_est": est[2],
            "wall_sec": round(time.time() - t0, 3),
        }
    dd.clear_dup_stats_cache()
    t0 = time.time()
    n_x, blowup_x, cmax_x = dd._dup_stats(untagged, "text")
    exact = {
        "n": n_x,
        "blowup": round(blowup_x, 3),
        "cmax": cmax_x,
        "wall_sec": round(time.time() - t0, 3),
    }
    target_m = max(
        dd.SAMPLED_PROBE_TARGET_M_FLOOR, int(20 * n ** 0.5),
        int(n * dd.PROBE_MIN_HITS / detect) + 1,
    )
    k = max(2, round(n / target_m))
    row = {
        "metric": "cross_corpus_probe_correlation_demo",
        "src": SRC,
        "shape": (
            "unique-tail only: every pooled group = one cross-side pair"
            if "--unique-only" in sys.argv
            else "new == ref (full id+text overlap, the re-ingest case)"
        ),
        "n_pooled": n,
        "parallelism": p,
        "threshold_cmax": round(threshold, 1),
        "k": k,
        "sample_fraction": round(1.0 / k, 5),
        "untagged": readings["untagged"],
        "tagged": readings["tagged"],
        "exact_pooled": exact,
        "blowup_inflation_untagged": round(
            readings["untagged"]["blowup_est"] / blowup_x, 3
        ),
        "blowup_error_tagged": round(
            readings["tagged"]["blowup_est"] / blowup_x - 1, 4
        ),
        "cmax_error_untagged": round(
            readings["untagged"]["cmax_est"] / cmax_x - 1, 4
        ) if cmax_x else None,
        "cmax_error_tagged": round(
            readings["tagged"]["cmax_est"] / cmax_x - 1, 4
        ) if cmax_x else None,
    }
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
