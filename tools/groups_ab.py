"""Calm-host A/B of q_dedup_groups between two checkouts of this repo.

Round-8 left dedup_groups trending up at matched conditions (quiet r7
6.48 s -> quiet r8c 7.61 s, calib 0.545 -> 0.609; 4x replica 10.12 ->
12.13 s) after the mid-round persist regression was found and reverted.
This tool settles noise-vs-real: INTERLEAVED single-run passes over the
two checkouts (A B A B ...), each pass a fresh subprocess (fresh JVM, no
cache carry-over), min-of-N per side reported with a calibration run
per pass so host drift is visible.

Usage: python tools/groups_ab.py <repo_a> <repo_b> [sf_dir] [--passes N]
Prints one JSON line with per-side times + calibrations.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ONE_PASS = r"""
import sys, time, json
repo = sys.argv[1]
sf_dir = sys.argv[2]
sys.path.insert(0, repo)
from datamine_v2_0_spark.session import get_spark
spark = get_spark("groups_ab")
spark.range(1000).count()
# calibration: fixed-shape shuffle+agg, measures host quietness
t0 = time.time()
spark.range(0, 20_000_000).selectExpr("id % 97 AS k", "id AS v") \
    .groupBy("k").count().count()
calib = time.time() - t0
import importlib
q = importlib.import_module("datamine_v2_0_spark.queries.dedup")
t0 = time.time()
n = q.q_dedup_groups(spark, sf_dir).count()
dt = time.time() - t0
print(json.dumps({"t": round(dt, 3), "calib": round(calib, 3), "rows": n}))
"""


def run_pass(repo: str, sf_dir: str) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, "-c", ONE_PASS, repo, sf_dir],
        capture_output=True, text=True, env=env, cwd="/tmp",
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not line:
        raise RuntimeError(f"pass failed for {repo}: {out.stderr[-2000:]}")
    return json.loads(line[-1])


def main() -> None:
    repo_a = sys.argv[1]
    repo_b = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    passes = 5
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])

    res = {"a": {"repo": repo_a, "runs": []}, "b": {"repo": repo_b, "runs": []}}
    for i in range(passes):
        for side, repo in (("a", repo_a), ("b", repo_b)):
            r = run_pass(repo, sf_dir)
            res[side]["runs"].append(r)
            print(f"pass {i + 1} {side} ({repo}): t={r['t']} calib={r['calib']} "
                  f"rows={r['rows']}", flush=True)
    for side in ("a", "b"):
        runs = res[side]["runs"]
        res[side]["t_min"] = min(r["t"] for r in runs)
        res[side]["t_med"] = sorted(r["t"] for r in runs)[len(runs) // 2]
        res[side]["calib_med"] = sorted(r["calib"] for r in runs)[len(runs) // 2]
    res["sf_dir"] = sf_dir
    print(json.dumps(res))


if __name__ == "__main__":
    main()
