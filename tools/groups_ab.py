"""Calm-host interleaved A/B of registry queries between two checkouts.

Round-8 left dedup_groups trending up at matched conditions (quiet r7
6.48 s -> quiet r8c 7.61 s, calib 0.545 -> 0.609; 4x replica 10.12 ->
12.13 s) after the mid-round persist regression was found and reverted;
this tool settled that as host drift, and round-12's code-vs-host
question was settled the same way. Round-13 (verdict task 7) it is the
GENERAL protocol for any code-vs-code bench question: INTERLEAVED
single-run passes over the two checkouts (A B A B ...), each pass a
fresh subprocess (fresh JVM, no cache carry-over), min-of-N and median
per side with a calibration run per pass so host drift loads onto both
sides symmetrically instead of onto whichever side ran later (the
round-12 back-to-back BENCH_AB's acknowledged weakness).

Queries are resolved from each checkout's own contract registry, so
the two sides run THEIR OWN code for the same names; each query is
forced end-to-end with a noop sink (the bench.py discipline — a bare
count() lets Catalyst prune row-preserving projections).

Usage: python tools/groups_ab.py <repo_a> <repo_b> [sf_dir]
         [--passes N] [--queries q1,q2,...]
Default query set: dedup_groups (the original round-8 question).
Prints one JSON line with per-side, per-query times + calibrations.
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
names = sys.argv[3].split(",")
sys.path.insert(0, repo)
from datamine_v2_0_spark.session import get_spark
spark = get_spark("groups_ab")
spark.range(1000).count()
# calibration: fixed-shape shuffle+agg, measures host quietness
t0 = time.time()
spark.range(0, 20_000_000).selectExpr("id % 97 AS k", "id AS v") \
    .groupBy("k").count().count()
calib = time.time() - t0
from datamine_v2_0_spark.contract import QUERIES
times = {}
for name in names:
    fn, _sql = QUERIES[name]
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    times[name] = round(time.time() - t0, 3)
print(json.dumps({"t": round(sum(times.values()), 3),
                  "queries": times, "calib": round(calib, 3)}))
"""


def run_pass(repo: str, sf_dir: str, queries: str) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, "-c", ONE_PASS, repo, sf_dir, queries],
        capture_output=True, text=True, env=env, cwd="/tmp",
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not line:
        raise RuntimeError(f"pass failed for {repo}: {out.stderr[-2000:]}")
    return json.loads(line[-1])


def main() -> None:
    repo_a = sys.argv[1]
    repo_b = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 and not sys.argv[3].startswith(
        "--"
    ) else "/root/testdata/sf0.1"
    passes = 5
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    queries = "dedup_groups"
    if "--queries" in sys.argv:
        queries = sys.argv[sys.argv.index("--queries") + 1]

    res = {"a": {"repo": repo_a, "runs": []}, "b": {"repo": repo_b, "runs": []}}
    for i in range(passes):
        for side, repo in (("a", repo_a), ("b", repo_b)):
            r = run_pass(repo, sf_dir, queries)
            res[side]["runs"].append(r)
            print(f"pass {i + 1} {side} ({repo}): t={r['t']} calib={r['calib']}",
                  flush=True)
    for side in ("a", "b"):
        runs = res[side]["runs"]
        res[side]["t_min"] = min(r["t"] for r in runs)
        res[side]["t_med"] = sorted(r["t"] for r in runs)[len(runs) // 2]
        res[side]["calib_med"] = sorted(r["calib"] for r in runs)[len(runs) // 2]
        # per-query min across passes, for drilling into a headline diff
        names = runs[0]["queries"].keys()
        res[side]["query_min"] = {
            n: min(r["queries"][n] for r in runs) for n in names
        }
    res["sf_dir"] = sf_dir
    res["queries"] = queries
    print(json.dumps(res))


if __name__ == "__main__":
    main()
