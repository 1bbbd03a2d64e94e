"""Decision-parity calibration of the sampled duplication probe.

Round-11 verdict task 1: before the sampled probe (`dedup._dup_stats_sampled`
+ the guard-band exact fallback in the `auto` collapse resolvers) is trusted
above SAMPLED_PROBE_MIN_N docs, measure how often it would FLIP a collapse
decision relative to the exact probe — on the same 54-cell stress band that
calibrated the thresholds themselves (tools/collapse_band.py corpora), plus
the skewed and 16x replicas.

Emulation: the band corpora (n = 5k-80k) sit far below the production
cutoff, so we scale the sampling INTENSITY, not the corpus: production
sizes target_m = max(200k floor, 20*sqrt(n), n*PROBE_MIN_HITS/min_detect)
where min_detect = threshold / PROBE_GUARD_BAND. The two n-scaled terms
are the detectability guarantees — 20*sqrt(n) pins the blowup-collision
count at the spread threshold to a CONSTANT (~200*(blowup-1)) in n, and
the hits term keeps a threshold-cmax group at >= PROBE_MIN_HITS expected
sampled members — so each cell here uses target_m = max(20*sqrt(n),
n*PROBE_MIN_HITS/min_detect(n)), i.e. the worst sampling intensity
production ever runs for that rule (the 200k absolute floor only ADDS
sample), and draws 20 independent samples (salted member hash;
production is salt-free and deterministic). Cells where that target_m
>= n/4 are the estimator's own small-corpus guard (`exact_by_guard`):
production returns the exact probe there, parity is structural, and we
record them as such.

Per draw we record BOTH decisions:
  raw      — rule applied to the sampled estimates alone (no guard band)
  guarded  — the production path: estimates inside the +/-2x guard band of
             any threshold defer to the exact probe (parity by
             construction there; `fallback` counts how often)

Output: one JSON line per (corpus, rule) cell to PROBE_CALIB.jsonl and a
printed summary; SCALING.md carries the table.

Usage: python tools/probe_calibration.py [--salts N] [--src sf_dir]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

OUT = "/root/repo/PROBE_CALIB.jsonl"

# (rule name, family, params) — the exact thresholds each operator's auto
# resolution applies (see operators/dedup.py threshold block + bm25_topk).
# bm25 is evaluated at query-side blowup 1.0 (the constant-probe set the
# band bench measured at).


def _rules(dd):
    return [
        ("dedup_minhash_lsh", "pair", {"beta": dd.PAIR_COLLAPSE_BETA}),
        ("dedup_against", "pair", {"beta": dd.AGAINST_COLLAPSE_BETA}),
        (
            "dedup_jaccard_inverted",
            "posting",
            {"blowup": dd.POSTING_COLLAPSE_BLOWUP, "cmax": dd.POSTING_COLLAPSE_CMAX},
        ),
        (
            "dedup_containment",
            "posting",
            {
                "blowup": dd.POSTING_COLLAPSE_BLOWUP,
                "cmax": dd.CONTAINMENT_COLLAPSE_CMAX,
            },
        ),
        (
            "text_bm25",
            "posting",
            {"blowup": 6.0, "cmax": dd.POSTING_COLLAPSE_CMAX},
        ),
    ]


def _decide(family, params, stats, p):
    """The resolver's rule on a concrete stats tuple (no probe, no guard)."""
    from datamine_v2_0_spark.operators import dedup as dd

    n, blowup, cmax = stats
    if n == 0:
        return False
    if family == "pair":
        thr = dd._pair_cmax_threshold(n, p, params["beta"])
        return cmax >= thr
    trimmed = blowup - cmax * cmax / n
    return trimmed >= params["blowup"] or cmax >= params["cmax"]


def _near_threshold(family, params, stats, p, guard):
    from datamine_v2_0_spark.operators import dedup as dd

    n, blowup, cmax = stats
    if n == 0:
        return False
    if family == "pair":
        thr = dd._pair_cmax_threshold(n, p, params["beta"])
        return thr / guard <= cmax <= thr * guard
    trimmed = blowup - cmax * cmax / n
    return (
        params["blowup"] / guard <= trimmed <= params["blowup"] * guard
        or params["cmax"] / guard <= cmax <= params["cmax"] * guard
    )


def _min_detect(family, params, n, p, guard):
    from datamine_v2_0_spark.operators import dedup as dd

    if family == "pair":
        return dd._pair_cmax_threshold(n, p, params["beta"]) / guard
    return params["cmax"] / guard


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--salts", type=int, default=20)
    ap.add_argument(
        "--uniform", default="1.5,2,4,8,16", help="uniform band multipliers"
    )
    ap.add_argument("--hot", default="5,10,20,40,60,80", help="hot band percents")
    ap.add_argument(
        "--hot16x",
        default="5,10,20,40",
        help="hot band percents built from the 16x replica (n=80k): the "
        "sf0.1 hot bands sit at n=5000 where the 20*sqrt(n) floor makes "
        "production go exact, so THESE cells are where the sampled probe "
        "genuinely estimates a mega-group cmax (4k-32k) and, past the "
        "guard band, decides collapse on the sample alone",
    )
    ap.add_argument(
        "--extra",
        default="/tmp/skewdata/documents.parquet,/tmp/scaled_16x/documents.parquet",
        help="comma-separated replica documents tables",
    )
    args = ap.parse_args()

    from datamine_v2_0_spark.session import get_spark
    from datamine_v2_0_spark.operators import dedup as dd
    from tools.collapse_band import BAND_DIR, build_uniform, build_hot

    spark = get_spark("probe-calibration")
    p = dd._plan_parallelism(spark)
    guard = dd.PROBE_GUARD_BAND
    hits = dd.PROBE_MIN_HITS

    corpora: list[tuple[str, str]] = []
    for d in [float(x) for x in args.uniform.split(",") if x]:
        name = f"u{d:g}"
        path = f"{BAND_DIR}/{name}"
        build_uniform(spark, args.src, d, path)
        corpora.append((name, path))
    for pct in [int(x) for x in args.hot.split(",") if x]:
        name = f"h{pct}"
        path = f"{BAND_DIR}/{name}"
        build_hot(spark, args.src, pct, path)
        corpora.append((name, path))
    for pct in [int(x) for x in args.hot16x.split(",") if x]:
        name = f"h{pct}x16"
        path = f"{BAND_DIR}/{name}"
        build_hot(spark, "/tmp/scaled_16x", pct, path)
        corpora.append((name, path))
    for path in [x for x in args.extra.split(",") if x]:
        name = path.strip("/").split("/")[-2]
        corpora.append((name, path))

    rows = []
    for cname, cpath in corpora:
        docs = spark.read.parquet(cpath).persist()
        n_exact, blow_exact, cmax_exact = dd._dup_stats(docs, "text")
        exact = (n_exact, blow_exact, cmax_exact)
        for rname, family, params in _rules(dd):
            detect = _min_detect(family, params, n_exact, p, guard)
            target_m = max(
                int(20 * n_exact ** 0.5), int(n_exact * hits / detect) + 1
            )
            exact_decision = _decide(family, params, exact, p)
            cell = {
                "corpus": cname,
                "rule": rname,
                "n": n_exact,
                "blowup": round(blow_exact, 3),
                "cmax": cmax_exact,
                "min_detect_cmax": round(detect, 1),
                "target_m": target_m,
                "exact_decision": exact_decision,
                "salts": args.salts,
            }
            if n_exact <= 4 * target_m:
                # production's small-corpus guard: exact probe outright
                cell.update(
                    exact_by_guard=True,
                    flips_raw=0,
                    flips_guarded=0,
                    fallbacks=0,
                )
                rows.append(cell)
                continue
            flips_raw = flips_guarded = fallbacks = 0
            ests = []
            for salt in range(args.salts):
                est = dd._dup_stats_sampled(
                    docs,
                    "text",
                    "doc_id",
                    n=n_exact,
                    min_detect_cmax=0.0,  # target_m passed explicitly
                    target_m=target_m,
                    salt=str(salt),
                )
                ests.append([round(est[1], 3), est[2]])
                raw = _decide(family, params, est, p)
                if raw != exact_decision:
                    flips_raw += 1
                if _near_threshold(family, params, est, p, guard):
                    fallbacks += 1  # guarded path defers to exact: parity
                elif raw != exact_decision:
                    flips_guarded += 1
            cell.update(
                exact_by_guard=False,
                flips_raw=flips_raw,
                flips_guarded=flips_guarded,
                fallbacks=fallbacks,
                est_blowup_cmax=ests,
            )
            rows.append(cell)
            print(
                f"{cname:>12} {rname:<24} exact={exact_decision!s:<5} "
                f"raw_flips={flips_raw:>2}/{args.salts} "
                f"guarded_flips={flips_guarded:>2} fallbacks={fallbacks:>2}",
                flush=True,
            )
        docs.unpersist()

    with open(OUT, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    sampled_cells = [r for r in rows if not r["exact_by_guard"]]
    total_draws = sum(r["salts"] for r in sampled_cells)
    print(
        f"\ncells={len(rows)} sampled_cells={len(sampled_cells)} "
        f"draws={total_draws} "
        f"raw_flips={sum(r['flips_raw'] for r in sampled_cells)} "
        f"guarded_flips={sum(r['flips_guarded'] for r in sampled_cells)} "
        f"fallbacks={sum(r['fallbacks'] for r in sampled_cells)}"
    )


if __name__ == "__main__":
    main()
