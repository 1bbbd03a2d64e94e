"""Turn a multi-sf tools/bench_full.py sweep into SCALING.md.

Usage: python tools/scaling_report.py sweep.jsonl > SCALING.md

For each query, fit the scaling exponent alpha in t = c * n^alpha over
the sf0.01 -> sf0.1 step (10x rows): alpha = log10(t_0.1 / t_0.01).
The sf0.001 point is reported but not fitted — at that size nearly every
query is fixed-overhead-bound (session/plan/codegen), which would bias
alpha toward 0.

Reading alpha:
- alpha <= ~0.3 : overhead-bound at these sizes; the data term is not
  yet visible (most point lookups / tiny aggregates land here).
- alpha ~ 1    : scan-bound linear scaling — the ideal for one-pass
  operators at scale.
- alpha > 1.3  : grows faster than the input — a hidden quadratic or a
  log-linear sort term big enough to matter; must be explained or fixed.
"""

from __future__ import annotations

import json
import math
import sys


def main() -> None:
    runs = [json.loads(l) for l in open(sys.argv[1])]
    by_sf = {r["sf"]: r["queries"] for r in runs}
    sfs = sorted(by_sf)
    names = list(by_sf[sfs[-1]])
    lo, hi = 0.01, 0.1
    rows = []
    for n in names:
        t = {sf: by_sf[sf].get(n) for sf in sfs}
        if t.get(lo, -1) and t.get(hi, -1) and t[lo] > 0 and t[hi] > 0:
            alpha = math.log10(t[hi] / t[lo])
        else:
            alpha = float("nan")
        rows.append((n, t, alpha))
    rows.sort(key=lambda r: -(r[2] if r[2] == r[2] else -9))

    print("# SCALING — per-query scaling exponents")
    print()
    print("Source: single-pass full-registry sweep (tools/bench_full.py) at")
    print(f"sf {', '.join(str(s) for s in sfs)} on local[32]. alpha fitted on the")
    print("sf0.01 -> sf0.1 step (10x rows): alpha = log10(t_hi/t_lo); see")
    print("tools/scaling_report.py for how to read it. Single-pass timings on a")
    print("shared host carry +/-40% noise — treat alpha bands, not digits.")
    print()
    print("| query | t(sf0.001) s | t(sf0.01) s | t(sf0.1) s | alpha |")
    print("|---|---|---|---|---|")
    for n, t, alpha in rows:
        a = f"{alpha:.2f}" if alpha == alpha else "n/a"
        cells = " | ".join(
            f"{t[sf]:.2f}" if t.get(sf) and t[sf] > 0 else "err" for sf in sfs
        )
        print(f"| {n} | {cells} | {a} |")
    flagged = [(n, a) for n, _, a in rows if a == a and a > 1.3]
    print()
    print(f"Queries with alpha > 1.3: {len(flagged)}"
          + (" — explanations required below." if flagged else "."))
    for n, a in flagged:
        print(f"- `{n}` (alpha {a:.2f})")


if __name__ == "__main__":
    main()
