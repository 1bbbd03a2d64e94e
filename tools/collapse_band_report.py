"""Re-evaluate the duplication stress band (COLLAPSE_BAND.jsonl)
under the CURRENTLY SHIPPED collapse rules.

The band's timings and parity hashes are measurement evidence and never
change; the `auto` column in the raw JSONL reflects whatever rules were
live when a row was recorded (the band itself was used to calibrate
them, so early rows carry draft rules). This report is the reproducible
check the SCALING.md optimality claim points at: for every cell it
derives the shipped auto choice from the recorded corpus statistics and
scores it against the measured best plan.

Usage: python tools/collapse_band_report.py [jsonl_path]
"""

from __future__ import annotations

import json
import math
import sys

sys.path.insert(0, "/root/repo")


def band_stats(band: str, n: int, blowup: float) -> tuple[float, int]:
    """(trimmed, cmax) from the band geometry: uniform u{d} replicas
    have ceil(d)-sized groups; hot h{p} bands one viral group of p%."""
    if band.startswith("u"):
        return blowup, math.ceil(float(band[1:]))
    cmax = int(band[1:]) * n // 100
    return blowup - cmax * cmax / n, cmax


def main() -> None:
    from datamine_v2_0_spark.operators.dedup import (
        AGAINST_COLLAPSE_BETA, BM25_COLLAPSE_BLOWUP,
        CONTAINMENT_COLLAPSE_CMAX, PAIR_COLLAPSE_BETA,
        POSTING_COLLAPSE_BLOWUP, POSTING_COLLAPSE_CMAX,
        _pair_cmax_threshold,
    )

    path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/COLLAPSE_BAND.jsonl"
    bench_parallelism = 32  # the band ran on local[32]
    rows = [json.loads(l) for l in open(path)]
    mispicks = []
    for r in rows:
        trimmed, cmax = band_stats(r["band"], r["n_docs"], r["blowup"])
        n = r["n_docs"]
        if r["op"] == "dedup_minhash_lsh":
            fire = cmax >= _pair_cmax_threshold(
                n, bench_parallelism, PAIR_COLLAPSE_BETA
            )
        elif r["op"] == "dedup_against":
            fire = cmax >= _pair_cmax_threshold(
                n, bench_parallelism, AGAINST_COLLAPSE_BETA
            )
        elif r["op"] == "text_bm25":
            # band probe geometry: u bands keep the base probes (unique),
            # h bands put every probe on the viral text (50 identical)
            bq = 1.0 if r["band"].startswith("u") else 50.0
            fire = (
                trimmed * bq >= BM25_COLLAPSE_BLOWUP
                or cmax >= POSTING_COLLAPSE_CMAX
            )
        else:
            # containment crosses earlier than jaccard (round-10
            # h60/h80 bracket) — per-operator ceiling
            ceiling = (
                CONTAINMENT_COLLAPSE_CMAX
                if r["op"] == "dedup_containment"
                else POSTING_COLLAPSE_CMAX
            )
            fire = trimmed >= POSTING_COLLAPSE_BLOWUP or cmax >= ceiling
        t_auto = r["t_always"] if fire else r["t_never"]
        t_best = min(r["t_never"], r["t_always"])
        ratio = t_auto / t_best
        flag = "OK" if ratio <= 1.15 else f"MISPICK x{ratio:.2f}"
        if ratio > 1.15:
            mispicks.append((r["band"], r["op"], round(ratio, 2)))
        print(f"{r['band']:>4} {r['op']:<22} trimmed={trimmed:8.2f} "
              f"cmax={cmax:>5} auto={'always' if fire else 'never':<6} "
              f"direct={r['t_never']:>8} collapsed={r['t_always']:>8} {flag}")
    print(f"\n{len(rows)} cells, parity failures: "
          f"{sum(not r['parity'] for r in rows)}, "
          f"mispicks beyond 15%: {mispicks or 'none'}")


if __name__ == "__main__":
    main()
