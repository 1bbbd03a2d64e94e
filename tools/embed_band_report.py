"""Re-evaluate the embedding collapse band (EMBED_BAND.jsonl) under
the CURRENTLY SHIPPED decision rule — the affine+P-clamp crossover
g*² = EMBED_COLLAPSE_INTERCEPT + EMBED_COLLAPSE_BETA·n/P with P
clamped up to PAIR_CALIBRATION_P (operators/dedup.py).

Companion of tools/collapse_band_report.py for the embedding family,
ordered by the round-11 verdict ("What's wrong #2"): the band's raw
`auto`/`auto_optimal` columns reflect whatever rule was live when each
row was recorded — the band CALIBRATED the shipped rule, so early rows
necessarily carry draft rules and their `auto_optimal: false` entries
are pre-fix evidence, not live mispicks. This report makes the
artifact read alone:

- each historical row's recording-time rule is reconstructed from its
  `predicted_crossover` (sqrt-form beta 3841.6 → affine-no-clamp →
  shipped affine+clamp); new rows carry an explicit `rule` field
  written by tools/embed_band.py.
- per (src, n, P, g, uniquified?) cell only the LATEST row is
  authoritative — re-measurements supersede: the non-uniquified 4x
  cells were measured on a make_scaled replica whose copied vectors
  add replica² background pairs (the confound --uniquify exists for),
  and were re-measured uniquified.
- for each authoritative cell the report derives the SHIPPED auto
  choice from (n, P, g) alone and scores it against the measured best
  plan, printing the mispick cost (t_chosen/t_best - 1).

Historical rows carry no uniquified flag; the non-uniquified batch is
known from round-11's run history to be rows 3-8 (the first scaled_4x
batch — its g<=800 rows carry the round pair counts g(g-1)/2 + 12000
of 2000 exact 4-copy background groups). New rows record the flag
explicitly.

Usage: python tools/embed_band_report.py [jsonl_path]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def reconstruct_rule(row: dict) -> str:
    """The decision rule a historical row's auto column was computed
    under, from its recorded predicted_crossover."""
    if "rule" in row:
        return row["rule"]
    n, p, pred = row["n"], row["parallelism"], row["predicted_crossover"]
    if abs(pred - (3841.6 * n / p) ** 0.5) < 2.0:
        return "sqrt(b=3841.6)  [round-10 draft]"
    from datamine_v2_0_spark.operators import dedup as dd

    i, b = dd.EMBED_COLLAPSE_INTERCEPT, dd.EMBED_COLLAPSE_BETA
    if abs(pred - (i + b * n / p) ** 0.5) < 2.0:
        return f"affine(i={i},b={b}) no clamp  [round-11 draft]"
    if abs(pred - (i + b * n / max(p, dd.PAIR_CALIBRATION_P)) ** 0.5) < 2.0:
        return f"affine(i={i},b={b})+clampP{dd.PAIR_CALIBRATION_P}  [shipped]"
    return f"unknown (pred={pred})"


# The one historical batch measured WITHOUT --uniquify (run history,
# round 11; its g<=800 rows carry the round g(g-1)/2 + 12000 pair
# counts of the 2000 exact 4-copy background groups).
_HISTORICAL_NON_UNIQUIFIED_ROWS = frozenset(range(3, 9))


def is_uniquified(row: dict, idx: int) -> bool:
    if "uniquified" in row:
        return bool(row["uniquified"])
    if "scaled" not in row["src"]:
        return True  # base corpora have no replica copies to perturb
    return idx not in _HISTORICAL_NON_UNIQUIFIED_ROWS


def main() -> None:
    from datamine_v2_0_spark.operators import dedup as dd

    path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/EMBED_BAND.jsonl"
    rows = [json.loads(l) for l in open(path)]
    shipped = (
        f"affine(i={dd.EMBED_COLLAPSE_INTERCEPT},"
        f"b={dd.EMBED_COLLAPSE_BETA})+clampP{dd.PAIR_CALIBRATION_P}"
    )
    print(f"shipped rule: {shipped}")
    print(f"{len(rows)} rows")

    # Latest row per cell is authoritative. A non-uniquified scaled
    # row's WINNER label is confounded (replica-copy background pairs
    # inflate the direct plan), so a uniquified row of the same
    # (src, n, P, g) supersedes it regardless of order; among rows of
    # equal uniquification, later re-measurements supersede earlier.
    latest: dict[tuple, int] = {}
    for i, r in enumerate(rows):
        cell = (r["src"], r["n"], r["parallelism"], r["g"])
        prev = latest.get(cell)
        if prev is None or is_uniquified(r, i) >= is_uniquified(rows[prev], prev):
            latest[cell] = i
    superseded = {
        i: latest[(r["src"], r["n"], r["parallelism"], r["g"])]
        for i, r in enumerate(rows)
        if latest[(r["src"], r["n"], r["parallelism"], r["g"])] != i
    }

    mispicks = []
    print("\nrow  cell                         rule-at-record       "
          "shipped-auto winner  status")
    for i, r in enumerate(rows):
        n, p, g = r["n"], r["parallelism"], r["g"]
        uq = is_uniquified(r, i)
        thr = dd._pair_cmax_threshold(
            n, p, dd.EMBED_COLLAPSE_BETA, dd.EMBED_COLLAPSE_INTERCEPT
        )
        ship_auto = "always" if g >= thr else "never"
        t_pick = r["t_always"] if ship_auto == "always" else r["t_never"]
        t_best = min(r["t_always"], r["t_never"])
        cost = t_pick / t_best - 1.0
        cell = f"n={n} P={p} g={g}{'' if uq else ' non-uniq'}"
        if i in superseded:
            status = f"superseded by row {superseded[i]}"
        elif not uq:
            status = "confounded winner (non-uniquified replica), no re-run"
        elif ship_auto == r["winner"]:
            status = "optimal"
        else:
            status = f"MISPICK cost {cost * 100:.0f}%"
            mispicks.append((i, cell, cost))
        print(f"{i:3}  {cell:28} {reconstruct_rule(r)[:20]:20} "
              f"{ship_auto:12} {r['winner']:7} {status}")

    print(f"\nauthoritative cells: {len(latest)}; live-rule mispicks "
          f"among them: {len(mispicks)}")
    for i, cell, cost in mispicks:
        print(f"  row {i} ({cell}): shipped auto picks the measured "
              f"slower plan, cost {cost * 100:.0f}% "
              f"({'inside' if cost <= 0.15 else 'OUTSIDE'} the declared "
              f"15% at-the-flip tolerance)")


if __name__ == "__main__":
    main()
