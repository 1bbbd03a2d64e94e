"""Declarative table-validation rules → one violations report.

The reference validates at every boundary — CSV header checks on ingest
(`STEP 1 - Ingest Raw Telemetry/01_ingest_raw_telemetry.py`), row-count /
null-ratio QA after transform (`STEP 2`), integrity probes in the EDA
corpus (`STEP 3 - EDA Analysis/database_pipeline.py`) — but each check is
a bespoke query. This operator generalizes them: a rule list compiles to
ONE conditional aggregate over a single scan (plus one broadcast anti-join
branch per referential rule), returning (rule, kind, violations).

Rule kinds:
- ``not_null``:   col IS NULL
- ``in_range``:   col outside [lo, hi] (NULLs don't violate)
- ``in_set``:     col not in values (NULLs don't violate)
- ``matches``:    col doesn't rlike pattern (NULLs don't violate)
- ``unique``:     duplicate rows over cols (count − distinct, non-null)
- ``ref``:        col values absent from a dimension key (broadcast)

All scalar rules share the single scan's aggregate; ``unique`` rides the
same aggregate via count_distinct; only ``ref`` rules add a (broadcast)
join branch each, unioned into the report.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, functions as F


def validate_table(
    df: DataFrame, rules: Sequence[Mapping[str, Any]]
) -> DataFrame:
    """Compile ``rules`` into a violations report: (rule, kind, violations).

    Each rule is a mapping with ``name``, ``kind`` and kind-specific keys:
    ``col``; ``lo``/``hi`` (in_range); ``values`` (in_set); ``pattern``
    (matches); ``cols`` (unique); ``dim``+``dim_col`` (ref — ``dim`` is a
    DataFrame whose ``dim_col`` holds the valid keys; small/broadcast).
    """
    aggs = []
    meta = []  # (name, kind) aligned with aggs
    ref_parts = []
    for r in rules:
        name, kind = r["name"], r["kind"]
        if kind == "not_null":
            cond = F.col(r["col"]).isNull()
        elif kind == "in_range":
            c = F.col(r["col"])
            cond = c.isNotNull() & ~c.between(F.lit(r["lo"]), F.lit(r["hi"]))
        elif kind == "in_set":
            c = F.col(r["col"])
            cond = c.isNotNull() & ~c.isin(list(r["values"]))
        elif kind == "matches":
            c = F.col(r["col"])
            cond = c.isNotNull() & ~c.rlike(r["pattern"])
        elif kind == "unique":
            cols = [F.col(c) for c in r["cols"]]
            nn = cols[0].isNotNull()
            for c in cols[1:]:
                nn = nn & c.isNotNull()
            aggs.append(
                (
                    F.count(F.when(nn, F.lit(1)))
                    - F.count_distinct(*cols)
                ).cast("long").alias(f"__v{len(aggs)}")
            )
            meta.append((name, kind))
            continue
        elif kind == "ref":
            fk = F.col(r["col"])
            keys = r["dim"].select(
                F.col(r["dim_col"]).alias("__key")
            ).distinct()
            missing = (
                df.select(fk.alias("__key"))
                .filter(F.col("__key").isNotNull())
                .join(F.broadcast(keys), "__key", "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("violations"))
                .select(
                    F.lit(name).alias("rule"),
                    F.lit(kind).alias("kind"),
                    "violations",
                )
            )
            ref_parts.append(missing)
            continue
        else:
            raise ValueError(f"unknown rule kind: {kind!r}")
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"__v{len(aggs)}")
        )
        meta.append((name, kind))

    parts = []
    if aggs:
        wide = df.agg(*aggs)
        # unpivot the 1-row wide aggregate into (rule, kind, violations)
        stacked = wide.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(n).alias("rule"),
                        F.lit(k).alias("kind"),
                        F.col(f"__v{i}").alias("violations"),
                    )
                    for i, (n, k) in enumerate(meta)
                ])
            ).alias("r")
        ).select("r.rule", "r.kind", "r.violations")
        parts.append(stacked)
    parts.extend(ref_parts)
    if not parts:
        raise ValueError("rules must be non-empty")
    from datamine_v2_0_spark.operators.sets import union_all

    out = union_all(parts)
    return out


def population_stability(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
    eps: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    sample of ``value_col`` — the standard train/serve drift monitor for
    feature and label distributions. Returns one row per bin:
    (bin, n_ref, n_cur, p_ref, p_cur, psi_term); Σ psi_term is the PSI
    (rule of thumb: <0.1 stable, >0.25 shifted).

    Bins are ``n_bins`` equal-width cuts of the REFERENCE min/max (the
    deployed-model convention: the monitoring grid is frozen from the
    training data); current values outside the reference range clamp into
    the edge bins, and zero counts floor at ``eps`` inside the log so the
    index stays finite. Every bin always appears, observed or not.

    Plan shape: each side is one partial-agg shuffle on its bin id; the
    reference min/max and both bin tables are tiny 1-row/``n_bins``-row
    frames that broadcast into the final grid join — the raw tables are
    scanned exactly once each, and nothing corpus-sized shuffles twice.
    """
    v = F.col(value_col)
    stats = ref.agg(
        F.min(v).cast("double").alias("__mn"), F.max(v).cast("double").alias("__mx")
    )

    def binned(df: DataFrame, out: str) -> DataFrame:
        b = F.least(
            F.greatest(
                F.floor(
                    (v.cast("double") - F.col("__mn"))
                    # constant reference: zero width would floor(x/0)
                    # into an ANSI error — degrade to width 1 (all rows
                    # land in bin 0)
                    / F.when(
                        F.col("__mx") > F.col("__mn"),
                        (F.col("__mx") - F.col("__mn")) / F.lit(float(n_bins)),
                    ).otherwise(F.lit(1.0))
                ),
                F.lit(0).cast("long"),
            ),
            F.lit(int(n_bins) - 1).cast("long"),
        )
        return (
            df.filter(v.isNotNull())
            .crossJoin(F.broadcast(stats))
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    grid = stats.select(
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(int(n_bins) - 1).cast("long"))).alias("bin")
    )
    r = binned(ref, "n_ref")
    c = binned(cur, "n_cur")
    g = (
        grid.join(r, "bin", "left")
        .join(c, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = g.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    e = F.lit(float(eps))
    # try_divide: an EMPTY side has total 0, which must degrade to the
    # eps floor (greatest skips the NULL), not raise under ANSI
    p = F.greatest(F.try_divide(F.col("n_ref"), F.col("__tr")), e)
    q = F.greatest(F.try_divide(F.col("n_cur"), F.col("__tc")), e)
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_ref",
            "n_cur",
            F.round(p, round_to).alias("p_ref"),
            F.round(q, round_to).alias("p_cur"),
            F.round((p - q) * F.log(p / q), round_to).alias("psi_term"),
        )
    )
