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
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
