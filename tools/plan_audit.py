"""Physical-plan audit over every registered contract query.

For each query: count exchanges, joins by strategy, Python boundaries,
cartesian products, and parquet scans, then flag scale anti-patterns:

- CartesianProduct anywhere (all-pairs — fatal at scale)
- BroadcastNestedLoopJoin beyond the known benign 1-row stat fold-ins
- row-at-a-time Python (BatchEvalPython — non-Arrow UDF)
- single-task windows: an Exchange SinglePartition feeding a
  Sort -> Window chain (a global ``Window.orderBy`` with no
  partitionBy funnels the WHOLE relation through ONE task — the
  round-5 Mann-Whitney/KS defect class, found then by review, now by
  this probe) beyond the audited bounded-relation allowlist

Writes PLANS.md and exits nonzero on any flag.

Usage: python tools/plan_audit.py [sf_dir]
       python tools/plan_audit.py --selftest   # prove the window probe
                                               # fires on a broken plan
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

# queries whose BroadcastNestedLoopJoins are deliberate 1-row or
# tiny-literal fold-ins (corpus stats, thresholds) — linear, not
# all-pairs. Value = audited maximum; one more than audited is a flag.
BNLJ_OK = {
    "text_bm25": 1, "text_tfidf": 1, "text_lm_score": 1,
    "text_decontaminate": 1, "filt_balance_strata": 1,
    "filt_token_budget": 1, "pipeline_curation": 1,
    "dedup_lines": 1, "agg_incremental": 1, "sim_cosine_topk": 1,
    # broadcast of the 5 probe queries with a != self predicate — the
    # shortlist side is tiny by construction (k-probe ANN), linear scan
    "sim_pq_topk": 1,
    # deliberate replication of the SMALL side across the salt literals
    # (the whole point of the salted join); small x n_salts stays small
    "join_salted": 1,
    # cosine probe-set broadcast (tiny by construction) + the BM25 corpus
    # stats 1-row fold — both linear over the corpus
    "text_rrf": 2,
    # reference min/max (1 row) folded into both binned sides, the
    # n_bins-row grid joins, and the 1-row totals — all constant-size
    "qa_psi": 5,
    # stratum-weight total: 1-row fold into the rate table
    "filt_temperature_mix": 1,
    # the 1-row node-count folds into the init ranks and each of the 5
    # fixed power-method iterations — all constant-size broadcasts
    "graph_pagerank": 6,
    # data-derived histogram bounds: 1-row min/max fold into the binning
    "agg_histogram": 1,
    # 1-row stratum-count total folds into the share computation
    "agg_diversity": 1,
    # 1-row global err_ub (sum of per-partition MG decrements) folds
    # into the merged summary
    "agg_heavy_hitters": 1,
    # 1-row corpus (N, V) totals fold into the per-bigram probabilities
    "text_lm_bigram": 1,
    # 1-row (na, nb) totals fold into the ECDF normalization
    "stat_ks": 1,
    # contingency-grid completion: distinct rows x distinct columns
    # cross (bounded by category cardinality r*c, never data volume) —
    # unobserved cells must contribute E to the statistic
    "stat_chi2": 1,
    # 1-row chance-agreement numerator folds into the kappa computation
    "stat_kappa": 1,
    # 1-row grand-total fold into the grouped counts (replaced the
    # single-task empty-partition window, round-7)
    "agg_fraction": 1,
    # 1-row row-count fold into the closed-form NTILE arithmetic
    # (replaced the single-task global NTILE window, round-7)
    "scalar_quantile_bins": 1,
}
# the exact-ANN baseline is an intentional documented cross join
CARTESIAN_OK = {"sim_cosine_topk"}

# queries whose global (no-partitionBy) windows run over relations
# BOUNDED by construction — never by data volume. Value = audited
# maximum count of SinglePartition->Sort->Window chains; one more than
# audited is a flag. Boundedness argument per entry:
GLOBAL_WIN_OK = {
    # _dist_prefix_sums stitches bucket offsets with one global window
    # over the bucket-totals relation: exactly `buckets` rows (32),
    # set by the range exchange, independent of data volume. KS prints
    # the SAME bounded subtree twice (its cum relation feeds both the
    # max-aggregate and the crossJoin side).
    "stat_ks": 2,
    "agg_mannwhitney": 1,
    # same _dist_prefix_sums offsets stitch inside the scale-safe exact
    # NTILE (operators/binning.quantile_bins_exact)
    "scalar_quantile_bins": 1,
    # marginal sums over the completed contingency grid: r*c rows,
    # bounded by category cardinality, never data volume (same bound
    # as the BNLJ_OK grid-completion entry)
    "stat_chi2": 1,
}


def _tree_depth(line: str) -> int:
    """Indent depth of a Spark plan-tree line (prefix of tree-drawing
    chars ' :+|-' before the node name)."""
    i = 0
    while i < len(line) and line[i] in " :+|-*(":
        i += 1
    return i


_PASSTHROUGH = ("AQEShuffleRead", "ShuffleQueryStage", "InputAdapter",
                "WholeStageCodegen", "CollectMetrics")


def count_single_task_windows(plan: str) -> int:
    """Count Exchange SinglePartition nodes whose consumer chain is
    Sort -> Window (or Window directly): the 'global ordered window'
    shape that funnels its entire input relation through one task.

    Tree-parses the plan text: for each SinglePartition exchange, walk
    UP to strictly-shallower ancestor nodes (parents print above their
    children in Spark's tree rendering), skipping AQE/codegen
    pass-through wrappers, and match the first two real ancestors."""
    lines = plan.splitlines()
    n = 0
    for idx, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        ancestors: list[str] = []
        cur = _tree_depth(ln)
        for j in range(idx - 1, -1, -1):
            dj = _tree_depth(lines[j])
            if dj >= cur:
                continue
            cur = dj
            node = lines[j].strip(" :+|-")
            if node.startswith(_PASSTHROUGH):
                if dj == 0:
                    break
                continue
            ancestors.append(node)
            if len(ancestors) >= 2 or dj == 0:
                break
        if not ancestors:
            continue
        first = ancestors[0]
        second = ancestors[1] if len(ancestors) > 1 else ""
        if first.startswith("Window") or (
            first.startswith("Sort") and second.startswith(("Window", "WindowGroupLimit"))
        ):
            n += 1
    return n


def _selftest() -> None:
    """Prove the probe fires: build a deliberately-broken global ordered
    window over an unbounded relation (the exact round-5 MW/KS defect
    shape) and a correct partitioned one, and assert the counts."""
    from pyspark.sql import Window, functions as F

    from datamine_v2_0_spark.session import get_spark

    spark = get_spark("plan_audit_selftest")
    df = spark.range(100_000).select(
        (F.col("id") % 7).alias("g"), F.col("id").cast("double").alias("v")
    )
    broken = df.withColumn(
        "cum", F.sum("v").over(Window.orderBy("v"))  # no partitionBy!
    )
    p_broken = broken._jdf.queryExecution().executedPlan().toString()
    got = count_single_task_windows(p_broken)
    assert got == 1, f"probe must fire on the broken fixture, got {got}\n{p_broken}"

    ok = df.withColumn(
        "cum", F.sum("v").over(Window.partitionBy("g").orderBy("v"))
    )
    p_ok = ok._jdf.queryExecution().executedPlan().toString()
    got_ok = count_single_task_windows(p_ok)
    assert got_ok == 0, f"probe must stay silent on the partitioned fixture, got {got_ok}\n{p_ok}"

    # a plain global aggregate's SinglePartition exchange (bounded
    # partial-agg output) must NOT trip the probe
    agg = df.agg(F.sum("v").alias("s"))
    p_agg = agg._jdf.queryExecution().executedPlan().toString()
    assert count_single_task_windows(p_agg) == 0
    print("selftest OK: probe fires on global-window fixture, silent on "
          "partitioned window and global aggregate")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        _selftest()
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import DataFrame

    from datamine_v2_0_spark.contract import QUERIES
    from datamine_v2_0_spark.session import get_spark

    # `localCheckpoint` severs lineage, so the post-hoc plan of a
    # checkpointed query (pagerank iterations, BM25 posting build,
    # star-CC rounds, curation barrier) audits as near-empty. Wrap it
    # for the audit's duration: record the physical plan of every
    # DataFrame BEING checkpointed, then delegate — the audit counts
    # the union of the final plan and all severed subplans.
    captured: list = []
    # patch the CLASSIC DataFrame too — pyspark 4 instances resolve
    # their own override, not the pyspark.sql.DataFrame base method
    targets = [DataFrame]
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _CDF

        targets.append(_CDF)
    except ImportError:
        pass
    for cls in targets:
        orig_ckpt = cls.__dict__.get("localCheckpoint")
        if orig_ckpt is None:
            continue

        def recording_ckpt(self, *args, _orig=orig_ckpt, **kwargs):
            try:
                captured.append(
                    self._jdf.queryExecution().executedPlan().toString()
                )
            except Exception:  # noqa: BLE001
                pass
            return _orig(self, *args, **kwargs)

        cls.localCheckpoint = recording_ckpt

    spark = get_spark("plan_audit")
    rows = []
    flags = []
    for name, (fn, _sql) in QUERIES.items():
        try:
            captured.clear()
            df = fn(spark, sf_dir)
            p = df._jdf.queryExecution().executedPlan().toString()
            n_sub = len(captured)
            if n_sub:
                p = "\n".join([p, *captured])
        except Exception as ex:  # noqa: BLE001
            flags.append(f"{name}: plan build failed: {ex}")
            continue
        stats = {
            "exch": p.count("Exchange hashpartitioning")
            + p.count("Exchange rangepartitioning"),
            "bhj": p.count("BroadcastHashJoin"),
            "smj": p.count("SortMergeJoin"),
            "bnlj": p.count("BroadcastNestedLoopJoin"),
            "cart": p.count("CartesianProduct"),
            "arrow_py": p.count("ArrowEvalPython")
            + p.count("FlatMapGroupsInPandas")
            + p.count("MapInPandas"),
            "row_py": p.count("BatchEvalPython"),
            "scans": p.count("Scan parquet"),
            "sub": n_sub,
            "win1": count_single_task_windows(p),
        }
        rows.append((name, stats))
        if stats["cart"] and name not in CARTESIAN_OK:
            flags.append(f"{name}: CartesianProduct in plan")
        if stats["bnlj"] > BNLJ_OK.get(name, 0):
            flags.append(f"{name}: unexpected BroadcastNestedLoopJoin x{stats['bnlj']}")
        if stats["row_py"]:
            flags.append(f"{name}: row-at-a-time Python (BatchEvalPython)")
        if stats["win1"] > GLOBAL_WIN_OK.get(name, 0):
            flags.append(
                f"{name}: single-task ordered window x{stats['win1']} "
                "(Exchange SinglePartition -> Sort -> Window)"
            )

    hdr = (
        "# PLANS — physical-plan audit of every contract query\n\n"
        f"Generated by `tools/plan_audit.py` at {sf_dir}. Columns: hash/range\n"
        "exchanges, joins by strategy (broadcast-hash / sort-merge /\n"
        "broadcast-nested-loop), Arrow-batched vs row-at-a-time Python\n"
        "boundaries, parquet scans, and the number of localCheckpoint-severed\n"
        "subplans folded back into the audit (counts are the UNION of the\n"
        "final plan and every pre-checkpoint subplan — iterative queries are\n"
        "no longer a blind spot). BNLJ entries are audited 1-row stat\n"
        "fold-ins or bounded category-grid completions (see BNLJ_OK); the\n"
        "cartesian column is all zeros — the exact-ANN baseline's\n"
        "documented cross join plans as a BNLJ, so no CartesianProduct\n"
        "node appears in any of the audited plans. The 1task-win column\n"
        "counts Exchange SinglePartition -> Sort -> Window chains (a\n"
        "global ordered window funnels its whole input through ONE task);\n"
        "nonzero entries are audited bounded-relation stitches (the\n"
        "_dist_prefix_sums bucket-offsets window: exactly `buckets` rows\n"
        "by construction — see GLOBAL_WIN_OK).\n\n"
        "| query | exch | bhj | smj | bnlj | cartesian | arrow-py | row-py | scans | ckpt-subplans | 1task-win |\n"
        "|---|---|---|---|---|---|---|---|---|---|---|\n"
    )
    lines = [
        f"| {n} | {s['exch']} | {s['bhj']} | {s['smj']} | {s['bnlj']} "
        f"| {s['cart']} | {s['arrow_py']} | {s['row_py']} | {s['scans']} "
        f"| {s['sub']} | {s['win1']} |"
        for n, s in rows
    ]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write(hdr + "\n".join(lines) + "\n")
    print(f"{len(rows)} plans audited, {len(flags)} flags")
    for fl in flags:
        print("FLAG:", fl)
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
