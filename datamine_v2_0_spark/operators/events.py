"""Event-sequence analytics: ordered funnels and cohort retention.

The reference's EDA corpus interrogates per-device event streams (state
transitions, activity profiles — `STEP 3 - EDA Analysis/database_pipeline.py`);
these are the two canonical generalizations of that shape for any events
table.

Funnel: ONE shuffle. The naive k-step funnel is k dependent
filtered-aggregate passes (step i's min-ts needs step i-1's); at 100 TB
that re-shuffles the events table k times. Instead each user's events
fold ONCE through a higher-order aggregate over the sorted (ts, type)
array — linear scan per user, JVM-side, no Python — producing the
earliest completion time of every stage in a single groupBy.

Cohort retention: two shuffles (first-seen agg on user, then the
co-partitioned join back and the (cohort, offset) agg).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def funnel_steps(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str,
    ts_col: str,
    type_col: str,
) -> DataFrame:
    """Ordered-funnel completion counts: (step, step_name, users).

    A user completes stage i at the earliest event of type ``steps[i]``
    STRICTLY after their stage-i-1 completion (stage 0 at their earliest
    ``steps[0]`` event). ``users`` counts users reaching stage i; counts
    are non-increasing down the funnel.

    The fold evaluates every stage against the PRE-update state, so one
    event can never complete two stages (strict ordering), and events
    tie-break deterministically on (ts, type) sort order.
    """
    k = len(steps)
    if k == 0:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != k:
        raise ValueError("steps must be distinct event types")

    evs = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("ty")))
    )
    # (applied below) only funnel-step events enter the per-user array:
    # non-step events can never match a stage, and collect_list has no
    # spill path inside a group — an unfiltered power user would
    # materialize millions of irrelevant events in one executor array
    steps_arr = F.array(*[F.lit(s) for s in steps])
    init = F.array(*[F.lit(None).cast("timestamp") for _ in range(k)])

    def fold(acc, e):
        # acc[idx] (0-based) == element_at(acc, idx) with 1-based idx
        def upd(x, idx):
            prev_done = F.when(
                idx == 0, F.lit(True)
            ).otherwise(
                F.element_at(acc, idx).isNotNull()
                & (F.element_at(acc, idx) < e["ts"])
            )
            return F.when(x.isNotNull(), x).when(
                (F.element_at(steps_arr, idx + 1) == e["ty"]) & prev_done,
                e["ts"],
            )

        return F.transform(acc, upd)

    per_user = (
        df.filter(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .agg(F.aggregate(evs, init, fold).alias("__stages"))
    )
    # explode stage completions -> per-step distinct-user counts
    counted = (
        per_user.select(
            F.posexplode(F.col("__stages")).alias("step", "__done"),
        )
        .groupBy("step")
        .agg(F.count(F.col("__done")).alias("users"))  # count skips nulls
    )
    # ALWAYS one row per declared step: a slice with no step events at
    # all reports users=0 for every stage instead of an empty frame
    # (the shape report readers and the SQL form both expect)
    spark = df.sparkSession
    grid = spark.createDataFrame(
        [(i, s) for i, s in enumerate(steps)], "step int, step_name string"
    )
    return (
        grid.join(counted, "step", "left")
        .select(
            "step",
            "step_name",
            F.coalesce("users", F.lit(0)).cast("long").alias("users"),
        )
    )


def transition_matrix(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    state_col: str,
    tiebreak: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition counts/probabilities over each
    entity's ordered state sequence: (from_state, to_state, n,
    prob) where prob = n / Σ n over the same from_state — the
    state-transition EDA the reference runs per device
    (`STEP 3 - EDA Analysis/database_pipeline.py` state-change queries),
    generalized to any event stream.

    One window (lag over entity, ts order) + one hash aggregate; the
    row-level probability share folds in as a window over the from_state
    marginal — no second scan. ``tiebreak`` totalizes same-ts orderings.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    pairs = (
        df.withColumn("__prev", F.lag(state_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(F.col("__prev").alias("from_state"), F.col(state_col).alias("to_state"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wm = Window.partitionBy("from_state")
    return pairs.select(
        "from_state",
        "to_state",
        "n",
        F.round(F.col("n") / F.sum("n").over(wm), round_to).alias("prob"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    max_offset: int | None = None,
) -> DataFrame:
    """Weekly cohort retention: (cohort_week, week_offset, users).

    cohort_week = Monday-truncated week of the user's first event;
    week_offset = whole weeks between cohort week and the activity week.
    ``users`` is the distinct active users of that cohort at that offset
    (offset 0 row = cohort size).
    """
    first = df.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("__cohort")
    )
    act = df.join(first, user_col).select(
        user_col,
        F.to_date("__cohort").alias("cohort_week"),
        (
            F.datediff(F.date_trunc("week", F.col(ts_col)), F.col("__cohort")) / 7
        ).cast("int").alias("week_offset"),
    )
    if max_offset is not None:
        act = act.filter(F.col("week_offset") <= max_offset)
    return (
        act.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(user_col).alias("users"))
    )
