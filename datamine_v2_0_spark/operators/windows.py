"""Window-function operators (SURVEY.md §2.5, W1-W15).

Behavioral reference: the Postgres named window ``PARTITION BY device_id,
device_date ORDER BY timestamp`` used throughout
``STEP 4 - Feature Engineering/04_worker_script.sql:4-68`` in
ckpronto/datamine_v2.0. All wrappers are generic: callers pass partition /
order columns, so the same operators run on the TPC-H-ish testdata.

Scale notes:
- A window over ``partitionBy(keys)`` shuffles once on the keys; every
  additional window with the SAME partitioning reuses that exchange, so
  compose many features over one Window spec (Catalyst collapses them into
  a single Window physical node per frame).
- Whole-partition windows (no ORDER BY) keep the partition in memory per
  key — fine for device-day-sized groups (~90k rows), a skew risk for
  unbounded keys; prefer groupBy+join for those.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def ordered_window(
    partition_by: Sequence[str | Column], order_by: Sequence[str | Column]
) -> WindowSpec:
    """The canonical ``PARTITION BY ... ORDER BY ...`` spec (reference: named
    window ``w`` at 04_worker_script.sql:27)."""
    return Window.partitionBy(*partition_by).orderBy(*order_by)


# --- W1/W2: lag ---------------------------------------------------------

def lag_col(col: str | Column, w: WindowSpec, offset: int = 1) -> Column:
    """W1: ``LAG(col, offset) OVER w``."""
    return F.lag(col, offset).over(w)


def lag_default_current(col: Column, w: WindowSpec, offset: int = 1) -> Column:
    """W2: Postgres 3-arg ``LAG(col, 1, col)`` whose default references the
    current row's value — Spark's lag default must be a literal, so emulate
    with coalesce (04_worker_script.sql:23)."""
    return F.coalesce(F.lag(col, offset).over(w), col)


# --- W3/W4/W11: rolling frames ------------------------------------------

def rolling_mean(col: str | Column, w: WindowSpec, before: int, after: int) -> Column:
    """W3/W11: ROWS-frame rolling mean; centered 5-pt smooth is
    ``before=2, after=2`` (04_worker_script.sql:25)."""
    return F.avg(col).over(w.rowsBetween(-before, after))


def rolling_corr(
    x: str | Column, y: str | Column, w: WindowSpec, before: int, after: int
) -> Column:
    """Rolling Pearson correlation over a ROWS frame; constant or
    single-row windows yield NULL. With y = epoch time this is a
    windowed trend-strength signal.

    Built from population co-moments rather than ``F.corr``: under ANSI
    mode (Spark 4 default) corr's final division throws DIVIDE_BY_ZERO
    on a zero-variance frame, and a CASE guard can't prevent it — the
    window operator evaluates the aggregate before the projection sees
    it. ``covar_pop / (stddev_pop * stddev_pop)`` equals sample corr
    (the n-1 factors cancel), every sub-aggregate is total, and
    ``try_divide`` turns the degenerate frames into NULL — matching SQL
    engines' native corr semantics.

    All three moments are restricted to PAIRWISE-COMPLETE rows (both
    inputs non-null), exactly like native corr: covar_pop drops
    incomplete pairs on its own, so computing the stddevs over all rows
    would mix populations and can push the ratio outside [-1, 1]."""
    f = w.rowsBetween(-before, after)
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    both = xc.isNotNull() & yc.isNotNull()
    xm, ym = F.when(both, xc), F.when(both, yc)
    cov = F.covar_pop(xm, ym).over(f)
    sx = F.stddev_pop(xm).over(f)
    sy = F.stddev_pop(ym).over(f)
    return F.try_divide(cov, sx * sy)


def rolling_stddev(col: str | Column, w: WindowSpec, before: int, after: int) -> Column:
    """W11: trailing/centered rolling sample stddev."""
    return F.stddev(col).over(w.rowsBetween(-before, after))


def range_frame_mean(
    col: str | Column,
    partition_by: Sequence[str | Column],
    ts_seconds: Column,
    preceding_seconds: int,
) -> Column:
    """W4: ``RANGE BETWEEN INTERVAL 'n seconds' PRECEDING AND CURRENT ROW``
    over a numeric epoch-seconds ordering (STEP 4 README:68-74)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(ts_seconds)
        .rangeBetween(-preceding_seconds, 0)
    )
    return F.avg(col).over(w)


# --- W5: whole-partition aggregate as window ----------------------------

def partition_agg(agg: Column, partition_by: Sequence[str | Column]) -> Column:
    """W5: e.g. ``STDDEV(load_weight) OVER (PARTITION BY device_id)``
    (04_worker_script.sql:62). Pass the aggregate expression unevaluated:
    ``partition_agg(F.stddev("x"), ["device_id"])``."""
    return agg.over(Window.partitionBy(*partition_by))


# --- W6/W7: gaps-and-islands + running sums -----------------------------

def change_flag(col: str | Column, w: WindowSpec) -> Column:
    """W10: 1 where the value differs from the previous row — null-SAFE
    like `scd_type2`: `!=` returns NULL on a transition to/from a NULL
    value (merging NULL runs into the prior block) while `prev.isNull()`
    made every row after a NULL start a new block. row_number()==1 opens
    each partition; eqNullSafe handles NULL values as ordinary states."""
    c = F.col(col) if isinstance(col, str) else col
    prev = F.lag(c, 1).over(w)
    return F.when(F.row_number().over(w) == 1, F.lit(1)).otherwise(
        (~prev.eqNullSafe(c)).cast("int")
    )


def block_id(col: str | Column, w: WindowSpec) -> Column:
    """W6: gaps-and-islands block id — running sum of change flags
    (04_worker_script.sql:30-37)."""
    return F.sum(change_flag(col, w)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )


def running_sum(col: str | Column, w: WindowSpec) -> Column:
    """W7: running sum within partition, e.g. time-in-state
    (04_worker_script.sql:63-66)."""
    return F.sum(col).over(w.rowsBetween(Window.unboundedPreceding, 0))


# --- W8: inter-row time delta -------------------------------------------

def time_delta_seconds(ts: str | Column, w: WindowSpec) -> Column:
    """W8: ``EXTRACT(EPOCH FROM ts - LAG(ts))`` (04_worker_script.sql:24).

    Uses microsecond-precision ``unix_micros`` so sub-second telemetry
    cadence (~2 Hz) survives."""
    c = F.col(ts) if isinstance(ts, str) else ts
    micros = F.unix_micros(c)
    return (micros - F.lag(micros, 1).over(w)).cast("double") / F.lit(1_000_000.0)


# --- W9: per-group min/max as window ------------------------------------

def group_min_max(
    col: str | Column, partition_by: Sequence[str | Column]
) -> tuple[Column, Column]:
    """W9: event start/end (event_boundary_analysis.py:73-77)."""
    w = Window.partitionBy(*partition_by)
    return F.min(col).over(w), F.max(col).over(w)


# --- W12/W13: differences & shifts --------------------------------------

def diff(col: str | Column, w: WindowSpec, periods: int = 1) -> Column:
    """W12: k-step difference ``col - lag(col, k)``."""
    c = F.col(col) if isinstance(col, str) else col
    return c - F.lag(c, periods).over(w)


def second_diff(col: str | Column, w: WindowSpec) -> Column:
    """W12: ``diff().diff()`` — difference of the 1-step difference."""
    d1 = diff(col, w, 1)
    return d1 - F.lag(d1, 1).over(w)


# --- W14: persistence counter -------------------------------------------

def persistence_counter(w: WindowSpec) -> Column:
    """W14: ``cumcount()+1`` within (partition, block) — plain row_number."""
    return F.row_number().over(w)


# --- W15: rank-1 nearest ------------------------------------------------

def keep_rank1(
    df: DataFrame, partition_by: Sequence[str | Column], order_by: Sequence[Column]
) -> DataFrame:
    """W15: ``row_number() == 1`` filter — the decorrelated rewrite of the
    reference's ORDER BY ABS(...) LIMIT 1 correlated subquery
    (claudeinstructions.md:74-84)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# --- forward fill (smoothing family, §2.8) ------------------------------

def ffill(col: str | Column, w: WindowSpec) -> Column:
    """Forward-fill nulls: ``last(col, ignorenulls=True)`` over an
    unbounded-preceding frame (database_pipeline.py:207-217)."""
    return F.last(col, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )


def bfill(col: str | Column, w: WindowSpec) -> Column:
    """Backward-fill nulls: first non-null over the following frame
    (the reference's ffill().bfill() imputation pair)."""
    return F.first(col, ignorenulls=True).over(
        w.rowsBetween(0, Window.unboundedFollowing)
    )


def rank_features(
    w: WindowSpec, lead_col: str | Column, buckets: int = 4
) -> dict[str, Column]:
    """The generic ranking family over one ordered window (SURVEY §2.5
    closing note: not used by the reference, standard Spark surface):
    rank / dense_rank / percent_rank / cume_dist / ntile / lead. One
    window spec → all share a single sort+exchange."""
    return {
        "rnk": F.rank().over(w),
        "drnk": F.dense_rank().over(w),
        "prnk": F.percent_rank().over(w),
        "cdist": F.cume_dist().over(w),
        "tile": F.ntile(buckets).over(w),
        "next_val": F.lead(lead_col, 1).over(w),
    }


def sessionize(ts: str | Column, w: WindowSpec, gap_seconds: float) -> Column:
    """Time-gap sessionization as gaps-and-islands: a new session starts
    where the gap to the previous row exceeds `gap_seconds`. Returns a
    per-partition session id (1-based). The batch-checkable equivalent of
    a streaming session_window."""
    delta = time_delta_seconds(ts, w)
    new_session = F.when(
        delta.isNull() | (delta > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    return F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))


def hampel_filter(
    df: DataFrame,
    keys: "Sequence[str]",
    ts_col: str,
    value_col: str,
    half_window: int = 5,
    k: float = 3.0,
    tiebreak: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Hampel despiking filter: per key, each value is compared against
    the rolling median of its ±``half_window`` neighborhood; points
    farther than ``k``·1.4826·(rolling MAD) are flagged and replaced by
    that median — the standard telemetry spike cleaner (robust where a
    rolling-mean z-score is dragged by the very spikes being removed).

    Returns the input rows plus (roll_med, roll_mad, is_spike,
    value_clean). One window exchange: both percentile passes and the
    flag share the same (keys, ts) sort; frames are small (2h+1 rows),
    so the per-row imperative percentile evaluation stays O(frame) each.
    Window medians use exact interpolated percentile — identical
    semantics to SQL engines' windowed median.
    """
    keys = list(keys)
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(-half_window, half_window)
    )
    med = F.expr(f"percentile(`{value_col}`, 0.5)").over(w)
    out = df.withColumn("roll_med", med)
    # second pass over the SAME frame: rolling median of each row's
    # deviation from ITS OWN rolling median (the windowed-SQL Hampel
    # variant — the textbook form deviates from the center row's median,
    # which a frame aggregate cannot reference; on locally smooth series
    # the two agree, and any SQL engine reproduces this form exactly)
    out = out.withColumn("__dev", F.abs(F.col(value_col) - F.col("roll_med")))
    out = out.withColumn("roll_mad", F.expr("percentile(__dev, 0.5)").over(w))
    thresh = F.lit(float(k)) * F.lit(1.4826) * F.col("roll_mad")
    spike = F.abs(F.col(value_col) - F.col("roll_med")) > thresh
    return (
        out.withColumn("is_spike", spike)
        .withColumn(
            "value_clean",
            F.round(
                F.when(spike, F.col("roll_med")).otherwise(F.col(value_col)),
                round_to,
            ),
        )
        .withColumn("roll_med", F.round("roll_med", round_to))
        .withColumn("roll_mad", F.round("roll_mad", round_to))
        .drop("__dev")
    )


def scd_type2(
    df: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
):
    """Slowly-Changing-Dimension Type 2 history builder: collapse an
    event/snapshot stream into versioned validity intervals — one row
    per (key, consecutive run of equal ``attr``) with (version,
    valid_from, valid_to, is_current). valid_to is the start of the
    next version (half-open intervals, NULL while current) — the
    standard warehouse dimension-history shape.

    Gaps-and-islands: a lag-change flag, a running sum to number
    islands, one grouped min, then lead() for the closing edge. All
    three windows share the same (key × time) partitioning, so the plan
    pays ONE exchange."""
    w = ordered_window([key], [ts, tiebreak])
    # null-SAFE change detection: `!=` returns NULL on a transition to
    # or from a NULL attr, silently merging the NULL run into the prior
    # version. row_number()==1 opens the first version even when the
    # first attr is NULL (where eqNullSafe(lag=NULL, NULL) would not).
    changed = F.when(F.row_number().over(w) == 1, F.lit(1)).otherwise(
        (~F.lag(attr).over(w).eqNullSafe(F.col(attr))).cast("int")
    )
    islands = (
        df.withColumn("__chg", changed)
        .withColumn(
            "version",
            F.sum("__chg").over(
                Window.partitionBy(key).orderBy(ts, tiebreak).rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
        .groupBy(key, "version", attr)
        .agg(F.min(ts).alias("valid_from"))
    )
    wk = Window.partitionBy(key).orderBy("version")
    return (
        islands.withColumn("valid_to", F.lead("valid_from").over(wk))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key, attr, "version", "valid_from", "valid_to", "is_current")
    )
