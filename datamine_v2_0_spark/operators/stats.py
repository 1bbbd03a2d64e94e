"""Statistical analysis operators: per-group OLS trend fitting and the
Mann–Whitney U rank test. Companions to `aggregates.ab_welch_ttest`
(parametric A/B) and `aggregates.grouped_mad` (robust dispersion).

Everything here is pure Column algebra — closed-form sufficient
statistics inside ONE partial-aggregatable pass (OLS) or one rank
window + one aggregate (Mann–Whitney). No UDFs, no collects; at 100 TB
each operator costs a single shuffle on its grouping key.

Reference parity: the reference's EDA step fits trends per device via
pandas/Polars in a driver loop (`STEP 3 - EDA Analysis`); here the
closed-form sums make the fit a distributed aggregate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def grouped_linreg(
    df: DataFrame,
    keys: Sequence[str],
    x: str,
    y: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group simple linear regression y = a + b·x via the closed-form
    sufficient statistics (n, Σx, Σy, Σxx, Σxy, Σyy): returns
    (keys..., n, slope, intercept, r2).

    One partial aggregate — the six sums combine map-side, so the
    shuffle carries 6 doubles per group regardless of group size.
    Groups with zero x-variance get NULL slope/intercept/r2 (vertical
    line), matching SQL regr_* semantics. Keep |x| small (bucket
    indices, hours — not raw epoch seconds) so the 6-dp rounding is
    stable across engines."""
    keys = list(keys)
    xc = F.col(x).cast("double")
    yc = F.col(y).cast("double")
    both = xc.isNotNull() & yc.isNotNull()
    agg = df.groupBy(*keys).agg(
        F.count(F.when(both, 1)).alias("n"),
        F.sum(F.when(both, xc)).alias("__sx"),
        F.sum(F.when(both, yc)).alias("__sy"),
        F.sum(F.when(both, xc * xc)).alias("__sxx"),
        F.sum(F.when(both, xc * yc)).alias("__sxy"),
        F.sum(F.when(both, yc * yc)).alias("__syy"),
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    varx_n = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vary_n = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    slope = F.when(varx_n != 0, cov_n / varx_n)
    intercept = (F.col("__sy") - slope * F.col("__sx")) / n
    r2 = F.when(
        (varx_n != 0) & (vary_n != 0), cov_n * cov_n / (varx_n * vary_n)
    )
    return agg.select(
        *keys,
        "n",
        F.round(slope, round_to).alias("slope"),
        F.round(intercept, round_to).alias("intercept"),
        F.round(r2, round_to).alias("r2"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test between two groups — the
    non-parametric A/B comparison: no normality assumption, robust to
    outliers that break the t-test. Returns ONE row:
    (n_a, n_b, u_stat, z_score) where u_stat is U for group A and
    z_score the tie-corrected normal approximation.

    Shape: midranks via one AVG-over-value window (the standard
    tied-rank definition, no dense_rank trickery), tie sizes via a
    value-level aggregate, then everything folds into a 1-row result.
    Two shuffles total (rank exchange + final fold), both on bounded
    data."""
    v = F.col(value_col).cast("double")
    sub = df.filter(
        F.col(group_col).isin([group_a, group_b]) & v.isNotNull()
    ).select(F.col(group_col).alias("__g"), v.alias("__v"))
    # midrank = (#values < v) + (#values <= v) + 1, all halved — use the
    # window-free formulation: rank from a per-value aggregate, which
    # shuffles distinct values instead of rows
    per_val = sub.groupBy("__v").agg(
        F.count(F.lit(1)).alias("__t"),
        F.count(F.when(F.col("__g") == F.lit(group_a), 1)).alias("__ta"),
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_val.withColumn(
        "__below", F.coalesce(F.sum("__t").over(w), F.lit(0))
    ).withColumn(
        "__midrank",
        F.col("__below").cast("double") + (F.col("__t").cast("double") + 1.0) / 2.0,
    )
    stats = ranked.agg(
        F.sum("__ta").cast("double").alias("__na"),
        F.sum(F.col("__t") - F.col("__ta")).cast("double").alias("__nb"),
        F.sum(F.col("__midrank") * F.col("__ta")).alias("__ra"),
        F.sum(
            F.col("__t").cast("double") * F.col("__t") * F.col("__t")
            - F.col("__t")
        ).alias("__ties"),
    )
    na, nb = F.col("__na"), F.col("__nb")
    n = na + nb
    u = F.col("__ra") - na * (na + 1) / 2
    mu = na * nb / 2
    sigma2 = (
        na * nb / 12.0 * ((n + 1) - F.col("__ties") / (n * (n - 1)))
    )
    z = F.when(sigma2 > 0, (u - mu) / F.sqrt(sigma2))
    return stats.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        F.round(u, round_to).alias("u_stat"),
        F.round(z, round_to).alias("z_score"),
    )
