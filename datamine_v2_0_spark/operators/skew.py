"""Skew-handling operators: salting for hot keys (SURVEY.md §7 step 9
"salting hooks"; §4 "for 100 TB add salting option on device_date").

AQE's skew-join splitting handles most runtime skew automatically
(session.py enables it); these explicit forms cover the cases AQE can't:
aggregation skew (one device_date ≫ others) and broadcast-infeasible
joins against a skewed fact side.

Both are semantics-preserving: results are identical to the unsalted
plan — which is exactly what their oracle checks assert.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a salted key: phase 1 groups by
    (keys, salt) — splitting each hot key across `salt_buckets` reducers —
    phase 2 merges partials by the real keys.

    `aggs` maps output name → (partial_expr, merge_expr_over_partial),
    e.g. ``{"n": (F.count(F.lit(1)), F.sum("n")), "s": (F.sum("x"),
    F.sum("s"))}``. Only algebraic aggregates (sum/count/min/max/avg via
    sum+count) decompose this way."""
    # the salt must vary WITHIN a key (that's what splits a hot key) and
    # must be a pure function of row CONTENT: monotonically_increasing_id
    # depends on row order within a partition, so a stage retry after a
    # fetch failure re-salts rows differently than the lost attempt and
    # reducers mixing both attempts double-count/drop rows (the
    # SPARK-23207 class). Hashing all columns is retry-stable; rows with
    # fully identical content share a salt, which only matters if a hot
    # key is hot BECAUSE of byte-identical duplicate rows.
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)).alias(
        "__salt"
    )
    partial = df.groupBy(*keys, salt).agg(
        *[expr.alias(name) for name, (expr, _merge) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_expr, merge) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi join without broadcast: salt the big side with a random
    bucket, replicate the small side across all buckets, join on
    (key, salt). Each hot key's rows spread over `salt_buckets` tasks.

    Use when the small side is too big to broadcast but small enough to
    replicate `salt_buckets`×; otherwise rely on AQE skew-join.

    Only join types that never emit small-side rows are correct under
    replication (inner/left/semi/anti — a big row has exactly one salt,
    so its match semantics are unchanged); with right/full, each
    unmatched small-side row would surface once per salt bucket."""
    if how.lower().replace("_", "") not in (
        "inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"
    ):
        raise ValueError(
            "salted_join replicates the small side across salt buckets; "
            "only inner/left/semi/anti join types are well-defined "
            f"(got {how!r})"
        )
    # content-derived salt, not monotonically_increasing_id — see
    # salted_agg: order-dependent salts break under stage retry
    b = big.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in big.columns]),
            F.lit(salt_buckets),
        ),
    )
    s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt_buckets).select(
                F.col("id").alias("__salt")
            )
        )
    )
    out = b.join(s, on=[on, "__salt"], how=how)
    return out.drop("__salt")
