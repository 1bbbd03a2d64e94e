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
from pyspark.sql import types as T


def _contains_map(dt: T.DataType) -> bool:
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _content_salt(
    df: DataFrame, salt_buckets: int, salt_cols: Sequence[str] | None
) -> Column:
    """Retry-stable content-derived salt (see salted_agg's rationale).
    Spark's hash functions reject MapType anywhere in the hashed value,
    so by default only map-free columns feed the hash; pass
    ``salt_cols`` explicitly to salt on a chosen high-entropy subset
    (also the fix when a key is hot because of byte-identical duplicate
    rows — include a distinguishing column, or accept that duplicates
    share a bucket)."""
    if salt_cols is not None:
        cols = list(salt_cols)
    else:
        cols = [
            f.name for f in df.schema.fields if not _contains_map(f.dataType)
        ]
    if not cols:
        raise ValueError(
            "no hashable (map-free) columns to derive a retry-stable salt "
            "from; pass salt_cols explicitly"
        )
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_buckets))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
    salt_cols: Sequence[str] | None = None,
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
    # SPARK-23207 class). Hashing the map-free columns is retry-stable;
    # rows with identical content in those columns share a salt — pass
    # salt_cols if that matters (see _content_salt).
    salt = _content_salt(df, salt_buckets, salt_cols).alias("__salt")
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
    salt_cols: Sequence[str] | None = None,
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
    b = big.withColumn("__salt", _content_salt(big, salt_buckets, salt_cols))
    s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt_buckets).select(
                F.col("id").alias("__salt")
            )
        )
    )
    out = b.join(s, on=[on, "__salt"], how=how)
    return out.drop("__salt")
