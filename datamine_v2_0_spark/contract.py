"""Driver-contract queries: one entry per implemented operator
(SURVEY.md §2), each paired with a DuckDB oracle SQL string.

Conventions (cross-engine determinism):
- every computed column is aliased identically in Spark and SQL;
- integer outputs are BIGINT both sides (Spark casts, DuckDB casts
  HUGEINT sums);
- float aggregates are rounded (4-6 dp) on BOTH sides;
- timestamps/dates in outputs are rendered as strings;
- all window/rank orderings carry a unique tiebreak column;
- time deltas use exact integer microseconds / 1e6, never epoch-double
  subtraction.

Queries whose Spark implementation is not SQL-expressible (xxhash64-based
LSH, SimHash, PELT, Savitzky-Golay) have oracle=None → the driver records
a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datamine_v2_0_spark.functions.scalars import (
    bool_from_text,
    clamp,
    device_date,
    json_string_literal,
    null_if_outside,
    parse_position,
    pg_timestamptz_text,
    raw_event_hash_id,
    validate_json,
)
from datamine_v2_0_spark.operators import aggregates as agg
from datamine_v2_0_spark.operators import bpe
from datamine_v2_0_spark.operators import dedup as dd
from datamine_v2_0_spark.operators import filters as flt
from datamine_v2_0_spark.operators import joins as jn
from datamine_v2_0_spark.operators import sets as st
from datamine_v2_0_spark.operators import similarity as sim
from datamine_v2_0_spark.operators import smoothing as sm
from datamine_v2_0_spark.operators import text as tx
from datamine_v2_0_spark.operators import windows as win
from datamine_v2_0_spark.operators.joins import resolve_priority
from datamine_v2_0_spark.pipeline import cpd
from datamine_v2_0_spark.pipeline.curation import curate_corpus
from datamine_v2_0_spark.pipeline.features import build_features
from datamine_v2_0_spark.pipeline.silver import silver_transform


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table; normalize the events timestamp if needed.

    Some driver generations store ``events.ts`` as parquet
    TIMESTAMP(NANOS), which Spark's vectorized reader rejects. Read it as
    a long (legacy conf) and truncate to microseconds with integer
    division (a double division would lose precision above 2^53 ns).
    Newer generations store plain TIMESTAMP(MICROS) — pass through.
    """
    # the driver supplies its own SparkSession; epoch-bucketing queries
    # (gapfill/hopping/cohort/range-bin) and NTZ->TIMESTAMP casts are only
    # oracle-parity-correct under UTC, so pin it here rather than trusting
    # the harness session's default
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type in ("bigint", "long"):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # session tz is pinned to UTC, so NTZ -> TIMESTAMP is lossless
            # and matches DuckDB's naive read of the same parquet
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events_window():
    return win.ordered_window(["user_id"], ["ts", "event_id"])


# DuckDB rendering of pg_timestamptz_text (same trim rules)
_PG_TS_SQL = (
    r"regexp_replace(regexp_replace(strftime({c}, '%Y-%m-%d %H:%M:%S.%f'),"
    r" '(\.\d*?)0+$', '\1'), '\.$', '') || '+00'"
)

# ---------------------------------------------------------------- aggregates

def q_agg_global_stats(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    return agg.global_stats(df, "l_extendedprice", "l_orderkey")


SQL_AGG_GLOBAL_STATS = """
SELECT COUNT(*) AS row_count, MIN(l_extendedprice) AS min_val,
       MAX(l_extendedprice) AS max_val,
       COUNT(DISTINCT l_orderkey) AS distinct_count
FROM lineitem
"""


def q_agg_grouped_stats(spark, sf_dir):
    return agg.grouped_stats(
        _t(spark, sf_dir, "lineitem"), ["l_returnflag"], "l_quantity"
    )


SQL_AGG_GROUPED_STATS = """
SELECT l_returnflag, COUNT(*) AS n,
       ROUND(AVG(l_quantity), 4) AS avg_val,
       ROUND(STDDEV(l_quantity), 4) AS stddev_val,
       MIN(l_quantity) AS min_val, MAX(l_quantity) AS max_val
FROM lineitem GROUP BY l_returnflag
"""


def q_agg_conditional(spark, sf_dir):
    df = _t(spark, sf_dir, "orders")
    return agg.conditional_counts(
        df,
        ["o_orderpriority"],
        {
            "n_open": F.col("o_orderstatus") == "O",
            "n_high_value": F.col("o_totalprice") > 150000.0,
        },
    )


SQL_AGG_CONDITIONAL = """
SELECT o_orderpriority, COUNT(*) AS n,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_totalprice > 150000.0) AS n_high_value
FROM orders GROUP BY o_orderpriority
"""


def q_agg_percentiles(spark, sf_dir):
    out = agg.exact_percentiles_sorted(
        _t(spark, sf_dir, "lineitem"), ["l_returnflag"], "l_extendedprice"
    )
    cols = [F.col("l_returnflag")] + [
        F.round(F.col(c), 4).alias(c) for c in ("p25", "p50", "p75", "p95")
    ]
    return out.select(*cols)


SQL_AGG_PERCENTILES = """
SELECT l_returnflag,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 4) AS p25,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.50), 4) AS p50,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 4) AS p75,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.95), 4) AS p95
FROM lineitem GROUP BY l_returnflag
"""


def q_agg_date_distribution(spark, sf_dir):
    out = agg.date_distribution(_t(spark, sf_dir, "orders"), "o_orderdate")
    return out.select(F.col("day").cast("string").alias("day"), "n")


SQL_AGG_DATE_DISTRIBUTION = """
SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day, COUNT(*) AS n
FROM orders GROUP BY 1
"""


def q_agg_freq_topk(spark, sf_dir):
    return agg.frequency_topk(
        _t(spark, sf_dir, "lineitem"), ["l_returnflag", "l_linestatus"], 20
    )


SQL_AGG_FREQ_TOPK = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem GROUP BY 1, 2
ORDER BY n DESC, l_returnflag, l_linestatus LIMIT 20
"""


def q_agg_hourly_profile(spark, sf_dir):
    out = agg.hourly_profile(_t(spark, sf_dir, "events"), "ts")
    return out.select(F.col("day").cast("string").alias("day"), "hour", "dow", "n")


SQL_AGG_HOURLY_PROFILE = """
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       CAST(hour(ts) AS INT) AS hour,
       CAST(dayofweek(ts) + 1 AS INT) AS dow,
       COUNT(*) AS n
FROM events GROUP BY 1, 2, 3
"""


def q_agg_having(spark, sf_dir):
    return agg.having(_t(spark, sf_dir, "events"), ["user_id"], 10)


SQL_AGG_HAVING = """
SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id HAVING COUNT(*) >= 10
"""


def q_agg_mad(spark, sf_dir):
    """Robust per-group dispersion: median + median-absolute-deviation
    of order totals per priority (outlier-resistant spread)."""
    o = _t(spark, sf_dir, "orders")
    return agg.grouped_mad(o, ["o_orderpriority"], "o_totalprice")


SQL_AGG_MAD = """
WITH med AS (
  SELECT o_orderpriority,
         median(o_totalprice) AS m, COUNT(*) AS n
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority, ANY_VALUE(med.n) AS n,
       ROUND(ANY_VALUE(med.m), 6) AS median,
       ROUND(median(ABS(o.o_totalprice - med.m)), 6) AS mad
FROM orders o JOIN med USING (o_orderpriority)
GROUP BY o.o_orderpriority
"""


def q_agg_hopping(spark, sf_dir):
    """Hopping-window rollup: 1-hour windows sliding every 15 minutes
    (each event lands in 4 windows)."""
    out = agg.hopping_agg(
        _t(spark, sf_dir, "events"),
        "ts",
        "1 hour",
        "15 minutes",
        [
            (F.floor(F.avg("value") * 1e6 + F.lit(0.5)) / 1e6).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        ],
    )
    return out.select(
        F.col("window_start").cast("string").alias("window_start"),
        "avg_value",
        "n",
    )


SQL_AGG_HOPPING = """
WITH e AS (
  SELECT value, epoch(ts) AS sec FROM events
), x AS (
  SELECT e.value,
         make_timestamp(CAST((floor(sec / 900) - t.j) * 900 * 1000000 AS BIGINT))
           AS window_start
  FROM e, LATERAL unnest(generate_series(0, 3)) AS t(j)
  WHERE (floor(sec / 900) - t.j) * 900 > sec - 3600
)
SELECT CAST(window_start AS VARCHAR) AS window_start,
       floor(AVG(value) * 1e6 + 0.5) / 1e6 AS avg_value,
       COUNT(*) AS n
FROM x GROUP BY 1
"""


def q_agg_tumbling(spark, sf_dir):
    out = agg.tumbling_agg(
        _t(spark, sf_dir, "events"),
        "ts",
        "5 minutes",
        [
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        ],
    )
    return out.select(
        F.col("bucket_start").cast("string").alias("bucket_start"), "avg_value", "n"
    )


SQL_AGG_TUMBLING = """
SELECT CAST(time_bucket(INTERVAL '5 minutes', ts) AS VARCHAR) AS bucket_start,
       ROUND(AVG(value), 6) AS avg_value, COUNT(*) AS n
FROM events GROUP BY 1
"""


def q_agg_ordered_array(spark, sf_dir):
    out = agg.ordered_array_agg(
        _t(spark, sf_dir, "events"), ["user_id"], "ts", "event_type"
    )
    return out.select("user_id", F.array_join("vals", ",").alias("type_seq"))


SQL_AGG_ORDERED_ARRAY = """
SELECT user_id,
       STRING_AGG(event_type, ',' ORDER BY ts, event_type) AS type_seq
FROM events GROUP BY user_id
"""


def q_agg_distinct(spark, sf_dir):
    return agg.distinct_sorted(_t(spark, sf_dir, "events"), "event_type")


SQL_AGG_DISTINCT = "SELECT DISTINCT event_type FROM events ORDER BY 1"


def q_agg_integrity(spark, sf_dir):
    return agg.integrity_report(
        _t(spark, sf_dir, "events"), "event_id", ["user_id", "value"]
    )


SQL_AGG_INTEGRITY = """
SELECT COUNT(*) AS row_count, COUNT(DISTINCT event_id) AS distinct_keys,
       COUNT(*) FILTER (WHERE user_id IS NULL) AS null_user_id,
       COUNT(*) FILTER (WHERE value IS NULL) AS null_value
FROM events
"""


def q_agg_fraction(spark, sf_dir):
    return jn.fraction_of_total(_t(spark, sf_dir, "orders"), ["o_orderstatus"])


SQL_AGG_FRACTION = """
SELECT o_orderstatus, COUNT(*) AS n,
       ROUND(COUNT(*) * 100.0 / (SELECT COUNT(*) FROM orders), 4) AS pct
FROM orders GROUP BY o_orderstatus
"""


def q_agg_pivot(spark, sf_dir):
    df = _t(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    types = ["click", "error", "purchase", "signup", "view"]
    out = agg.crosstab_pivot(df, "day", "event_type", types)
    return out.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types]
    )


SQL_AGG_PIVOT = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events GROUP BY 1
"""


# ------------------------------------------------------------------ windows

def q_win_lag_delta(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    w = _events_window()
    micros = F.unix_micros(F.col("ts"))
    delta = (micros - F.lag(micros, 1).over(w)).cast("double") / F.lit(1_000_000.0)
    return df.select(
        "event_id",
        "user_id",
        win.lag_col("value", w).alias("prev_value"),
        delta.alias("delta_s"),
    )


SQL_WIN_LAG_DELTA = """
SELECT event_id, user_id,
       LAG(value) OVER w AS prev_value,
       CAST(date_diff('microsecond', LAG(ts) OVER w, ts) AS DOUBLE)
           / 1000000.0 AS delta_s
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_win_rolling(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    w = _events_window()
    return df.select(
        "event_id",
        F.round(win.rolling_mean("value", w, 2, 2), 6).alias("rmean5"),
        F.round(win.rolling_stddev("value", w, 4, 0), 6).alias("rstd5_trail"),
    )


SQL_WIN_ROLLING = """
SELECT event_id,
       ROUND(AVG(value) OVER (w ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6)
           AS rmean5,
       ROUND(STDDEV(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
           AS rstd5_trail
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_win_blocks(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    w = _events_window()
    # explicit BIGINT on both sides: DuckDB's windowed SUM(int) yields
    # HUGEINT, whose driver-side rendering diverged from Spark's long in r2
    with_block = df.withColumn(
        "block_id", win.block_id("event_type", w).cast("long")
    )
    w2 = win.ordered_window(["user_id", "block_id"], ["ts", "event_id"])
    return with_block.select(
        "event_id",
        "block_id",
        win.persistence_counter(w2).alias("run_pos"),
    )


SQL_WIN_BLOCKS = """
WITH flagged AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN LAG(event_type) OVER w IS NULL
               OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), blocks AS (
  SELECT event_id, user_id, ts,
         CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS block_id
  FROM flagged
)
SELECT event_id, block_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id, block_id
                               ORDER BY ts, event_id) AS INT) AS run_pos
FROM blocks
"""


def q_win_partition_stddev(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    sd = F.round(win.partition_agg(F.stddev("value"), ["user_id"]), 4)
    return (
        df.select("user_id", sd.alias("sd"))
        .withColumn("has_high_var", F.col("sd") > 140.0)
        .distinct()
    )


SQL_WIN_PARTITION_STDDEV = """
SELECT user_id, ROUND(STDDEV(value), 4) AS sd,
       ROUND(STDDEV(value), 4) > 140.0 AS has_high_var
FROM events GROUP BY user_id
"""


def q_win_running_sum(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    w = _events_window()
    return df.select(
        "event_id", F.round(win.running_sum("value", w), 6).alias("rsum")
    )


SQL_WIN_RUNNING_SUM = """
SELECT event_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             6) AS rsum
FROM events
"""


def q_win_diff_shift(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    w = _events_window()
    return df.select(
        "event_id",
        win.diff("value", w, 10).alias("diff10"),
        F.lag("event_type", 2).over(w).alias("shift2"),
        win.lag_default_current(F.col("value"), w).alias("lag_or_current"),
    )


SQL_WIN_DIFF_SHIFT = """
SELECT event_id,
       value - LAG(value, 10) OVER w AS diff10,
       LAG(event_type, 2) OVER w AS shift2,
       COALESCE(LAG(value, 1) OVER w, value) AS lag_or_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_win_ffill(spark, sf_dir):
    df = _t(spark, sf_dir, "events").withColumn(
        "v_sparse",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value")),
    )
    w = _events_window()
    return df.select(
        "event_id", F.round(win.ffill("v_sparse", w), 6).alias("v_filled")
    )


SQL_WIN_FFILL = """
SELECT event_id,
       ROUND(LAST_VALUE(CASE WHEN event_type = 'error' THEN NULL ELSE value END
                        IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             6) AS v_filled
FROM events
"""


# -------------------------------------------------------------------- joins

def q_join_equi_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    joined = jn.equi_join(
        jn.equi_join(li, o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"),
        c.withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey",
        broadcast_right=True,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_JOIN_EQUI_REVENUE = """
SELECT c_mktsegment,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_join_anti(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    return jn.anti_join(c, o, "c_custkey").select("c_custkey", "c_name")


SQL_JOIN_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_join_semi(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .withColumnRenamed("o_custkey", "c_custkey")
    )
    return jn.semi_join(c, o, "c_custkey").groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )


SQL_JOIN_SEMI = """
SELECT c_mktsegment, COUNT(*) AS n FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
GROUP BY c_mktsegment
"""


def q_join_range_bin(spark, sf_dir):
    """Key-free big-big range join via time-axis binning: 104 synthetic
    30-minute maintenance windows (every 7 h over Jan 2024) vs the event
    stream — no broadcast, no nested loop; the bin explode turns the
    range predicate into an equi shuffle join."""
    ev = _t(spark, sf_dir, "events")
    base = 1704067200  # 2024-01-01 00:00:00 UTC
    iv = spark.range(0, 104).select(
        F.col("id").alias("window_id"),
        F.timestamp_seconds(F.lit(base) + F.col("id") * 25200).alias("w_start"),
        F.timestamp_seconds(F.lit(base) + F.col("id") * 25200 + 1800).alias("w_end"),
    )
    joined = jn.range_bin_join(ev, iv, "ts", "w_start", "w_end", 3600)
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n"),
        (F.floor(F.avg("value") * 1e6 + F.lit(0.5)) / 1e6).alias("avg_value"),
    )


SQL_JOIN_RANGE_BIN = """
WITH iv AS (
  SELECT i AS window_id,
         make_timestamp(CAST((1704067200 + i*25200) AS BIGINT) * 1000000)
           AS w_start,
         make_timestamp(CAST((1704067200 + i*25200 + 1800) AS BIGINT) * 1000000)
           AS w_end
  FROM generate_series(0, 103) AS t(i)
)
SELECT iv.window_id, COUNT(*) AS n,
       floor(AVG(e.value) * 1e6 + 0.5) / 1e6 AS avg_value
FROM events e JOIN iv ON e.ts BETWEEN iv.w_start AND iv.w_end
GROUP BY 1
"""


def q_join_interval(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    iv = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_orderpriority"),
        F.col("o_orderdate").alias("iv_start"),
        F.expr("o_orderdate + INTERVAL 7 DAYS").alias("iv_end"),
    )
    joined = jn.interval_contain_join(
        li,
        iv,
        [("l_orderkey", "o_orderkey")],
        "l_shipdate",
        "iv_start",
        "iv_end",
        how="inner",
    )
    return joined.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


SQL_JOIN_INTERVAL = """
SELECT o_orderpriority, COUNT(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 7 DAY
GROUP BY o_orderpriority
"""


def q_join_asof(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    )
    matched = jn.asof_nearest_join(
        errors,
        purchases,
        [("user_id", "p_user_id")],
        "ts",
        "p_ts",
        3600.0,
        "event_id",
    )
    delta = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("p_ts"))
    ).cast("double") / F.lit(1_000_000.0)
    return matched.select("event_id", "p_event_id", delta.alias("delta_s"))


SQL_JOIN_ASOF = """
WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
     p AS (SELECT event_id AS p_event_id, user_id, ts AS p_ts
           FROM events WHERE event_type = 'purchase'),
     j AS (
       SELECT e.event_id, p.p_event_id, e.ts, p.p_ts,
              ABS(CAST(date_diff('microsecond', p.p_ts, e.ts) AS DOUBLE))
                  / 1000000.0 AS absd
       FROM e JOIN p ON e.user_id = p.user_id
       WHERE ABS(CAST(date_diff('microsecond', p.p_ts, e.ts) AS DOUBLE))
             / 1000000.0 <= 3600.0
     )
SELECT event_id, p_event_id,
       CAST(date_diff('microsecond', p_ts, ts) AS DOUBLE) / 1000000.0 AS delta_s
FROM j
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY absd, p_ts) = 1
"""


def q_join_asof_backward(spark, sf_dir):
    """pandas merge_asof(direction='backward') semantics: latest purchase
    at-or-before each error, within tolerance."""
    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    )
    matched = jn.asof_nearest_join(
        errors,
        purchases,
        [("user_id", "p_user_id")],
        "ts",
        "p_ts",
        3600.0,
        "event_id",
        direction="backward",
    )
    delta = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("p_ts"))
    ).cast("double") / F.lit(1_000_000.0)
    return matched.select("event_id", "p_event_id", delta.alias("delta_s"))


SQL_JOIN_ASOF_BACKWARD = """
WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
     p AS (SELECT event_id AS p_event_id, user_id, ts AS p_ts
           FROM events WHERE event_type = 'purchase'),
     j AS (
       SELECT e.event_id, p.p_event_id, e.ts, p.p_ts,
              CAST(date_diff('microsecond', p.p_ts, e.ts) AS DOUBLE)
                  / 1000000.0 AS d
       FROM e JOIN p ON e.user_id = p.user_id
       WHERE CAST(date_diff('microsecond', p.p_ts, e.ts) AS DOUBLE)
             / 1000000.0 BETWEEN 0.0 AND 3600.0
     )
SELECT event_id, p_event_id, d AS delta_s
FROM j
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY d, p_ts) = 1
"""


def q_join_asof_merge(spark, sf_dir):
    """Big-big as-of via union-merge (one shuffle, zero join operators):
    same backward at-or-before semantics as join_asof_backward but ALL
    left rows survive (NULLs outside tolerance); oracle = DuckDB's
    native ASOF LEFT JOIN with a tolerance gate."""
    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("p_ts"),
    )
    m = jn.asof_merge_join(
        errors, purchases, ["user_id"], "ts", "p_ts",
        ["p_event_id", "p_ts"], tolerance_seconds=3600.0,
    )
    return m.select(
        "event_id",
        F.col("asof_p_event_id").alias("p_event_id"),
        (
            (F.unix_micros("ts") - F.unix_micros("asof_p_ts")).cast("double")
            / 1e6
        ).alias("delta_s"),
    )


SQL_JOIN_ASOF_MERGE = """
WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
     p AS (SELECT user_id, event_id AS p_event_id, ts AS p_ts
           FROM events WHERE event_type = 'purchase'),
     j AS (
       SELECT e.event_id, p.p_event_id,
              CAST(date_diff('microsecond', p.p_ts, e.ts) AS DOUBLE)
                  / 1000000.0 AS d
       FROM e ASOF LEFT JOIN p
         ON e.user_id = p.user_id AND e.ts >= p.p_ts
     )
SELECT event_id,
       CASE WHEN d <= 3600.0 THEN p_event_id END AS p_event_id,
       CASE WHEN d <= 3600.0 THEN d END AS delta_s
FROM j
"""


def q_join_overlap(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.select(
        F.col("o_custkey").alias("a_cust"),
        F.col("o_orderkey").alias("a_key"),
        F.col("o_orderdate").alias("a_start"),
        F.expr("o_orderdate + INTERVAL 7 DAYS").alias("a_end"),
    )
    b = o.select(
        F.col("o_custkey").alias("b_cust"),
        F.col("o_orderkey").alias("b_key"),
        F.col("o_orderdate").alias("b_start"),
        F.expr("o_orderdate + INTERVAL 7 DAYS").alias("b_end"),
    )
    pairs = jn.overlap_join(
        a, b, [("a_cust", "b_cust")], "a_start", "a_end", "b_start", "b_end"
    ).filter(F.col("a_key") < F.col("b_key"))
    return pairs.groupBy(F.col("a_cust").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_overlaps")
    )


SQL_JOIN_OVERLAP = """
SELECT a.o_custkey AS custkey, COUNT(*) AS n_overlaps
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
 AND a.o_orderdate < b.o_orderdate + INTERVAL 7 DAY
 AND b.o_orderdate < a.o_orderdate + INTERVAL 7 DAY
GROUP BY 1
"""


def q_join_upsert(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    current = ev.filter(F.col("event_id") % 2 == 0)
    updates = ev.filter(F.col("event_id") % 2 == 1)
    latest = jn.upsert(
        current,
        updates,
        ["user_id", "event_type"],
        F.struct(F.col("ts"), F.col("event_id")),
    )
    return latest.select("user_id", "event_type", "event_id")


SQL_JOIN_UPSERT = """
SELECT user_id, event_type, event_id FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1
"""


EVENT_CATEGORY = {
    "click": "interaction",
    "view": "interaction",
    "purchase": "transaction",
    "signup": "account",
    "error": "fault",
}


def q_join_lookup(spark, sf_dir):
    out = jn.lookup_join(
        _t(spark, sf_dir, "events"), EVENT_CATEGORY, "event_type", "category"
    )
    return out.groupBy("category").agg(F.count(F.lit(1)).alias("n"))


SQL_JOIN_LOOKUP = """
SELECT CASE LOWER(TRIM(COALESCE(event_type, 'unknown')))
         WHEN 'click' THEN 'interaction'
         WHEN 'view' THEN 'interaction'
         WHEN 'purchase' THEN 'transaction'
         WHEN 'signup' THEN 'account'
         WHEN 'error' THEN 'fault'
         ELSE 'unknown' END AS category,
       COUNT(*) AS n
FROM events GROUP BY 1
"""


# ------------------------------------------------------------------ filters

def q_filt_project_range(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    df = flt.time_range(df, "ts", "2024-01-05 00:00:00", "2024-01-20 00:00:00")
    df = flt.like_filter(df, "event_type", "%i%")
    return flt.project(df, ["event_id", "event_type", "value"])


SQL_FILT_PROJECT_RANGE = """
SELECT event_id, event_type, value FROM events
WHERE ts IS NOT NULL
  AND ts >= TIMESTAMP '2024-01-05 00:00:00'
  AND ts <= TIMESTAMP '2024-01-20 00:00:00'
  AND event_type LIKE '%i%'
"""


def q_filt_clamp(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    return df.agg(
        F.round(F.avg(clamp(F.col("l_quantity"), 5.0, 45.0)), 6).alias("avg_clamped"),
        F.count(null_if_outside(F.col("l_discount"), 0.02, 0.08)).alias(
            "n_mid_discount"
        ),
    )


SQL_FILT_CLAMP = """
SELECT ROUND(AVG(LEAST(GREATEST(l_quantity, 5.0), 45.0)), 6) AS avg_clamped,
       COUNT(CASE WHEN l_discount BETWEEN 0.02 AND 0.08 THEN 1 END)
           AS n_mid_discount
FROM lineitem
"""


def q_filt_sample_mod(spark, sf_dir):
    df = flt.deterministic_sample(_t(spark, sf_dir, "lineitem"), "l_orderkey", 97)
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
    )


SQL_FILT_SAMPLE_MOD = """
SELECT COUNT(*) AS n, ROUND(SUM(l_quantity), 6) AS sum_qty
FROM lineitem WHERE l_orderkey % 97 = 0
"""


def q_filt_between_isin(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    df = flt.between(df, "l_quantity", 10.0, 20.0)
    df = flt.isin_filter(df, "l_returnflag", ["A", "R"])
    df = flt.date_eq(
        df.withColumn("ship_day", F.to_date("l_shipdate")), "l_shipdate", "1996-03-13"
    )
    return df.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))


SQL_FILT_BETWEEN_ISIN = """
SELECT l_returnflag, COUNT(*) AS n FROM lineitem
WHERE l_quantity BETWEEN 10.0 AND 20.0
  AND l_returnflag IN ('A', 'R')
  AND CAST(l_shipdate AS DATE) = DATE '1996-03-13'
GROUP BY 1
"""


# --------------------------------------------------------------- sorts/sets

def q_sort_topk(spark, sf_dir):
    return st.topk(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        20,
    )


SQL_SORT_TOPK = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


def q_set_union(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    open_n = o.filter(F.col("o_orderstatus") == "O").agg(
        F.lit("open").alias("bucket"), F.count(F.lit(1)).alias("n")
    )
    done_n = o.filter(F.col("o_orderstatus") == "F").agg(
        F.lit("done").alias("bucket"), F.count(F.lit(1)).alias("n")
    )
    return st.union_all([open_n, done_n])


SQL_SET_UNION = """
SELECT 'open' AS bucket, COUNT(*) AS n FROM orders WHERE o_orderstatus = 'O'
UNION ALL
SELECT 'done' AS bucket, COUNT(*) AS n FROM orders WHERE o_orderstatus = 'F'
"""


def q_set_intersect(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    erring = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    return st.intersect(buyers, erring)


SQL_SET_INTERSECT = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
"""


def q_set_except(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    all_users = ev.select("user_id").distinct()
    erring = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    return st.except_all(all_users, erring)


SQL_SET_EXCEPT = """
SELECT DISTINCT user_id FROM events
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
"""


# ------------------------------------------------------------------ scalars

def q_scalar_hash_id(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    dev = F.concat(F.lit("u"), F.col("user_id").cast("string"))
    return df.select(
        "event_id",
        raw_event_hash_id(dev, F.col("ts")).alias("hash_id"),
        pg_timestamptz_text(F.col("ts")).alias("ts_text"),
    )


SQL_SCALAR_HASH_ID = f"""
SELECT event_id,
       sha256('u' || CAST(user_id AS VARCHAR) || '|' ||
              {_PG_TS_SQL.format(c='ts')}) AS hash_id,
       {_PG_TS_SQL.format(c='ts')} AS ts_text
FROM events
"""


def q_scalar_silver(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    dev = F.concat(F.lit("u"), F.col("user_id").cast("string"))
    flag_text = F.when(F.col("value") > 50.0, F.lit("t")).otherwise(F.lit("f"))
    return df.select(
        "event_id",
        device_date(dev, F.col("ts")).alias("device_date"),
        validate_json(F.col("props")).alias("extras"),
        bool_from_text(flag_text).alias("engaged"),
        json_string_literal(F.col("event_type")).alias("type_json"),
    )


SQL_SCALAR_SILVER = """
SELECT event_id,
       'u' || CAST(user_id AS VARCHAR) || '_' || strftime(ts, '%Y-%m-%d')
           AS device_date,
       props AS extras,
       value > 50.0 AS engaged,
       CAST(to_json(event_type) AS VARCHAR) AS type_json
FROM events
"""


def q_scalar_position(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    lat_v = F.col("value") % F.lit(80.0)
    lon_v = F.col("value") % F.lit(170.0)
    pos_text = F.concat(
        F.lit("{"),
        lat_v.cast("string"),
        F.lit(","),
        lon_v.cast("string"),
        F.lit(",100.0}"),
    )
    pos = parse_position(pos_text)
    return df.select(
        "event_id",
        pos["latitude"].alias("lat"),
        pos["longitude"].alias("lon"),
        pos["altitude"].alias("alt"),
    )


SQL_SCALAR_POSITION = """
SELECT event_id,
       value % 80.0 AS lat,
       value % 170.0 AS lon,
       CAST(100.0 AS DOUBLE) AS alt
FROM events
"""


# --------------------------------------------------------------- text / LLM

def q_text_tokens(spark, sf_dir):
    df = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return df.select(
        "doc_id",
        F.length(c).cast("long").alias("n_chars"),
        tx.token_count_ws(c).cast("long").alias("n_tokens_ws"),
        tx.token_count_bpe(c).cast("long").alias("n_tokens_bpe"),
        F.round(tx.punct_ratio(c), 6).alias("punct_ratio"),
        F.round(tx.stopword_ratio(c), 6).alias("stopword_ratio_en"),
        tx.quality_score(c).alias("quality"),
    )


_SW_EN = r"\b(the|and|of|to|is|in|that|it|for|with)\b"

SQL_TEXT_TOKENS = f"""
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS n_chars,
       CAST(CASE WHEN text IS NULL OR TRIM(text) = '' THEN 0
            ELSE LEN(regexp_split_to_array(TRIM(text), '\\s+')) END AS BIGINT)
           AS n_tokens_ws,
       CAST(LEN(regexp_extract_all(text, '[A-Za-z]+'))
          + LEN(regexp_extract_all(text, '\\d+'))
          + LEN(regexp_extract_all(text, '[^\\sA-Za-z0-9]')) AS BIGINT)
           AS n_tokens_bpe,
       ROUND(CASE WHEN LENGTH(text) > 0
             THEN LEN(regexp_extract_all(text, '[^\\sA-Za-z0-9]'))
                  / CAST(LENGTH(text) AS DOUBLE) ELSE 0.0 END, 6) AS punct_ratio,
       ROUND(CASE WHEN (CASE WHEN text IS NULL OR TRIM(text) = '' THEN 0
                  ELSE LEN(regexp_split_to_array(TRIM(text), '\\s+')) END) > 0
             THEN LEN(regexp_extract_all(LOWER(text), '{_SW_EN}'))
                  / CAST(CASE WHEN text IS NULL OR TRIM(text) = '' THEN 0
                     ELSE LEN(regexp_split_to_array(TRIM(text), '\\s+')) END
                     AS DOUBLE)
             ELSE 0.0 END, 6) AS stopword_ratio_en,
       ROUND((
         LEAST(CAST(LENGTH(text) AS DOUBLE) / 500.0, 1.0)
       + LEAST((CASE WHEN (CASE WHEN text IS NULL OR TRIM(text) = '' THEN 0
                  ELSE LEN(regexp_split_to_array(TRIM(text), '\\s+')) END) > 0
             THEN LEN(regexp_extract_all(LOWER(text), '{_SW_EN}'))
                  / CAST(CASE WHEN text IS NULL OR TRIM(text) = '' THEN 0
                     ELSE LEN(regexp_split_to_array(TRIM(text), '\\s+')) END
                     AS DOUBLE)
             ELSE 0.0 END) * 4.0, 1.0)
       + GREATEST(0.0, 1.0 - (CASE WHEN LENGTH(text) > 0
             THEN LEN(regexp_extract_all(text, '[^\\sA-Za-z0-9]'))
                  / CAST(LENGTH(text) AS DOUBLE) ELSE 0.0 END) * 4.0)
       ) / 3.0, 6) AS quality
FROM documents
"""

_PROFILES_SQL = {
    "en": _SW_EN,
    "de": r"\b(der|die|und|das|ist|nicht|ein|mit|für|von)\b",
    "fr": r"\b(le|la|les|et|est|une|pour|dans|que|pas)\b",
    "es": r"\b(el|la|los|que|es|una|por|con|para|del)\b",
}


def q_text_lang(spark, sf_dir):
    df = _t(spark, sf_dir, "documents")
    return df.select("doc_id", tx.lang_id(F.col("text")).alias("lang_pred"))


SQL_TEXT_LANG = f"""
WITH s AS (
  SELECT doc_id,
         LEN(regexp_extract_all(LOWER(text), '{_PROFILES_SQL["en"]}')) AS s_en,
         LEN(regexp_extract_all(LOWER(text), '{_PROFILES_SQL["de"]}')) AS s_de,
         LEN(regexp_extract_all(LOWER(text), '{_PROFILES_SQL["fr"]}')) AS s_fr,
         LEN(regexp_extract_all(LOWER(text), '{_PROFILES_SQL["es"]}')) AS s_es
  FROM documents
)
SELECT doc_id,
       CASE WHEN GREATEST(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
            WHEN s_fr = GREATEST(s_en, s_de, s_fr, s_es) THEN 'fr'
            WHEN s_es = GREATEST(s_en, s_de, s_fr, s_es) THEN 'es'
            WHEN s_en = GREATEST(s_en, s_de, s_fr, s_es) THEN 'en'
            ELSE 'de' END AS lang_pred
FROM s
"""


def q_text_fingerprint(spark, sf_dir):
    df = _t(spark, sf_dir, "documents")
    return df.select("doc_id", tx.fingerprint(F.col("text")).alias("fingerprint"))


SQL_TEXT_FINGERPRINT = r"""
SELECT doc_id,
       sha256(array_to_string(list_sort(list_distinct(
           string_split(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g')), ' ')
       )), ' ')) AS fingerprint
FROM documents
"""


def q_dedup_exact(spark, sf_dir):
    df = _t(spark, sf_dir, "documents")
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(dd.content_hash(F.col("text"))).alias("n_unique_hash"),
        F.countDistinct(tx.fingerprint(F.col("text"))).alias("n_unique_fp"),
        F.count(F.lit(1)).alias("n_total"),
    ).select("n_docs", "n_unique_hash", "n_unique_fp")


SQL_DEDUP_EXACT = r"""
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT sha256(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g'))))
           AS n_unique_hash,
       COUNT(DISTINCT sha256(array_to_string(list_sort(list_distinct(
           string_split(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g')), ' ')
       )), ' '))) AS n_unique_fp
FROM documents
"""


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-dup detection, oracle-checked end-to-end: banded
    LSH candidate generation -> exact n-gram Jaccard verify at 0.2. The
    oracle is the exact inverted-index SQL — a hash match proves the LSH
    candidates had full recall on every pair >= threshold (the sf0.01
    corpus is cleanly bimodal: noise pairs <= 0.07, planted near-dups
    >= 0.9, and the seed-free signature kernel is deterministic)."""
    df = _t(spark, sf_dir, "documents")
    cands = dd.minhash_lsh_candidates(df, "text", "doc_id", num_hashes=32, bands=8)
    out = dd.ngram_jaccard_pairs(cands, df, "text", "doc_id", threshold=0.2)
    return out.select("id_a", "id_b")


SQL_DEDUP_MINHASH_LSH = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        for i in generate_series(1, len(w) - 2)]) AS g
  FROM norm WHERE len(w) >= 3
), ex AS (
  SELECT doc_id, len(g) AS sz, unnest(g) AS s FROM sh
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING CAST(COUNT(*) AS DOUBLE)
       / (ANY_VALUE(a.sz) + ANY_VALUE(b.sz) - COUNT(*)) >= 0.2
"""


def q_dedup_jaccard(spark, sf_dir):
    """LSH candidates -> exact Jaccard scores; oracle = exact all-pairs
    (inverted index) SQL, so the hash match also certifies candidate
    recall = 1.0 at this threshold on this corpus."""
    df = _t(spark, sf_dir, "documents")
    cands = dd.minhash_lsh_candidates(df, "text", "doc_id", num_hashes=32, bands=8)
    out = dd.ngram_jaccard_pairs(cands, df, "text", "doc_id", threshold=0.2)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


# the portable (md5-60-bit) SimHash signature pipeline, shared by the
# signatures and pairs oracles: word bigrams of normalized text -> 60-bit
# shingle hash (first 15 md5 hex chars base-16) -> per-bit majority vote
_SQL_SIMHASH_SIGS = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 2
              THEN list_distinct([w[i] || ' ' || w[i+1]
                                  for i in generate_series(1, len(w) - 1)])
              ELSE [] END AS g
  FROM norm
), hx AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(unnest(g)), 1, 15)) AS BIGINT) AS h
  FROM sh
), votes AS (
  SELECT doc_id, b.bit,
         SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM hx CROSS JOIN (SELECT unnest(range(0, 60)) AS bit) b
  GROUP BY doc_id, b.bit
), sigs AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << bit)
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
)
"""


def q_dedup_simhash(spark, sf_dir):
    """Per-doc SimHash signatures in the portable (SQL-reproducible)
    md5-60-bit family; docs too short to shingle sign as 0."""
    return dd.simhash_signatures(
        _t(spark, sf_dir, "documents"), "text", "doc_id", portable=True
    )


SQL_DEDUP_SIMHASH = _SQL_SIMHASH_SIGS + """
SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
FROM documents d LEFT JOIN sigs s USING (doc_id)
"""


def q_dedup_simhash_pairs(spark, sf_dir):
    """SimHash banded-Hamming near-dup pairs (pigeonhole blocks → equi
    join → bit_count verify) in the portable signature family; oracle =
    brute-force all-pairs Hamming over the same SQL-computed signatures
    (banding is recall-lossless by pigeonhole, so the outputs must be
    identical, not just similar)."""
    out = dd.simhash_candidates(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        max_hamming=3, portable=True,
    )
    return out.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


SQL_DEDUP_SIMHASH_PAIRS = _SQL_SIMHASH_SIGS + """
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q_dedup_jaccard_inverted(spark, sf_dir):
    """Exact n-gram Jaccard near-dups via the inverted-index join —
    the SQL-expressible exact counterpart of the MinHash candidate path."""
    df = _t(spark, sf_dir, "documents")
    return dd.jaccard_pairs_inverted(df, "text", "doc_id", threshold=0.2)


SQL_DEDUP_JACCARD_INVERTED = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        for i in generate_series(1, len(w) - 2)]) AS g
  FROM norm WHERE len(w) >= 3
), ex AS (
  SELECT doc_id, len(g) AS sz, unnest(g) AS s FROM sh
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / (ANY_VALUE(a.sz) + ANY_VALUE(b.sz) - COUNT(*)), 6) AS jaccard
FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING CAST(COUNT(*) AS DOUBLE)
       / (ANY_VALUE(a.sz) + ANY_VALUE(b.sz) - COUNT(*)) >= 0.2
"""


def q_dedup_groups(spark, sf_dir):
    """Near-dup pair graph -> duplicate groups via iterative min-label
    connected components; oracle = DuckDB recursive-CTE transitive
    closure over the same exact-Jaccard pair set. Every doc appears
    once; group_id = min doc_id of its component (own id if unpaired)."""
    df = _t(spark, sf_dir, "documents")
    pairs = dd.jaccard_pairs_inverted(df, "text", "doc_id", threshold=0.2)
    return dd.dedup_groups(df, "doc_id", pairs)


SQL_DEDUP_GROUPS = r"""
WITH RECURSIVE norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        for i in generate_series(1, len(w) - 2)]) AS g
  FROM norm WHERE len(w) >= 3
), ex AS (
  SELECT doc_id, len(g) AS sz, unnest(g) AS s FROM sh
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING CAST(COUNT(*) AS DOUBLE)
         / (ANY_VALUE(a.sz) + ANY_VALUE(b.sz) - COUNT(*)) >= 0.2
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION
  SELECT id_b, id_a FROM p
), reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), comp AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS group_id
  FROM reach GROUP BY src
)
SELECT d.doc_id, COALESCE(c.group_id, d.doc_id) AS group_id
FROM documents d LEFT JOIN comp c USING (doc_id)
"""


def q_dedup_canonical(spark, sf_dir):
    """End-to-end corpus dedup: near-dup pairs -> connected components ->
    keep the smallest-id representative per group. The user-facing 'give
    me the deduplicated corpus' query; oracle = recursive-closure SQL
    filtered to group representatives."""
    df = _t(spark, sf_dir, "documents")
    pairs = dd.jaccard_pairs_inverted(df, "text", "doc_id", threshold=0.2)
    groups = dd.dedup_groups(df, "doc_id", pairs)
    return groups.filter(F.col("group_id") == F.col("doc_id")).select("doc_id")


SQL_DEDUP_CANONICAL = SQL_DEDUP_GROUPS.replace(
    """SELECT d.doc_id, COALESCE(c.group_id, d.doc_id) AS group_id
FROM documents d LEFT JOIN comp c USING (doc_id)""",
    """SELECT d.doc_id
FROM documents d LEFT JOIN comp c USING (doc_id)
WHERE COALESCE(c.group_id, d.doc_id) = d.doc_id""",
)


def q_dedup_containment(spark, sf_dir):
    """Asymmetric n-gram containment pairs (subset-duplication detector:
    quotes/excerpts that Jaccard misses on size-mismatched pairs)."""
    df = _t(spark, sf_dir, "documents")
    return dd.containment_pairs_inverted(df, "text", "doc_id", threshold=0.3)


SQL_DEDUP_CONTAINMENT = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        for i in generate_series(1, len(w) - 2)]) AS g
  FROM norm WHERE len(w) >= 3
), ex AS (
  SELECT doc_id, len(g) AS sz, unnest(g) AS s FROM sh
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(a.sz), 6) AS cont_a_in_b,
       ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(b.sz), 6) AS cont_b_in_a
FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(a.sz) >= 0.3
    OR CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(b.sz) >= 0.3
"""


def q_dedup_substring(spark, sf_dir):
    """Exact-substring duplicate spans (Lee et al. 2022 suffix-array
    protocol at fixed k=8 tokens): maximal cross-document shared token
    spans via k-gram posting join + gaps-and-islands merge."""
    df = _t(spark, sf_dir, "documents")
    return dd.duplicate_substring_spans(df, "text", "doc_id", k=8)


SQL_DEDUP_SUBSTRING = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), gr AS (
  SELECT doc_id,
         [{'pos': i, 's': array_to_string(w[i:i+7], ' ')}
          for i in generate_series(1, len(w) - 7)] AS gl
  FROM norm WHERE len(w) >= 8
), grams AS (
  SELECT doc_id, unnest(gl, recursive := true) FROM gr
), shared AS (
  SELECT s FROM grams GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2
), marked AS (
  SELECT g.doc_id, g.pos,
         g.pos - ROW_NUMBER() OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS grp
  FROM grams g JOIN shared USING (s)
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS start_pos,
       CAST(MAX(pos) + 7 AS BIGINT) AS end_pos,
       CAST(MAX(pos) - MIN(pos) + 8 AS BIGINT) AS span_tokens
FROM marked GROUP BY doc_id, grp
"""


def q_dedup_substring_strip(spark, sf_dir):
    """Destructive half of the ExactSubstr protocol: remove every token
    covered by a duplicated >=8-token cross-document span, reassemble."""
    df = _t(spark, sf_dir, "documents")
    return dd.strip_duplicate_spans(df, "text", "doc_id", k=8)


SQL_DEDUP_SUBSTRING_STRIP = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), gr AS (
  SELECT doc_id,
         [{'pos': i, 's': array_to_string(w[i:i+7], ' ')}
          for i in generate_series(1, len(w) - 7)] AS gl
  FROM norm WHERE len(w) >= 8
), grams AS (
  SELECT doc_id, unnest(gl, recursive := true) FROM gr
), shared AS (
  SELECT s FROM grams GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2
), marked AS (
  SELECT g.doc_id, g.pos,
         g.pos - ROW_NUMBER() OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS grp
  FROM grams g JOIN shared USING (s)
), spans AS (
  SELECT doc_id, MIN(pos) AS sp, MAX(pos) + 7 AS ep
  FROM marked GROUP BY doc_id, grp
), perdoc AS (
  SELECT doc_id, list({'s': sp, 'e': ep}) AS sl FROM spans GROUP BY doc_id
), kept AS (
  SELECT n.doc_id, n.w,
         [n.w[i] for i in generate_series(1, len(n.w))
          if len(list_filter(COALESCE(p.sl, []), x -> i BETWEEN x.s AND x.e)) = 0] AS kw
  FROM norm n LEFT JOIN perdoc p USING (doc_id)
)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(len(w) - len(kw) AS BIGINT) AS n_removed,
       COALESCE(array_to_string(kw, ' '), '') AS text_clean
FROM kept
"""


def q_dedup_against(spark, sf_dir):
    """Cross-corpus near-dedup: even doc_ids are the 'fresh crawl', odd
    doc_ids the existing corpus; drop fresh docs with n-gram Jaccard >=
    0.2 against ANY existing doc. MinHash-LSH candidates -> exact
    verify; oracle = exact inverted-index cross Jaccard + NOT EXISTS, so
    the hash match certifies cross-corpus candidate recall = 1.0 here."""
    df = _t(spark, sf_dir, "documents")
    new = df.filter(F.col("doc_id") % 2 == 0)
    ref = df.filter(F.col("doc_id") % 2 == 1)
    out = dd.dedup_against(
        new, ref, "text", "doc_id", method="near",
        threshold=0.2, num_hashes=32, bands=8,
    )
    return out.select("doc_id", "source", "lang")


SQL_DEDUP_AGAINST = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        for i in generate_series(1, len(w) - 2)]) AS g
  FROM norm WHERE len(w) >= 3
), ex AS (
  SELECT doc_id, len(g) AS sz, unnest(g) AS s FROM sh
), dup_new AS (
  SELECT a.doc_id
  FROM ex a JOIN ex b ON a.s = b.s
  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
  GROUP BY a.doc_id, b.doc_id
  HAVING CAST(COUNT(*) AS DOUBLE)
         / (ANY_VALUE(a.sz) + ANY_VALUE(b.sz) - COUNT(*)) >= 0.2
)
SELECT d.doc_id, d.source, d.lang FROM documents d
WHERE d.doc_id % 2 = 0
  AND d.doc_id NOT IN (SELECT doc_id FROM dup_new)
"""


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup: the LSH scale path (banded hyperplane
    prefilter -> exact cosine verify), oracle-checked against DuckDB's
    exact all-pairs — at sf0.01 the prefilter has verified full recall
    (32 planes / 16 bands at threshold 0.35; see test_dedup_embedding)."""
    emb = _t(spark, sf_dir, "embeddings")
    return dd.embedding_neardup_pairs(
        emb, "embedding", "vec_id", dim=64, threshold=0.35,
        num_planes=32, bands=16,
    )


SQL_DEDUP_EMBEDDING = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.35
"""


def q_sim_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    return sim.cosine_topk(emb, queries, "embedding", "vec_id", k=5)


SQL_SIM_COSINE_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe
           FROM embeddings ORDER BY vec_id LIMIT 5)
SELECT q.query_id, e.vec_id AS neighbor_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.qe AS DOUBLE[])), 6) AS cos_sim
FROM embeddings e CROSS JOIN q
WHERE e.vec_id <> q.query_id
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY q.query_id
    ORDER BY ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.qe AS DOUBLE[])), 6) DESC,
             e.vec_id) <= 5
"""


def q_sim_bucketed_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    return sim.bucketed_topk(emb, queries, "embedding", "vec_id", "label", k=3)


SQL_SIM_BUCKETED_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label
           FROM embeddings ORDER BY vec_id LIMIT 5)
SELECT q.query_id, e.vec_id AS neighbor_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.qe AS DOUBLE[])), 6) AS cos_sim
FROM embeddings e JOIN q ON e.label = q.label
WHERE e.vec_id <> q.query_id
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY q.query_id
    ORDER BY ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.qe AS DOUBLE[])), 6) DESC,
             e.vec_id) <= 3
"""


def q_sim_lsh_topk(spark, sf_dir):
    """Multi-probe LSH ANN, oracle-checked against the exact top-k SQL:
    at probe depth 3 the candidate set provably contains every true
    neighbor on this fixture (recall 1.0 at sf0.001 and sf0.01, measured
    in test_lsh_topk_recall), so the approximate result coincides with
    the exact one and can share its oracle. Hyperplanes are seeded —
    the plan is deterministic."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    return sim.lsh_topk(
        emb, queries, "embedding", "vec_id", dim=64, k=5, probe=3
    )


def q_sim_pq_topk(spark, sf_dir):
    """Two-stage product-quantization ANN (the FAISS IndexPQ shape):
    spherical PQ codebooks (16 subspaces × 32 centroids, seeded) encode
    the corpus to 16-code rows, the ADC scan shortlists 100 candidates
    per query with m lookups each, and only the shortlist joins back to
    full vectors for the exact cosine re-rank. At this operating point
    the shortlist provably contains the exact top-5 (hash-checked
    against the exact-SQL oracle) — the candidates→exact-verify
    certification the LSH and IVF tiers already use; recall@5 vs
    shortlist size is measured in test_pq_rerank_recall."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    # shortlist depth scales with corpus size (10%, floor 100): a fixed
    # depth that certifies at sf0.01 starts missing tail entries of the
    # exact top-5 by sf0.1 (measured: 100 misses 1-of-25 at 2000 vecs,
    # 200 is exact)
    rerank_from = max(100, emb.count() // 10)
    return sim.pq_rerank_topk(
        emb, queries, "embedding", "vec_id", dim=64, k=5,
        m=16, k_codes=32, rerank_from=rerank_from,
    )


def q_sim_ivf_topk(spark, sf_dir):
    """IVF ANN with a learned (seeded KMeans) coarse quantizer. Probing
    every cell makes the result provably equal to the exact top-k — the
    cells partition the corpus — so the exact SQL oracle applies without
    any recall measurement, while the plan still runs the full IVF
    machinery (fit, cell assignment, probe equi-join, per-cell scan).
    The nprobe < n_cells scan-fraction trade-off is exercised in
    test_ivf_topk (the fixture's uniform vectors have no cluster
    structure, so partial-probe recall there is data-limited)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    return sim.ivf_topk(
        emb, queries, "embedding", "vec_id", dim=64, k=5,
        n_cells=8, nprobe=8,
    )


def q_mm_features(spark, sf_dir):
    from datamine_v2_0_spark.operators import multimodal as mm

    media = mm.media_table_from_documents(_t(spark, sf_dir, "documents"))
    out = mm.extract_media_features(media)
    return out.select("media_id", "media_type", "n_bytes", "content_sha256")


SQL_MM_FEATURES = """
SELECT doc_id AS media_id, 'image' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS content_sha256
FROM documents
"""


def q_mm_frames(spark, sf_dir):
    """Frame sampling over media payloads (mapInPandas one-row-in /
    many-rows-out): every 2nd 64-char frame."""
    from datamine_v2_0_spark.operators import multimodal as mm

    media = mm.media_table_from_documents(_t(spark, sf_dir, "documents"))
    return mm.sample_frames(media, frame_size=64, every=2)


SQL_MM_FRAMES = """
WITH m AS (
  SELECT doc_id AS media_id, text AS payload,
         CAST(ceil(len(text) / 64.0) AS BIGINT) AS n_frames
  FROM documents WHERE len(text) > 0
)
SELECT media_id, i AS frame_idx,
       substr(payload, CAST(i * 64 + 1 AS BIGINT), 64) AS frame_payload,
       n_frames
FROM m, unnest(generate_series(0, n_frames - 1, 2)) AS t(i)
"""


def q_cpd_candidates(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "ukey", F.concat(F.lit("u"), F.col("user_id").cast("string"))
    )
    return cpd.cpd_pipeline(
        ev,
        "ukey",
        "ts",
        ["value"],
        "event_id",
        duration="6 hours",
        penalty=1000.0,
        min_size=4,
    ).select(
        "partition_key",
        "signal_name",
        F.col("bucket_ts").cast("string").alias("bucket_ts"),
        F.col("bucket_id").cast("string").alias("bucket_id"),
    )


def q_win_savgol(spark, sf_dir):
    """F5 Savitzky–Golay grouped-map UDF, oracle-checked on interior
    points: away from the edges an 11-point quadratic SG filter IS the
    fixed convolution (-36,9,44,69,84,89,...)/429, which DuckDB expresses
    with lag/lead — so the applyInPandas kernel's output hash-matches
    closed-form SQL. Edge rows (polynomial-fit extrapolation) are
    excluded here and covered by the exact-recovery pytest."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = sm.savgol_smooth(
        ev, ["user_id"], "ts", "value", out_col="smoothed", window=11, polyorder=2
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    out = out.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("user_id"))
    )
    return out.filter(
        (F.col("__rn") >= 6) & (F.col("__rn") <= F.col("__n") - 5)
    ).select("event_id", F.round("smoothed", 6).alias("smoothed"))


SQL_WIN_SAVGOL = """
WITH r AS (
  SELECT event_id,
         ROW_NUMBER() OVER w AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         (-36.0 * (LAG(value, 5) OVER w + LEAD(value, 5) OVER w)
          + 9.0  * (LAG(value, 4) OVER w + LEAD(value, 4) OVER w)
          + 44.0 * (LAG(value, 3) OVER w + LEAD(value, 3) OVER w)
          + 69.0 * (LAG(value, 2) OVER w + LEAD(value, 2) OVER w)
          + 84.0 * (LAG(value, 1) OVER w + LEAD(value, 1) OVER w)
          + 89.0 * value) / 429.0 AS sm
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT event_id, ROUND(sm, 6) AS smoothed
FROM r WHERE rn >= 6 AND rn <= n - 5
"""


# ------------------------------------------------------- pipeline stages

def _raw_from_events(df: DataFrame) -> DataFrame:
    """Shape the generic events table like the 11-column raw telemetry CSV
    so the full silver chain runs on driver testdata."""
    state = F.element_at(
        F.array(F.lit("idle"), F.lit("loadToDump"), F.lit("JUNK")),
        (F.col("event_id") % 3 + 1).cast("int"),
    )
    prndl = F.element_at(
        F.array(F.lit("p"), F.lit("drive"), F.lit("x")),
        (F.col("event_id") % 3 + 1).cast("int"),
    )
    lat_v = F.col("value") % F.lit(80.0)
    lon_v = F.col("value") % F.lit(170.0)
    pos = F.concat(
        F.lit("{"), lat_v.cast("string"), F.lit(","), lon_v.cast("string"),
        F.lit(",100.0}"),
    )
    return df.select(
        F.col("event_id"),
        F.col("ts").cast("string").alias("timestamp"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("device_id"),
        state.alias("state"),
        F.col("event_type").alias("software_state"),
        F.when(F.col("value") > 50.0, F.lit("t")).otherwise(F.lit("f")).alias(
            "system_engaged"
        ),
        (F.col("value") % F.lit(10.0)).alias("current_speed"),
        pos.alias("current_position"),
        (F.col("value") * 1000.0).alias("load_weight"),
        prndl.alias("prndl"),
        F.lit("f").alias("parking_brake_applied"),
        F.col("props").alias("extras"),
    )


def q_pipeline_silver(spark, sf_dir):
    raw = _raw_from_events(_t(spark, sf_dir, "events"))
    out = silver_transform(
        raw, ingested_at=F.lit(None).cast("timestamp"), passthrough=["event_id"]
    )
    return out.select(
        "event_id",
        "raw_event_hash_id",
        "device_date",
        "state",
        "prndl",
        "system_engaged",
        F.round(F.col("current_position.latitude"), 6).alias("lat"),
        "extras",
    )


SQL_PIPELINE_SILVER = f"""
SELECT event_id,
       sha256('u' || CAST(user_id AS VARCHAR) || '|' ||
              {_PG_TS_SQL.format(c='ts')}) AS raw_event_hash_id,
       'u' || CAST(user_id AS VARCHAR) || '_' || strftime(ts, '%Y-%m-%d')
           AS device_date,
       CASE event_id % 3 WHEN 0 THEN 'idle' WHEN 1 THEN 'hauling'
            ELSE 'unknown' END AS state,
       CASE event_id % 3 WHEN 0 THEN 'park' WHEN 1 THEN 'drive'
            ELSE 'unknown' END AS prndl,
       value > 50.0 AS system_engaged,
       ROUND(value % 80.0, 6) AS lat,
       props AS extras
FROM events
"""


def q_pipeline_features(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    silver = ev.select(
        "event_id",
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("device_id"),
        F.concat(
            F.lit("u"), F.col("user_id").cast("string"), F.lit("_"),
            F.date_format("ts", "yyyy-MM-dd"),
        ).alias("device_date"),
        F.col("ts").alias("timestamp"),
        (F.col("value") % F.lit(10.0)).alias("current_speed"),
        (F.col("value") * 1000.0).alias("load_weight"),
        F.lit(None).cast(
            "struct<longitude:double,latitude:double,altitude:double>"
        ).alias("current_position"),
        F.when(F.col("event_id") % 2 == 0, "drive").otherwise("park").alias(
            "prndl"
        ),
    )
    feats = build_features(silver)
    return feats.select(
        "event_id",
        "location_type",
        "is_stationary",
        F.col("stationary_block_id").cast("long").alias("stationary_block_id"),
        F.round("speed_rolling_avg_5s", 6).alias("speed_rolling_avg_5s"),
        F.round("load_weight_rate_of_change", 6).alias("lw_roc"),
        F.round("time_in_stationary_state", 6).alias("time_in_stat"),
        "has_reliable_payload",
        "prndl_drive",
        "is_heavy_load",
    )


SQL_PIPELINE_FEATURES = """
WITH silver AS (
  SELECT event_id,
         'u' || CAST(user_id AS VARCHAR) AS device_id,
         'u' || CAST(user_id AS VARCHAR) || '_' || strftime(ts, '%Y-%m-%d')
             AS device_date,
         ts, value % 10.0 AS speed, value * 1000.0 AS lw,
         CASE WHEN event_id % 2 = 0 THEN 'drive' ELSE 'park' END AS prndl
  FROM events
), p1 AS (
  SELECT *,
         speed < 0.5 AS is_stationary,
         CAST(date_diff('microsecond', LAG(ts) OVER w, ts) AS DOUBLE)
             / 1000000.0 AS time_delta_s,
         AVG(speed) OVER (w ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
             AS speed_rolling_avg_5s,
         AVG(lw) OVER (w ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
             AS lw_smoothed
  FROM silver
  WINDOW w AS (PARTITION BY device_id, device_date ORDER BY ts)
), p1b AS (
  SELECT *,
         lw_smoothed - LAG(lw_smoothed) OVER w AS lw_roc,
         CASE WHEN LAG(is_stationary) OVER w IS NULL
               OR LAG(is_stationary) OVER w <> is_stationary
              THEN 1 ELSE 0 END AS chg,
         STDDEV(lw) OVER (PARTITION BY device_id) > 1000.0
             AS has_reliable_payload
  FROM p1
  WINDOW w AS (PARTITION BY device_id, device_date ORDER BY ts)
), p2 AS (
  SELECT *,
         CAST(SUM(chg) OVER (PARTITION BY device_id, device_date ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS stationary_block_id
  FROM p1b
), p3 AS (
  SELECT *,
         SUM(COALESCE(time_delta_s, 0.0))
             OVER (PARTITION BY device_id, device_date, stationary_block_id
                   ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS run_stat
  FROM p2
)
SELECT event_id,
       'Haul Road / Other' AS location_type,
       is_stationary,
       stationary_block_id,
       ROUND(speed_rolling_avg_5s, 6) AS speed_rolling_avg_5s,
       ROUND(lw_roc, 6) AS lw_roc,
       ROUND(CASE WHEN is_stationary THEN run_stat ELSE 0.0 END, 6)
           AS time_in_stat,
       has_reliable_payload,
       prndl = 'drive' AS prndl_drive,
       lw_smoothed > 50000.0 AS is_heavy_load
FROM p3
"""


def q_agg_incremental(spark, sf_dir):
    """Continuous-aggregate refresh: materialize the 5-minute rollup
    over ~3/4 of the events, then refresh with the remaining quarter as
    the arriving delta — recomputing only delta-touched buckets and
    upserting. The oracle is the FULL recompute, so the hash match
    proves refresh == recompute (the TimescaleDB continuous-aggregate
    maintenance invariant)."""
    ev = _t(spark, sf_dir, "events")
    aggs = [
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.count(F.lit(1)).alias("n"),
    ]
    old_raw = ev.filter(F.col("event_id") % 4 != 0)
    delta = ev.filter(F.col("event_id") % 4 == 0)
    materialized = agg.tumbling_agg(old_raw, "ts", "5 minutes", aggs)
    refreshed = agg.refresh_tumbling(
        materialized, ev, delta, "ts", "5 minutes", aggs
    )
    return refreshed.select(
        F.col("bucket_start").cast("string").alias("bucket_start"),
        "avg_value",
        "n",
    )


def q_agg_rollup(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    return (
        df.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
    )


SQL_AGG_ROLLUP = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       ROUND(SUM(l_quantity), 4) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_agg_cube(spark, sf_dir):
    df = _t(spark, sf_dir, "orders")
    return df.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


SQL_AGG_CUBE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_win_range_frame(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    out = df.withColumn(
        "rmean_300s",
        win.range_frame_mean(F.col("value"), ["user_id"], epoch, 300),
    )
    return out.select("event_id", F.round("rmean_300s", 6).alias("rmean_300s"))


SQL_WIN_RANGE_FRAME = """
SELECT event_id,
       ROUND(AVG(value) OVER (
           PARTITION BY user_id
           ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
           RANGE BETWEEN 300 PRECEDING AND CURRENT ROW), 6) AS rmean_300s
FROM events
"""


def q_win_minmax_flags(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    w = _events_window()
    mn, mx = win.group_min_max("ts", ["user_id"])
    return df.select(
        "event_id",
        mn.cast("string").alias("first_ts"),
        mx.cast("string").alias("last_ts"),
        win.change_flag("event_type", w).alias("type_changed"),
        F.round(win.second_diff("value", w), 6).alias("accel"),
    )


SQL_WIN_MINMAX_FLAGS = """
SELECT event_id,
       CAST(MIN(ts) OVER (PARTITION BY user_id) AS VARCHAR) AS first_ts,
       CAST(MAX(ts) OVER (PARTITION BY user_id) AS VARCHAR) AS last_ts,
       CASE WHEN LAG(event_type) OVER w IS NULL
             OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END
           AS type_changed,
       ROUND((value - LAG(value) OVER w)
             - (LAG(value) OVER w - LAG(value, 2) OVER w), 6) AS accel
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_join_interval_priority(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("i_user"),
        F.col("ts").alias("i_start"),
        F.expr("ts + INTERVAL 30 MINUTES").alias("i_end"),
        F.lit("post_purchase").alias("i_label"),
        F.lit(2).alias("i_priority"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("i_user"),
        F.col("ts").alias("i_start"),
        F.expr("ts + INTERVAL 60 MINUTES").alias("i_end"),
        F.lit("post_error").alias("i_label"),
        F.lit(1).alias("i_priority"),
    )
    intervals = purchases.unionByName(errors)
    joined = jn.interval_contain_join(
        ev.select("event_id", "user_id", "ts"),
        intervals,
        [("user_id", "i_user")],
        "ts",
        "i_start",
        "i_end",
        how="left",
    )
    resolved = resolve_priority(joined, "event_id", F.col("i_priority"), "i_label")
    return resolved.select(
        "event_id", F.coalesce("i_label", F.lit("background")).alias("label")
    )


SQL_JOIN_INTERVAL_PRIORITY = """
WITH iv AS (
  SELECT user_id AS i_user, ts AS i_start, ts + INTERVAL 30 MINUTE AS i_end,
         'post_purchase' AS i_label, 2 AS i_priority
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, ts + INTERVAL 60 MINUTE,
         'post_error', 1
  FROM events WHERE event_type = 'error'
), j AS (
  SELECT e.event_id, iv.i_label, iv.i_priority
  FROM events e LEFT JOIN iv
    ON e.user_id = iv.i_user AND e.ts BETWEEN iv.i_start AND iv.i_end
)
SELECT event_id, COALESCE(i_label, 'background') AS label
FROM j
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id
                           ORDER BY i_priority DESC, i_label) = 1
"""


def q_agg_describe(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    return agg.describe_stats(df, ["l_quantity", "l_extendedprice", "l_discount"])


SQL_AGG_DESCRIBE = """
SELECT 'l_quantity' AS "column", COUNT(l_quantity) AS n,
       ROUND(AVG(l_quantity), 4) AS mean, ROUND(STDDEV(l_quantity), 4) AS stddev,
       CAST(MIN(l_quantity) AS DOUBLE) AS min_val,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_val
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', COUNT(l_extendedprice),
       ROUND(AVG(l_extendedprice), 4), ROUND(STDDEV(l_extendedprice), 4),
       CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'l_discount', COUNT(l_discount),
       ROUND(AVG(l_discount), 4), ROUND(STDDEV(l_discount), 4),
       CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE)
FROM lineitem
"""


def q_win_rank_family(spark, sf_dir):
    """Generic ranking family (rank/dense_rank/percent_rank/cume_dist/
    ntile/lead) sharing one window sort."""
    df = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = win.ordered_window(["user_id"], ["value", "event_id"])
    feats = win.rank_features(w, F.col("value"), buckets=4)
    return df.select(
        "event_id",
        "user_id",
        feats["rnk"].alias("rnk"),
        feats["drnk"].alias("drnk"),
        F.round(feats["prnk"], 6).alias("prnk"),
        F.round(feats["cdist"], 6).alias("cdist"),
        feats["tile"].alias("tile"),
        feats["next_val"].alias("next_val"),
    )


SQL_WIN_RANK_FAMILY = """
SELECT event_id, user_id,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
       ROUND(CUME_DIST() OVER w, 6) AS cdist,
       NTILE(4) OVER w AS tile,
       LEAD(value, 1) OVER w AS next_val
FROM events WHERE value IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
"""


def q_sql_views(spark, sf_dir):
    """S10: the SQL-text API surface — register temp views, run a query
    through spark.sql (the engine-native analog of pd.read_sql_query)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM v_lineitem JOIN v_orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= DATE '1995-01-01'
        GROUP BY o_orderstatus
        """
    )


SQL_SQL_VIEWS = """
SELECT o_orderstatus, COUNT(*) AS n,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= DATE '1995-01-01'
GROUP BY o_orderstatus
"""


def q_eda_movement(spark, sf_dir):
    from datamine_v2_0_spark.operators.spatial import movement_speed

    df = _t(spark, sf_dir, "events")
    w = _events_window()
    lat = F.col("value") % F.lit(80.0)
    lon = F.col("value") % F.lit(170.0)
    return df.select(
        "event_id",
        F.round(movement_speed(lat, lon, "ts", w), 6).alias("speed"),
    )


SQL_EDA_MOVEMENT = """
WITH p AS (
  SELECT event_id, user_id, ts,
         value % 80.0 AS lat, value % 170.0 AS lon
  FROM events
), d AS (
  SELECT event_id,
         lat - LAG(lat) OVER w AS dlat,
         lon - LAG(lon) OVER w AS dlon,
         CAST(date_diff('microsecond', LAG(ts) OVER w, ts) AS DOUBLE)
             / 1000000.0 AS dt
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id,
       ROUND(CASE WHEN dt > 0 THEN SQRT(dlat * dlat + dlon * dlon) / dt END, 6)
           AS speed
FROM d
"""


def q_agg_approx(spark, sf_dir):
    """Approx sketch aggregates — the 100 TB defaults (HLL distinct, KLL
    percentile). No SQL oracle: sketch algorithms differ across engines;
    rows-only check + the exact variants above cover semantics."""
    df = _t(spark, sf_dir, "lineitem")
    return agg.approx_percentiles(df, ["l_returnflag"], "l_extendedprice").join(
        df.groupBy("l_returnflag").agg(
            F.approx_count_distinct("l_orderkey").alias("approx_orders")
        ),
        "l_returnflag",
    )


def q_agg_hll_rollup(spark, sf_dir):
    """Mergeable-sketch rollup: daily HLL user sketches -> weekly
    distinct-user estimates via sketch union (never a rescan). No SQL
    oracle (sketch binaries are engine-specific); pytest pins
    union-vs-direct equality and estimate accuracy vs exact."""
    ev = _t(spark, sf_dir, "events")
    daily = agg.hll_bucket_sketches(ev, "ts", "user_id", 86400)
    return agg.hll_rollup(daily, 7 * 86400)


def q_agg_salted(spark, sf_dir):
    """Salted two-phase aggregation — must be bit-identical to the plain
    groupBy (the oracle IS the plain form)."""
    from datamine_v2_0_spark.operators.skew import salted_agg

    df = _t(spark, sf_dir, "lineitem")
    out = salted_agg(
        df,
        ["l_returnflag"],
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "sum_qty": (F.sum("l_quantity"), F.sum("sum_qty")),
            "max_price": (F.max("l_extendedprice"), F.max("max_price")),
        },
        salt_buckets=8,
    )
    return out.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round("sum_qty", 4).alias("sum_qty"),
        "max_price",
    )


SQL_AGG_SALTED = """
SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_quantity), 4) AS sum_qty,
       MAX(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag
"""


def q_join_salted(spark, sf_dir):
    """Salted replicated join — identical results to the plain equi join."""
    from datamine_v2_0_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    out = salted_join(li, o, "l_orderkey", salt_buckets=4)
    return out.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


SQL_JOIN_SALTED = """
SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(l_quantity), 4) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_win_sessionize(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    w = _events_window()
    sess = df.withColumn(
        "session_id", win.sessionize("ts", w, 3600.0).cast("long")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").cast("string").alias("session_start"),
        F.max("ts").cast("string").alias("session_end"),
    )


SQL_WIN_SESSIONIZE = """
WITH d AS (
  SELECT user_id, ts, event_id,
         CAST(date_diff('microsecond', LAG(ts) OVER w, ts) AS DOUBLE)
             / 1000000.0 AS delta
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         CAST(SUM(CASE WHEN delta IS NULL OR delta > 3600.0 THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM d
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       CAST(MIN(ts) AS VARCHAR) AS session_start,
       CAST(MAX(ts) AS VARCHAR) AS session_end
FROM s GROUP BY user_id, session_id
"""


def q_scalar_wkt(spark, sf_dir):
    """WKT text boundary (ST_AsText / ST_GeogFromText / ST_X-Y-Z parity):
    render POINT Z at fixed precision, parse it back, emit both."""
    from datamine_v2_0_spark.functions.wkt import parse_wkt_point, wkt_point

    df = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    lon = (F.col("value") % F.lit(170.0)) - F.lit(85.0)
    lat = (F.col("user_id") % F.lit(160)).cast("double") - F.lit(80.0)
    alt = (F.col("event_id") % F.lit(4000)).cast("double")
    rendered = wkt_point(lon, lat, alt)
    parsed = parse_wkt_point(rendered)
    return df.select(
        "event_id",
        rendered.alias("wkt"),
        parsed["lon"].alias("x"),
        parsed["lat"].alias("y"),
        parsed["alt"].alias("z"),
    )


SQL_SCALAR_WKT = """
WITH pts AS (
  SELECT event_id,
         printf('POINT Z (%.6f %.6f %.6f)',
                fmod(value, 170.0) - 85.0,
                CAST(user_id % 160 AS DOUBLE) - 80.0,
                CAST(event_id % 4000 AS DOUBLE)) AS wkt
  FROM events WHERE value IS NOT NULL
)
SELECT event_id, wkt,
       CAST(regexp_extract(wkt, 'POINT Z \\(([-0-9.]+) ([-0-9.]+) ([-0-9.]+)\\)', 1) AS DOUBLE) AS x,
       CAST(regexp_extract(wkt, 'POINT Z \\(([-0-9.]+) ([-0-9.]+) ([-0-9.]+)\\)', 2) AS DOUBLE) AS y,
       CAST(regexp_extract(wkt, 'POINT Z \\(([-0-9.]+) ([-0-9.]+) ([-0-9.]+)\\)', 3) AS DOUBLE) AS z
FROM pts
"""


def q_scalar_binning(spark, sf_dir):
    from datamine_v2_0_spark.operators import binning as bn

    df = _t(spark, sf_dir, "lineitem")
    binned = df.select(
        bn.fixed_width_bins(F.col("l_quantity"), 0.0, 50.0, 10).alias("qty_bin"),
        bn.explicit_bins(
            F.col("l_extendedprice"), [0.0, 10000.0, 50000.0, 1e9]
        ).alias("price_bin"),
    )
    return binned.groupBy("qty_bin", "price_bin").agg(
        F.count(F.lit(1)).alias("n")
    )


SQL_SCALAR_BINNING = """
SELECT CASE WHEN l_quantity BETWEEN 0.0 AND 50.0
            THEN CASE WHEN l_quantity = 50.0 THEN 9
                 ELSE CAST(FLOOR(l_quantity / 5.0) AS INT) END
            ELSE NULL END AS qty_bin,
       CASE WHEN l_extendedprice > 0.0 AND l_extendedprice <= 10000.0 THEN 0
            WHEN l_extendedprice > 10000.0 AND l_extendedprice <= 50000.0 THEN 1
            WHEN l_extendedprice > 50000.0 AND l_extendedprice <= 1e9 THEN 2
            ELSE NULL END AS price_bin,
       COUNT(*) AS n
FROM lineitem GROUP BY 1, 2
"""


def q_scalar_quantile_bins(spark, sf_dir):
    from datamine_v2_0_spark.operators import binning as bn

    df = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    out = bn.quantile_bins_exact(df, "o_totalprice", 4, "price_q", "o_orderkey")
    return out.groupBy("price_q").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 4).alias("lo"),
        F.round(F.max("o_totalprice"), 4).alias("hi"),
    )


SQL_SCALAR_QUANTILE_BINS = """
WITH b AS (
  SELECT o_totalprice,
         NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) - 1 AS price_q
  FROM orders
)
SELECT price_q, COUNT(*) AS n,
       ROUND(MIN(o_totalprice), 4) AS lo, ROUND(MAX(o_totalprice), 4) AS hi
FROM b GROUP BY price_q
"""


def q_text_bm25(spark, sf_dir):
    """BM25 top-5 per probe: every 100th document queries the full corpus
    through the inverted index (contamination-audit shape)."""
    from datamine_v2_0_spark.operators import retrieval as rt

    df = _t(spark, sf_dir, "documents")
    probes = df.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("qid"), F.col("text").alias("qtext")
    )
    return rt.bm25_topk(df, probes, "text", "doc_id", "qtext", "qid", k=5)


SQL_TEXT_BM25 = r"""
WITH tokens AS (
  SELECT doc_id,
         unnest(string_split(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g')),
                             ' ')) AS term
  FROM documents
), tok AS (
  SELECT doc_id, term FROM tokens WHERE term <> ''
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
), qterms AS (
  SELECT DISTINCT doc_id AS query_id, term FROM tok WHERE doc_id % 100 = 0
), scored AS (
  SELECT q.query_id, tf.doc_id,
         ROUND(SUM(
           LN(1.0 + (CAST(s.n_docs - d.df AS DOUBLE) + 0.5)
                    / (CAST(d.df AS DOUBLE) + 0.5))
           * (CAST(tf.tf AS DOUBLE) * 2.2)
           / (CAST(tf.tf AS DOUBLE)
              + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / s.avgdl))
         ), 6) AS score
  FROM tf
  JOIN qterms q USING (term)
  JOIN dfreq d USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
)
SELECT query_id, doc_id, score, CAST(rn AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
  FROM scored
) WHERE rn <= 5
"""


def q_qa_validate(spark, sf_dir):
    """Declarative data-quality report over lineitem: all scalar rules in
    ONE conditional aggregate on a single scan; the referential rule adds
    one broadcast anti-join branch."""
    from datamine_v2_0_spark.operators import quality as qa

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return qa.validate_table(li, [
        {"name": "shipdate_not_null", "kind": "not_null", "col": "l_shipdate"},
        {"name": "qty_range", "kind": "in_range", "col": "l_quantity",
         "lo": 1.0, "hi": 40.0},
        {"name": "returnflag_domain", "kind": "in_set", "col": "l_returnflag",
         "values": ["A", "N", "R"]},
        {"name": "linenumber_pos", "kind": "in_range", "col": "l_linenumber",
         "lo": 1, "hi": 3},
        {"name": "pk_unique", "kind": "unique",
         "cols": ["l_orderkey", "l_linenumber"]},
        {"name": "order_fk", "kind": "ref", "col": "l_orderkey",
         "dim": orders, "dim_col": "o_orderkey"},
    ])


SQL_QA_VALIDATE = """
SELECT 'shipdate_not_null' AS rule, 'not_null' AS kind,
       COUNT(*) FILTER (WHERE l_shipdate IS NULL) AS violations FROM lineitem
UNION ALL
SELECT 'qty_range', 'in_range',
       COUNT(*) FILTER (WHERE l_quantity IS NOT NULL
                        AND l_quantity NOT BETWEEN 1.0 AND 40.0) FROM lineitem
UNION ALL
SELECT 'returnflag_domain', 'in_set',
       COUNT(*) FILTER (WHERE l_returnflag IS NOT NULL
                        AND l_returnflag NOT IN ('A','N','R')) FROM lineitem
UNION ALL
SELECT 'linenumber_pos', 'in_range',
       COUNT(*) FILTER (WHERE l_linenumber IS NOT NULL
                        AND l_linenumber NOT BETWEEN 1 AND 3) FROM lineitem
UNION ALL
SELECT 'pk_unique', 'unique',
       COUNT(*) FILTER (WHERE l_orderkey IS NOT NULL
                        AND l_linenumber IS NOT NULL)
       - COUNT(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem
UNION ALL
SELECT 'order_fk', 'ref',
       COUNT(*) FILTER (WHERE l_orderkey IS NOT NULL
                        AND l_orderkey NOT IN (SELECT o_orderkey FROM orders))
FROM lineitem
"""


def q_ts_gapfill(spark, sf_dir):
    """time_bucket_gapfill + locf + interpolate (TimescaleDB family):
    per-user daily resample of the events value with gap buckets filled
    both ways. One bucket-agg shuffle, per-key sequence() grid (no
    driver collect), one shared window exchange."""
    from datamine_v2_0_spark.operators import timeseries as tsr

    df = _t(spark, sf_dir, "events")
    return tsr.resample_gapfill(df, ["user_id"], "ts", "value", 86400)


SQL_TS_GAPFILL = """
WITH vals AS (
  SELECT user_id,
         make_timestamp(CAST(floor(epoch(ts)/86400)*86400*1000000 AS BIGINT))
           AS bucket,
         floor(AVG(value) * 1e6 + 0.5) / 1e6 AS value
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx FROM vals GROUP BY 1
), grid AS (
  SELECT user_id,
         unnest(generate_series(mn, mx, INTERVAL 86400 SECONDS)) AS bucket
  FROM spans
), g AS (
  SELECT grid.user_id, grid.bucket, vals.value
  FROM grid LEFT JOIN vals
    ON vals.user_id = grid.user_id AND vals.bucket = grid.bucket
)
SELECT user_id, bucket, value,
  last_value(value IGNORE NULLS) OVER wp AS value_locf,
  CASE WHEN value IS NOT NULL THEN value
       ELSE floor((
         last_value(value IGNORE NULLS) OVER wp
         + (first_value(value IGNORE NULLS) OVER wn
            - last_value(value IGNORE NULLS) OVER wp)
           * (epoch(bucket)
              - last_value(CASE WHEN value IS NOT NULL THEN epoch(bucket) END
                           IGNORE NULLS) OVER wp)
           / (first_value(CASE WHEN value IS NOT NULL THEN epoch(bucket) END
                          IGNORE NULLS) OVER wn
              - last_value(CASE WHEN value IS NOT NULL THEN epoch(bucket) END
                           IGNORE NULLS) OVER wp)
         ) * 1e6 + 0.5) / 1e6 END AS value_interp
FROM g
WINDOW wp AS (PARTITION BY user_id ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       wn AS (PARTITION BY user_id ORDER BY bucket
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
"""


def q_scalar_json(spark, sf_dir):
    """Typed JSON path extraction over the events props column, rolled
    up per event type — the (props ->> 'k')::int shape."""
    from datamine_v2_0_spark.functions.scalars import json_extract_typed

    ev = _t(spark, sf_dir, "events")
    k = json_extract_typed(F.col("props"), "$.k", "int")
    return ev.groupBy("event_type").agg(
        F.count(k).alias("n_k"),
        F.sum(k).cast("long").alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        (F.floor(F.avg(k) * 1e6 + F.lit(0.5)) / 1e6).alias("avg_k"),
    )


SQL_SCALAR_JSON = """
SELECT event_type,
       COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS n_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
         AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
       floor(AVG(CAST(json_extract_string(props, '$.k') AS INT)) * 1e6 + 0.5)
         / 1e6 AS avg_k
FROM events GROUP BY event_type
"""


def q_win_rolling_corr(spark, sf_dir):
    """Trailing-100-row rolling Pearson correlation of value vs time per
    user — a windowed trend-strength signal. Epoch is re-based to the
    corpus start so both engines' co-moment accumulations stay
    well-conditioned; floor-quantized at 6 dp."""
    ev = _t(spark, sf_dir, "events")
    w = win.ordered_window(["user_id"], ["ts", "event_id"])
    x = (F.unix_micros("ts").cast("double") / 1e6) - F.lit(1704067200.0)
    c = win.rolling_corr(F.col("value"), x, w, 99, 0)
    return ev.select(
        "event_id",
        "user_id",
        (F.floor(c * 1e6 + F.lit(0.5)) / 1e6).alias("trend_corr"),
    )


SQL_WIN_ROLLING_CORR = """
SELECT event_id, user_id,
       floor(corr(value, epoch(ts) - 1704067200.0) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 99 PRECEDING AND CURRENT ROW
       ) * 1e6 + 0.5) / 1e6 AS trend_corr
FROM events
"""


def q_evt_funnel(spark, sf_dir):
    """Ordered view->click->purchase funnel: one fold over each user's
    sorted events (single shuffle) vs the oracle's k chained min-after-min
    passes — same semantics, k× less shuffle at scale."""
    from datamine_v2_0_spark.operators import events as ev

    df = _t(spark, sf_dir, "events")
    return ev.funnel_steps(df, ["view", "click", "purchase"], "user_id", "ts", "event_type")


SQL_EVT_FUNNEL = """
WITH t1 AS (
  SELECT user_id, MIN(ts) AS ts1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > t1.ts1 GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY e.user_id
)
SELECT CAST(0 AS INT) AS step, 'view' AS step_name, (SELECT COUNT(*) FROM t1) AS users
UNION ALL
SELECT CAST(1 AS INT), 'click', (SELECT COUNT(*) FROM t2)
UNION ALL
SELECT CAST(2 AS INT), 'purchase', (SELECT COUNT(*) FROM t3)
"""


def q_evt_cohort(spark, sf_dir):
    """Weekly cohort retention triangle over the events stream."""
    from datamine_v2_0_spark.operators import events as ev

    df = _t(spark, sf_dir, "events")
    return ev.cohort_retention(df, "user_id", "ts")


SQL_EVT_COHORT = """
WITH first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) / 7 AS INT)
         AS week_offset,
       COUNT(DISTINCT e.user_id) AS users
FROM events e JOIN first f USING (user_id)
GROUP BY 1, 2
"""


def q_text_tfidf(spark, sf_dir):
    df = _t(spark, sf_dir, "documents")
    return tx.tfidf_top_terms(df, "text", "doc_id", k=3)


SQL_TEXT_TFIDF = r"""
WITH tokens AS (
  SELECT doc_id,
         unnest(string_split(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g')),
                             ' ')) AS term
  FROM documents
), tok AS (
  SELECT doc_id, term FROM tokens WHERE term <> ''
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * (LN(CAST(n.n_docs + 1 AS DOUBLE) / (dfreq.df + 1)) + 1.0),
               6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) <= 3
"""


def q_text_quality(spark, sf_dir):
    """Corpus quality-filter signals (C4/Gopher-style): token count,
    punctuation ratio, stopword ratio, composite quality score — pure
    Column algebra, zero Python."""
    df = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return df.select(
        "doc_id",
        tx.token_count_ws(c).alias("n_tokens"),
        F.round(tx.punct_ratio(c), 6).alias("punct_ratio"),
        F.round(tx.stopword_ratio(c), 6).alias("stopword_ratio"),
        tx.quality_score(c).alias("quality"),
    )


SQL_TEXT_QUALITY = r"""
WITH t AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
         CASE WHEN len(text) > 0
              THEN len(regexp_extract_all(text, '[^\sA-Za-z0-9]'))
                   / CAST(len(text) AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS praw
  FROM documents
), s AS (
  SELECT doc_id, text, n_tokens, praw,
         CASE WHEN n_tokens > 0
              THEN len(regexp_extract_all(lower(text),
                       '\b(the|and|of|to|is|in|that|it|for|with)\b'))
                   / CAST(n_tokens AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS sraw
  FROM t
)
SELECT doc_id, n_tokens,
       ROUND(praw, 6) AS punct_ratio,
       ROUND(sraw, 6) AS stopword_ratio,
       ROUND((LEAST(len(text) / CAST(500.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
              + LEAST(sraw * CAST(4.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
              + GREATEST(CAST(0.0 AS DOUBLE),
                         CAST(1.0 AS DOUBLE) - praw * CAST(4.0 AS DOUBLE)))
             / CAST(3.0 AS DOUBLE), 6) AS quality
FROM s
"""


def q_text_redact(spark, sf_dir):
    """PII scrub over text with deterministic injected PII (the synthetic
    corpus has none, so the query plants an email/URL/phone per doc from
    doc_id and redacts — exercising every rule for real)."""
    df = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    dirty = F.concat(
        F.lit("u"), sid, F.lit("@example.com said: "), F.col("text"),
        F.lit(" see https://ex.org/d/"), sid,
        F.lit(" or call +1 555-000-"), sid,
    )
    return df.select("doc_id", tx.redact_pii(dirty).alias("redacted"))


SQL_TEXT_REDACT = r"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(
           'u' || CAST(doc_id AS VARCHAR) || '@example.com said: ' || text
               || ' see https://ex.org/d/' || CAST(doc_id AS VARCHAR)
               || ' or call +1 555-000-' || CAST(doc_id AS VARCHAR),
           'https?://\S+', '<URL>', 'g'),
           '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\+?\d[\d\-\s()]{7,}\d', '<PHONE>', 'g') AS redacted
FROM documents
"""


def q_text_ngrams(spark, sf_dir):
    """Corpus bigram vocabulary: top-20 by occurrence count."""
    df = _t(spark, sf_dir, "documents")
    return tx.top_ngrams(df, "text", n=2, k=20)


SQL_TEXT_NGRAMS = r"""
WITH norm AS (
  SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), grams AS (
  SELECT unnest([w[i] || ' ' || w[i+1]
                 for i in generate_series(1, len(w) - 1)]) AS ngram
  FROM norm WHERE len(w) >= 2
)
SELECT ngram, COUNT(*) AS n_occur FROM grams
GROUP BY ngram ORDER BY n_occur DESC, ngram LIMIT 20
"""


def q_text_chunks(spark, sf_dir):
    """Overlapping context-window chunking: 24-token windows, 8-token
    overlap (stride 16); last window reaches the doc end."""
    df = _t(spark, sf_dir, "documents")
    return tx.chunk_documents(df, "text", "doc_id", chunk_tokens=24, overlap=8)


SQL_TEXT_CHUNKS = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
  FROM documents
  WHERE len(trim(regexp_replace(text, '\s+', ' ', 'g'))) > 0
), sized AS (
  SELECT doc_id, w, len(w) AS n,
         CASE WHEN len(w) <= 24 THEN 1
              ELSE CAST(CEIL((len(w) - 24) / CAST(16 AS DOUBLE)) + 1 AS INTEGER)
         END AS nw
  FROM norm
), ex AS (
  SELECT doc_id, w, n, unnest(range(0, nw)) AS chunk_idx FROM sized
)
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       array_to_string(w[chunk_idx * 16 + 1 : chunk_idx * 16 + 24], ' ')
           AS chunk_text,
       CAST(LEAST(24, n - chunk_idx * 16) AS INTEGER) AS n_tokens
FROM ex
"""


def q_text_packed(spark, sf_dir):
    """Chunk -> shard -> first-fit-decreasing sequence packing (stateful
    greedy inside applyInPandas — genuinely non-SQL, rows-only check;
    invariants are pytest-enforced in test_binning_text)."""
    df = _t(spark, sf_dir, "documents")
    chunks = tx.chunk_documents(df, "text", "doc_id", chunk_tokens=24, overlap=8)
    sharded = chunks.withColumn("shard", F.pmod(F.col("doc_id"), F.lit(8)))
    return tx.pack_chunks(
        sharded, "shard", ["doc_id", "chunk_idx"], "n_tokens", capacity=64
    )


def q_text_packed_nextfit(spark, sf_dir):
    """Order-preserving next-fit sequence packing over the chunked
    corpus; the sequential bin recurrence is replayed exactly by a
    DuckDB recursive CTE, making this the oracle-checked packing
    variant (FFD reorders by size and stays rows-only)."""
    df = _t(spark, sf_dir, "documents")
    chunks = tx.chunk_documents(df, "text", "doc_id", chunk_tokens=24, overlap=8)
    sharded = chunks.withColumn("shard", F.pmod(F.col("doc_id"), F.lit(8)))
    return tx.pack_chunks_nextfit(
        sharded, "shard", ["doc_id", "chunk_idx"], "n_tokens", capacity=64
    )


SQL_TEXT_PACKED_NEXTFIT = r"""
WITH RECURSIVE norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
  FROM documents
  WHERE len(trim(regexp_replace(text, '\s+', ' ', 'g'))) > 0
), sized AS (
  SELECT doc_id, len(w) AS n,
         CASE WHEN len(w) <= 24 THEN 1
              ELSE CAST(CEIL((len(w) - 24) / CAST(16 AS DOUBLE)) + 1 AS INTEGER)
         END AS nw
  FROM norm
), ex AS (
  SELECT doc_id, n, unnest(range(0, nw)) AS chunk_idx FROM sized
), items AS (
  SELECT CAST(doc_id % 8 AS BIGINT) AS shard, doc_id,
         CAST(chunk_idx AS INTEGER) AS chunk_idx,
         CAST(LEAST(24, n - chunk_idx * 16) AS INTEGER) AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY doc_id % 8
                            ORDER BY doc_id, chunk_idx) AS rn
  FROM ex
), packed AS (
  SELECT shard, doc_id, chunk_idx, n_tokens, rn,
         CAST(1 AS BIGINT) AS bin_id, CAST(n_tokens AS BIGINT) AS fill
  FROM items WHERE rn = 1
  UNION ALL
  SELECT i.shard, i.doc_id, i.chunk_idx, i.n_tokens, i.rn,
         CASE WHEN p.fill + i.n_tokens <= 64 THEN p.bin_id
              ELSE p.bin_id + 1 END,
         CASE WHEN p.fill + i.n_tokens <= 64 THEN p.fill + i.n_tokens
              ELSE CAST(i.n_tokens AS BIGINT) END
  FROM packed p JOIN items i ON i.shard = p.shard AND i.rn = p.rn + 1
)
SELECT shard, doc_id, chunk_idx, n_tokens, bin_id FROM packed
"""


def q_dedup_exact_keep(spark, sf_dir):
    df = _t(spark, sf_dir, "documents")
    return dd.exact_dedup(df, "text", "doc_id").select("doc_id")


SQL_DEDUP_EXACT_KEEP = r"""
SELECT doc_id FROM documents
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY sha256(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g')))
    ORDER BY doc_id) = 1
"""


def q_text_repetition(spark, sf_dir):
    """Gopher-style per-doc repetition signals: duplicate-word fraction,
    duplicate-word char fraction, top-bigram char fraction."""
    df = _t(spark, sf_dir, "documents")
    return tx.repetition_signals(df, "text", "doc_id")


SQL_TEXT_REPETITION = r"""
WITH norm AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
  FROM documents WHERE len(trim(text)) > 0
), u AS (
  SELECT doc_id, unnest(w) AS unit FROM norm
), pu AS (
  SELECT doc_id, unit, COUNT(*) AS c FROM u GROUP BY doc_id, unit
), du AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_units,
         CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_f,
         CAST(SUM((c - 1) * len(unit)) AS DOUBLE)
             / CAST(SUM(c * len(unit)) AS DOUBLE) AS dupc_f,
         CAST(SUM(c * len(unit)) AS BIGINT) AS total_chars
  FROM pu GROUP BY doc_id
), g AS (
  SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
                 for i in generate_series(1, len(w) - 1)]) AS gram
  FROM norm WHERE len(w) >= 2
), pg AS (
  SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram
), tg AS (
  SELECT doc_id, gram, c,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY c DESC, gram DESC) AS rn
  FROM pg
)
SELECT du.doc_id, du.n_units,
       ROUND(du.dup_f, 6) AS dup_unit_frac,
       ROUND(du.dupc_f, 6) AS dup_unit_char_frac,
       ROUND(COALESCE(
           CAST(t.c * (len(t.gram) - 1) AS DOUBLE)
               / CAST(du.total_chars AS DOUBLE),
           0.0), 6) AS top_bigram_char_frac
FROM du LEFT JOIN (SELECT doc_id, gram, c FROM tg WHERE rn = 1) t
  USING (doc_id)
"""


def q_text_decontaminate(spark, sf_dir):
    """Benchmark decontamination: docs with doc_id % 29 == 0 act as the
    eval set; every remaining (training) doc is scored by distinct
    4-gram overlap with it. Eval grams broadcast; train side never
    shuffles its exploded grams."""
    df = _t(spark, sf_dir, "documents")
    ev = df.filter(F.col("doc_id") % 29 == 0)
    tr = df.filter(F.col("doc_id") % 29 != 0)
    return tx.decontaminate(tr, ev, "text", "doc_id", n=4)


SQL_TEXT_DECONTAMINATE = r"""
WITH norm AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
  FROM documents WHERE len(trim(text)) > 0
), g AS (
  SELECT doc_id, unnest(list_distinct([array_to_string(w[i:i+3], ' ')
                 for i in generate_series(1, len(w) - 3)])) AS gram
  FROM norm WHERE len(w) >= 4
), eg AS (
  SELECT DISTINCT gram FROM g WHERE doc_id % 29 = 0
), h AS (
  SELECT g.doc_id, COUNT(*) AS n_hits
  FROM g JOIN eg USING (gram)
  WHERE g.doc_id % 29 <> 0
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_eval_grams,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN h USING (doc_id)
WHERE d.doc_id % 29 <> 0
"""


def q_dedup_lines(spark, sf_dir):
    """Corpus-frequency unit removal (RefinedWeb line-dedup generalized
    to a configurable unit): drop every word occurring in >= 60% of all
    docs (corpus-adaptive boilerplate scrub on the newline-free
    synthetic corpus), reassemble docs preserving order."""
    df = _t(spark, sf_dir, "documents")
    return dd.remove_common_units(
        df, "text", "doc_id", min_doc_frac=0.6, delim=r"\s+", joiner=" "
    )


SQL_DEDUP_LINES = r"""
WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS u
  FROM documents WHERE len(trim(text)) > 0
), units AS (
  SELECT doc_id, unnest(u) AS unit,
         unnest(generate_series(1, len(u))) AS pos
  FROM base
), tot AS (
  SELECT COUNT(*) AS n_docs FROM base
), freq AS (
  SELECT unit, COUNT(DISTINCT doc_id) AS nd FROM units GROUP BY unit
), common AS (
  SELECT unit FROM freq, tot WHERE nd >= n_docs * 0.6
), kept AS (
  SELECT * FROM units WHERE unit NOT IN (SELECT unit FROM common)
), clean AS (
  SELECT doc_id, string_agg(unit, ' ' ORDER BY pos) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       COALESCE(c.clean_text, '') AS clean_text,
       CAST(len(b.u) - COALESCE(c.n_kept, 0) AS BIGINT) AS n_removed
FROM base b LEFT JOIN clean c USING (doc_id)
"""


def q_filt_token_budget(spark, sf_dir):
    """Training-mix assembly: fill a 500-token budget per source in
    portable pseudorandom order (Knuth multiplicative hash of doc_id)."""
    df = _t(spark, sf_dir, "documents")
    t = df.select(
        "doc_id", "source", tx.token_count_ws(F.col("text")).alias("n_tokens")
    )
    return flt.sample_to_token_budget(
        t, "source", "n_tokens", "doc_id", budget=500
    )


SQL_FILT_TOKEN_BUDGET = r"""
WITH t AS (
  SELECT doc_id, source,
         CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
  FROM documents
), o AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (
             PARTITION BY source
             ORDER BY (doc_id % 1000000007) * 2654435761 % 4294967296,
                      doc_id) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens, cum_tokens
FROM o WHERE cum_tokens - n_tokens < 500
"""


def q_filt_balance_strata(spark, sf_dir):
    """Deterministic corpus balancing: every language downsampled to the
    smallest language's count, keeping lowest doc_ids."""
    df = _t(spark, sf_dir, "documents")
    return flt.balance_strata(df, "lang", "doc_id").select(
        "doc_id", "lang", "source"
    )


SQL_FILT_BALANCE_STRATA = r"""
WITH c AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
), m AS (
  SELECT MIN(n) AS mn FROM c
), r AS (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang, source FROM r, m WHERE rn <= mn
"""


def q_text_quality_gate(spark, sf_dir):
    """Gopher/MassiveText document-quality gate: per-doc signals (word
    count, mean word length, symbol ratio, alpha-word fraction,
    bullet/ellipsis line fractions, required-stopword count) plus the
    published threshold verdict. The synthetic corpus has no bullets or
    ellipses, so the query plants them deterministically from doc_id —
    every rule fires for real on some slice of the data."""
    df = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id")
    staged = F.concat(
        F.when(sid % 3 == 0, F.lit("- bullet item\n")).otherwise(F.lit("")),
        F.col("text"),
        F.when(sid % 5 == 0, F.lit("\nto be continued...")).otherwise(
            F.lit("")
        ),
        F.when(sid % 7 == 0, F.lit(" ## #")).otherwise(F.lit("")),
    )
    base = df.select("doc_id", staged.alias("text"))
    return tx.gopher_gate(base, "text", "doc_id", min_words=10)


SQL_TEXT_QUALITY_GATE = r"""
WITH staged AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 3 = 0 THEN '- bullet item' || chr(10) ELSE '' END)
         || text
         || (CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'to be continued...' ELSE '' END)
         || (CASE WHEN doc_id % 7 = 0 THEN ' ## #' ELSE '' END) AS text
  FROM documents
), base AS (
  SELECT doc_id, text,
         CASE WHEN len(trim(text)) > 0
              THEN string_split_regex(trim(text), '\s+')
              ELSE [] END AS w,
         string_split(text, chr(10)) AS l
  FROM staged
), sig AS (
  SELECT doc_id,
         len(w) AS n_words,
         ROUND(CASE WHEN len(w) > 0
               THEN list_aggregate(list_transform(w, x -> length(x)), 'sum')
                    / CAST(len(w) AS DOUBLE) ELSE 0.0 END, 6) AS mean_word_len,
         ROUND(CASE WHEN len(w) > 0
               THEN (len(regexp_extract_all(text, '#'))
                     + len(regexp_extract_all(text, '(\.\.\.|…)')))
                    / CAST(len(w) AS DOUBLE) ELSE 0.0 END, 6) AS symbol_word_ratio,
         ROUND(CASE WHEN len(w) > 0
               THEN len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                    / CAST(len(w) AS DOUBLE) ELSE 0.0 END, 6) AS alpha_word_frac,
         ROUND(CASE WHEN len(l) > 0
               THEN len(list_filter(l, x -> regexp_matches(trim(x), '^[-*•]')))
                    / CAST(len(l) AS DOUBLE) ELSE 0.0 END, 6) AS bullet_line_frac,
         ROUND(CASE WHEN len(l) > 0
               THEN len(list_filter(l, x -> regexp_matches(trim(x), '(\.\.\.|…)$')))
                    / CAST(len(l) AS DOUBLE) ELSE 0.0 END, 6) AS ellipsis_line_frac,
         len(list_intersect(list_distinct(list_transform(w, x -> lower(x))),
             ['the','be','to','of','and','that','have','with'])) AS n_required_stopwords
  FROM base
)
SELECT doc_id, n_words, mean_word_len, symbol_word_ratio, alpha_word_frac,
       bullet_line_frac, ellipsis_line_frac, n_required_stopwords,
       (n_words >= 10 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_word_ratio <= 0.1
        AND bullet_line_frac <= 0.9
        AND ellipsis_line_frac <= 0.3
        AND alpha_word_frac >= 0.8
        AND n_required_stopwords >= 2) AS passes
FROM sig
"""


def q_text_lm_score(spark, sf_dir):
    """Corpus-self-trained unigram LM score per document (CCNet-style
    perplexity filtering, cheapest member): mean log10 word probability
    under the corpus unigram distribution."""
    df = _t(spark, sf_dir, "documents")
    return tx.unigram_logprob(df, "text", "doc_id")


SQL_TEXT_LM_SCORE = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
  FROM documents WHERE len(trim(text)) > 0
), counted AS (
  SELECT doc_id, COUNT(*) OVER (PARTITION BY w) AS c FROM toks
), per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         AVG(log10(CAST(c AS DOUBLE))) AS avg_log_c
  FROM counted GROUP BY doc_id
), tot AS (
  SELECT CAST(SUM(n_words) AS DOUBLE) AS tot FROM per_doc
)
SELECT doc_id, n_words,
       ROUND(avg_log_c - log10(tot), 6) AS avg_logp
FROM per_doc CROSS JOIN tot
"""


def q_agg_grouping_sets(spark, sf_dir):
    """Arbitrary GROUPING SETS (beyond rollup/cube): per-returnflag and
    per-linestatus marginals in one pass, with grouping ids to
    disambiguate the NULL rows."""
    df = _t(spark, sf_dir, "lineitem")
    return df.groupingSets(
        [["l_returnflag"], ["l_linestatus"]],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.grouping_id("l_returnflag", "l_linestatus").cast("long").alias("gid"),
    )


SQL_AGG_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


def q_filt_shuffle_shards(spark, sf_dir):
    """Deterministic corpus shuffle for training-order assembly:
    seeded-hash shard + intra-shard position (the scale-correct 'ORDER
    BY random()' — hash exchange + per-shard sorts, never one global
    range sort)."""
    df = _t(spark, sf_dir, "documents")
    return flt.shard_shuffle(df, "doc_id", n_shards=8, seed=7).select(
        "doc_id", "shard", "pos"
    )


SQL_FILT_SHUFFLE_SHARDS = """
WITH h AS (
  SELECT doc_id,
         ((doc_id % 1000000007) * 2654435761 + 7) % 4294967296 AS hh
  FROM documents
)
SELECT doc_id, CAST(hh % 8 AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id)
            AS BIGINT) AS pos
FROM h
"""


def q_filt_hash_split(spark, sf_dir):
    """Deterministic 90/5/5 train/valid/test assignment by seeded
    hashed id — disjoint, exhaustive, stable across runs and cluster
    sizes; a pure projection with zero exchanges."""
    df = _t(spark, sf_dir, "documents")
    return flt.hash_split(df, "doc_id", seed=3).select("doc_id", "split")


SQL_FILT_HASH_SPLIT = """
WITH h AS (
  SELECT doc_id,
         (((doc_id % 1000000007) * 2654435761 + 3) % 4294967296)
             / 4294967296.0 AS u
  FROM documents
)
SELECT doc_id,
       CASE WHEN u < 0.9 THEN 'train'
            WHEN u < 0.95 THEN 'valid'
            ELSE 'test' END AS split
FROM h
"""


def q_filt_weighted_mix(spark, sf_dir):
    """Training-mixture sampling: per-language keep rates decided by
    seeded id hash (en down-weighted, others kept whole/partial) — the
    rate table folds into the plan as a literal CASE, no join."""
    df = _t(spark, sf_dir, "documents")
    return flt.weighted_mix(
        df,
        "lang",
        {"en": 0.5, "de": 1.0, "fr": 0.75},
        "doc_id",
        seed=11,
        default_rate=0.25,
    ).select("doc_id", "lang")


SQL_FILT_WEIGHTED_MIX = """
WITH h AS (
  SELECT doc_id, lang,
         (((doc_id % 1000000007) * 2654435761 + 11) % 4294967296)
             / 4294967296.0 AS u
  FROM documents
)
SELECT doc_id, lang FROM h
WHERE u < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0
                    WHEN 'fr' THEN 0.75 ELSE 0.25 END
"""


def q_text_bpe(spark, sf_dir):
    """Learned BPE tokenization end-to-end: train 30 merges from the
    corpus word-frequency table (one groupBy; driver loop is
    corpus-size-independent), broadcast the ranks, tokenize every doc
    with the cached Arrow-batched apply kernel. Genuinely non-SQL
    (iterative merge learning) → rows-only check; semantics are pinned
    by hand-verified merge tests and the reconstruction invariant
    (tests/test_bpe.py)."""
    df = _t(spark, sf_dir, "documents")
    merges = bpe.train_bpe(df, "text", num_merges=30)
    return bpe.apply_bpe(df, "text", "doc_id", merges).select(
        "doc_id", "n_tokens"
    )


def q_pipeline_curation(spark, sf_dir):
    """The canonical pre-training curation chain end-to-end: Gopher
    quality gate → exact dedup (keep lowest id) → 4-gram
    decontamination against the doc_id %% 29 == 0 eval slice → token /
    quality stats for the survivors. One lazy lineage, four narrow
    shuffles total (dedup groupBy + semi join, decontamination hit-agg
    + semi join); the gate and the final stats are exchange-free
    codegen."""
    df = _t(spark, sf_dir, "documents")
    ev = df.filter(F.col("doc_id") % 29 == 0)
    tr = df.filter(F.col("doc_id") % 29 != 0)
    # min_stopwords=1: the synthetic corpus draws from a tech vocabulary
    # where only ~half the docs contain a Gopher-required stopword at
    # all; 1 keeps the rule live without making the gate vacuous.
    return curate_corpus(
        tr, ev, "text", "doc_id", min_words=10, ngram=4, min_stopwords=1
    )


SQL_PIPELINE_CURATION = r"""
WITH train AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 29 <> 0
), evaldocs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 29 = 0
), base AS (
  SELECT doc_id, text,
         CASE WHEN len(trim(text)) > 0
              THEN string_split_regex(trim(text), '\s+')
              ELSE [] END AS w,
         string_split(text, chr(10)) AS l
  FROM train
), sig AS (
  SELECT doc_id, text,
         len(w) AS n_words,
         ROUND(CASE WHEN len(w) > 0
               THEN list_aggregate(list_transform(w, x -> length(x)), 'sum')
                    / CAST(len(w) AS DOUBLE) ELSE 0.0 END, 6) AS mean_word_len,
         ROUND(CASE WHEN len(w) > 0
               THEN (len(regexp_extract_all(text, '#'))
                     + len(regexp_extract_all(text, '(\.\.\.|…)')))
                    / CAST(len(w) AS DOUBLE) ELSE 0.0 END, 6) AS symbol_word_ratio,
         ROUND(CASE WHEN len(w) > 0
               THEN len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                    / CAST(len(w) AS DOUBLE) ELSE 0.0 END, 6) AS alpha_word_frac,
         ROUND(CASE WHEN len(l) > 0
               THEN len(list_filter(l, x -> regexp_matches(trim(x), '^[-*•]')))
                    / CAST(len(l) AS DOUBLE) ELSE 0.0 END, 6) AS bullet_line_frac,
         ROUND(CASE WHEN len(l) > 0
               THEN len(list_filter(l, x -> regexp_matches(trim(x), '(\.\.\.|…)$')))
                    / CAST(len(l) AS DOUBLE) ELSE 0.0 END, 6) AS ellipsis_line_frac,
         len(list_intersect(list_distinct(list_transform(w, x -> lower(x))),
             ['the','be','to','of','and','that','have','with'])) AS n_stop
  FROM base
), passed AS (
  SELECT doc_id, text FROM sig
  WHERE n_words >= 10 AND n_words <= 100000
    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
    AND symbol_word_ratio <= 0.1
    AND bullet_line_frac <= 0.9
    AND ellipsis_line_frac <= 0.3
    AND alpha_word_frac >= 0.8
    AND n_stop >= 1
), keepers AS (
  SELECT MIN(doc_id) AS doc_id
  FROM passed
  GROUP BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
), deduped AS (
  SELECT p.doc_id, p.text FROM passed p JOIN keepers k USING (doc_id)
), dgrams AS (
  SELECT doc_id,
         unnest(list_distinct([array_to_string(w[i:i+3], ' ')
                for i in generate_series(1, len(w) - 3)])) AS gram
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM deduped WHERE len(trim(text)) > 0)
  WHERE len(w) >= 4
), egrams AS (
  SELECT DISTINCT unnest(list_distinct([array_to_string(w[i:i+3], ' ')
                for i in generate_series(1, len(w) - 3)])) AS gram
  FROM (SELECT string_split_regex(trim(text), '\s+') AS w
        FROM evaldocs WHERE len(trim(text)) > 0)
  WHERE len(w) >= 4
), dirty AS (
  SELECT DISTINCT dg.doc_id FROM dgrams dg JOIN egrams USING (gram)
), clean AS (
  SELECT d.doc_id, d.text FROM deduped d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM dirty)
), stats AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
         CASE WHEN len(text) > 0
              THEN len(regexp_extract_all(text, '[^\sA-Za-z0-9]'))
                   / CAST(len(text) AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS praw
  FROM clean
), stats2 AS (
  SELECT doc_id, text, n_tokens, praw,
         CASE WHEN n_tokens > 0
              THEN len(regexp_extract_all(lower(text),
                       '\b(the|and|of|to|is|in|that|it|for|with)\b'))
                   / CAST(n_tokens AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS sraw
  FROM stats
)
SELECT doc_id, n_tokens,
       ROUND((LEAST(len(text) / CAST(500.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
              + LEAST(sraw * CAST(4.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
              + GREATEST(CAST(0.0 AS DOUBLE),
                         CAST(1.0 AS DOUBLE) - praw * CAST(4.0 AS DOUBLE)))
             / CAST(3.0 AS DOUBLE), 6) AS quality
FROM stats2
"""


# ---------------------------------------------------------------- registry

# Registry order is deliberate: the driver's CORRECTNESS gate checks the
# FIRST 50 entries in insertion order, so each round the window rotates
# to maximize cumulative driver-green coverage (r3 verdict, tasks 1+5):
#   1. the 16 oracle-backed queries that have NEVER had a driver row in
#      any round (they sat at slots 51-66 in r3) come first;
#   2. new round-4 operators follow (they need their first driver row);
#   3. then the r2-green core whose driver evidence is two rounds old —
#      re-proving the families most users touch (aggregates, windows,
#      joins, filters, scalars, exact dedup);
#   4. everything green in CORRECTNESS_r03 moves past slot 50 — its
#      r3 driver evidence stands;
#   5. the genuinely non-SQL entries (cpd_candidates: PELT changepoints;
#      agg_approx: sketch internals; FFD packing; BPE; HLL binaries)
#      sit last so they never displace an oracle-checkable slot.
QUERIES: dict[str, tuple] = {
    # --- never driver-checked in r2 or r3: certify this round -----------
    "agg_incremental": (q_agg_incremental, SQL_AGG_TUMBLING),
    "dedup_simhash": (q_dedup_simhash, SQL_DEDUP_SIMHASH),
    "dedup_exact_keep": (q_dedup_exact_keep, SQL_DEDUP_EXACT_KEEP),
    "agg_describe": (q_agg_describe, SQL_AGG_DESCRIBE),
    "sql_views": (q_sql_views, SQL_SQL_VIEWS),
    "scalar_quantile_bins": (q_scalar_quantile_bins, SQL_SCALAR_QUANTILE_BINS),
    "agg_salted": (q_agg_salted, SQL_AGG_SALTED),
    "join_asof_backward": (q_join_asof_backward, SQL_JOIN_ASOF_BACKWARD),
    "text_redact": (q_text_redact, SQL_TEXT_REDACT),
    "eda_movement": (q_eda_movement, SQL_EDA_MOVEMENT),
    "scalar_wkt": (q_scalar_wkt, SQL_SCALAR_WKT),
    "scalar_binning": (q_scalar_binning, SQL_SCALAR_BINNING),
    "filt_weighted_mix": (q_filt_weighted_mix, SQL_FILT_WEIGHTED_MIX),
    "win_range_frame": (q_win_range_frame, SQL_WIN_RANGE_FRAME),
    "win_minmax_flags": (q_win_minmax_flags, SQL_WIN_MINMAX_FLAGS),
    "agg_cube": (q_agg_cube, SQL_AGG_CUBE),
    # --- new in r4: first driver row needed ------------------------------
    "dedup_substring": (q_dedup_substring, SQL_DEDUP_SUBSTRING),
    "dedup_substring_strip": (q_dedup_substring_strip, SQL_DEDUP_SUBSTRING_STRIP),
    # --- r2-green core: driver evidence 2 rounds old, re-prove ----------
    "agg_global_stats": (q_agg_global_stats, SQL_AGG_GLOBAL_STATS),
    "agg_grouped_stats": (q_agg_grouped_stats, SQL_AGG_GROUPED_STATS),
    "agg_percentiles": (q_agg_percentiles, SQL_AGG_PERCENTILES),
    "agg_tumbling": (q_agg_tumbling, SQL_AGG_TUMBLING),
    "win_lag_delta": (q_win_lag_delta, SQL_WIN_LAG_DELTA),
    "win_rolling": (q_win_rolling, SQL_WIN_ROLLING),
    "win_ffill": (q_win_ffill, SQL_WIN_FFILL),
    "win_savgol": (q_win_savgol, SQL_WIN_SAVGOL),
    "join_equi_revenue": (q_join_equi_revenue, SQL_JOIN_EQUI_REVENUE),
    "join_asof": (q_join_asof, SQL_JOIN_ASOF),
    "join_interval": (q_join_interval, SQL_JOIN_INTERVAL),
    "join_overlap": (q_join_overlap, SQL_JOIN_OVERLAP),
    "join_upsert": (q_join_upsert, SQL_JOIN_UPSERT),
    "filt_project_range": (q_filt_project_range, SQL_FILT_PROJECT_RANGE),
    "sort_topk": (q_sort_topk, SQL_SORT_TOPK),
    "scalar_hash_id": (q_scalar_hash_id, SQL_SCALAR_HASH_ID),
    "scalar_silver": (q_scalar_silver, SQL_SCALAR_SILVER),
    "scalar_position": (q_scalar_position, SQL_SCALAR_POSITION),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_jaccard_inverted": (q_dedup_jaccard_inverted, SQL_DEDUP_JACCARD_INVERTED),
    "agg_conditional": (q_agg_conditional, SQL_AGG_CONDITIONAL),
    "agg_date_distribution": (q_agg_date_distribution, SQL_AGG_DATE_DISTRIBUTION),
    "agg_freq_topk": (q_agg_freq_topk, SQL_AGG_FREQ_TOPK),
    "agg_hourly_profile": (q_agg_hourly_profile, SQL_AGG_HOURLY_PROFILE),
    "agg_having": (q_agg_having, SQL_AGG_HAVING),
    "agg_ordered_array": (q_agg_ordered_array, SQL_AGG_ORDERED_ARRAY),
    "agg_distinct": (q_agg_distinct, SQL_AGG_DISTINCT),
    "agg_integrity": (q_agg_integrity, SQL_AGG_INTEGRITY),
    "agg_fraction": (q_agg_fraction, SQL_AGG_FRACTION),
    "agg_pivot": (q_agg_pivot, SQL_AGG_PIVOT),
    "win_partition_stddev": (q_win_partition_stddev, SQL_WIN_PARTITION_STDDEV),
    "win_running_sum": (q_win_running_sum, SQL_WIN_RUNNING_SUM),
    "win_diff_shift": (q_win_diff_shift, SQL_WIN_DIFF_SHIFT),
    "join_anti": (q_join_anti, SQL_JOIN_ANTI),
    # ------------------- slot 51+ (r2-green evidence) -------------------
    "join_semi": (q_join_semi, SQL_JOIN_SEMI),
    "join_lookup": (q_join_lookup, SQL_JOIN_LOOKUP),
    "filt_clamp": (q_filt_clamp, SQL_FILT_CLAMP),
    "filt_sample_mod": (q_filt_sample_mod, SQL_FILT_SAMPLE_MOD),
    "filt_between_isin": (q_filt_between_isin, SQL_FILT_BETWEEN_ISIN),
    "set_union": (q_set_union, SQL_SET_UNION),
    "set_intersect": (q_set_intersect, SQL_SET_INTERSECT),
    "set_except": (q_set_except, SQL_SET_EXCEPT),
    "text_tokens": (q_text_tokens, SQL_TEXT_TOKENS),
    "text_lang": (q_text_lang, SQL_TEXT_LANG),
    "text_fingerprint": (q_text_fingerprint, SQL_TEXT_FINGERPRINT),
    # --- green in CORRECTNESS_r03 (driver evidence 1 round old) ---------
    "pipeline_silver": (q_pipeline_silver, SQL_PIPELINE_SILVER),
    "pipeline_features": (q_pipeline_features, SQL_PIPELINE_FEATURES),
    "dedup_embedding": (q_dedup_embedding, SQL_DEDUP_EMBEDDING),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, SQL_DEDUP_MINHASH_LSH),
    "dedup_jaccard": (q_dedup_jaccard, SQL_DEDUP_JACCARD_INVERTED),
    "dedup_simhash_pairs": (q_dedup_simhash_pairs, SQL_DEDUP_SIMHASH_PAIRS),
    "dedup_groups": (q_dedup_groups, SQL_DEDUP_GROUPS),
    "dedup_canonical": (q_dedup_canonical, SQL_DEDUP_CANONICAL),
    "dedup_against": (q_dedup_against, SQL_DEDUP_AGAINST),
    "dedup_containment": (q_dedup_containment, SQL_DEDUP_CONTAINMENT),
    "sim_cosine_topk": (q_sim_cosine_topk, SQL_SIM_COSINE_TOPK),
    "sim_bucketed_topk": (q_sim_bucketed_topk, SQL_SIM_BUCKETED_TOPK),
    "sim_lsh_topk": (q_sim_lsh_topk, SQL_SIM_COSINE_TOPK),
    "sim_ivf_topk": (q_sim_ivf_topk, SQL_SIM_COSINE_TOPK),
    "sim_pq_topk": (q_sim_pq_topk, SQL_SIM_COSINE_TOPK),
    "mm_features": (q_mm_features, SQL_MM_FEATURES),
    "mm_frames": (q_mm_frames, SQL_MM_FRAMES),
    "text_tfidf": (q_text_tfidf, SQL_TEXT_TFIDF),
    "text_bm25": (q_text_bm25, SQL_TEXT_BM25),
    "evt_funnel": (q_evt_funnel, SQL_EVT_FUNNEL),
    "evt_cohort": (q_evt_cohort, SQL_EVT_COHORT),
    "ts_gapfill": (q_ts_gapfill, SQL_TS_GAPFILL),
    "qa_validate": (q_qa_validate, SQL_QA_VALIDATE),
    "agg_hopping": (q_agg_hopping, SQL_AGG_HOPPING),
    "agg_mad": (q_agg_mad, SQL_AGG_MAD),
    "join_range_bin": (q_join_range_bin, SQL_JOIN_RANGE_BIN),
    "join_asof_merge": (q_join_asof_merge, SQL_JOIN_ASOF_MERGE),
    "scalar_json": (q_scalar_json, SQL_SCALAR_JSON),
    "win_rolling_corr": (q_win_rolling_corr, SQL_WIN_ROLLING_CORR),
    "text_quality": (q_text_quality, SQL_TEXT_QUALITY),
    "text_ngrams": (q_text_ngrams, SQL_TEXT_NGRAMS),
    "text_chunks": (q_text_chunks, SQL_TEXT_CHUNKS),
    "text_packed_nextfit": (q_text_packed_nextfit, SQL_TEXT_PACKED_NEXTFIT),
    "agg_rollup": (q_agg_rollup, SQL_AGG_ROLLUP),
    "join_salted": (q_join_salted, SQL_JOIN_SALTED),
    "join_interval_priority": (q_join_interval_priority, SQL_JOIN_INTERVAL_PRIORITY),
    "win_rank_family": (q_win_rank_family, SQL_WIN_RANK_FAMILY),
    "win_sessionize": (q_win_sessionize, SQL_WIN_SESSIONIZE),
    "filt_shuffle_shards": (q_filt_shuffle_shards, SQL_FILT_SHUFFLE_SHARDS),
    "filt_hash_split": (q_filt_hash_split, SQL_FILT_HASH_SPLIT),
    "text_repetition": (q_text_repetition, SQL_TEXT_REPETITION),
    "text_decontaminate": (q_text_decontaminate, SQL_TEXT_DECONTAMINATE),
    "dedup_lines": (q_dedup_lines, SQL_DEDUP_LINES),
    "filt_balance_strata": (q_filt_balance_strata, SQL_FILT_BALANCE_STRATA),
    "filt_token_budget": (q_filt_token_budget, SQL_FILT_TOKEN_BUDGET),
    "pipeline_curation": (q_pipeline_curation, SQL_PIPELINE_CURATION),
    "text_quality_gate": (q_text_quality_gate, SQL_TEXT_QUALITY_GATE),
    "text_lm_score": (q_text_lm_score, SQL_TEXT_LM_SCORE),
    "agg_grouping_sets": (q_agg_grouping_sets, SQL_AGG_GROUPING_SETS),
    "win_blocks": (q_win_blocks, SQL_WIN_BLOCKS),
    # --- genuinely non-SQL (rows-only check): keep these LAST -----------
    "cpd_candidates": (q_cpd_candidates, None),
    "agg_approx": (q_agg_approx, None),
    "text_packed": (q_text_packed, None),
    "text_bpe": (q_text_bpe, None),
    "agg_hll_rollup": (q_agg_hll_rollup, None),
}
