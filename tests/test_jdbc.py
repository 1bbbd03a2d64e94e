"""JDBC source/sink round-trip (S3/S9/S10) against embedded Derby.

Derby ships on Spark's own classpath (it backs the Hive metastore), so
the JDBC wrappers are exercised end-to-end with zero extra dependencies:
write (+ post-write validation) -> partitioned parallel read back.
Reference behavior: pd.read_sql_query reads (database_pipeline.py:140-166)
and COPY + validate bulk loads (05_load_candidates_to_db.py:163-195).
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from datamine_v2_0_spark.sources.jdbc_io import (
    read_jdbc_partitioned,
    write_jdbc_validated,
)

@pytest.fixture(scope="module")
def derby_url(spark):
    # unique db per test run; ;create=true makes Derby mint it on first use
    url = f"jdbc:derby:/tmp/derby_{uuid.uuid4().hex};create=true"
    try:
        spark.read.format("jdbc").option("url", url).option(
            "dbtable", "SYS.SYSTABLES"
        ).load().limit(1).collect()
    except Exception as ex:  # pragma: no cover - classpath surprise
        pytest.skip(f"embedded Derby unavailable: {ex}")
    return url


def test_jdbc_write_validate_read_roundtrip(spark, derby_url):
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id").cast("double") * 1.5).alias("v"),
    )
    write_jdbc_validated(
        df, derby_url, "events_rt", expected_rows=1000, mode="overwrite"
    )

    back = read_jdbc_partitioned(
        spark, derby_url, "events_rt", "id", 0, 1000, num_partitions=4
    )
    # the partitioned read really is parallel: one task per range slice
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    got = back.agg(
        F.sum("id").alias("s"), F.round(F.sum("v"), 4).alias("sv")
    ).first()
    assert got["s"] == 499500
    assert got["sv"] == 499500 * 1.5


def test_jdbc_validation_failure_raises(spark, derby_url):
    df = spark.range(0, 10).select(F.col("id"))
    with pytest.raises(ValueError, match="post-write validation failed"):
        write_jdbc_validated(
            df, derby_url, "short_tbl", expected_rows=999, mode="overwrite"
        )


# ---------- Postgres dialect layer (sources/postgres.py) ----------
# String/DDL generation is unit-tested exactly; the transactional
# executor and staged-swap publish run for real against embedded Derby
# (same java.sql call path the Postgres driver jar takes).

from datamine_v2_0_spark.sources import postgres as pg


def test_pg_url_defaults_and_props():
    url = pg.pg_url("db.internal", "telemetry")
    assert url == (
        "jdbc:postgresql://db.internal:5432/telemetry"
        "?reWriteBatchedInserts=true&stringtype=unspecified"
    )
    bare = pg.pg_url(
        "h", "d", rewrite_batched_inserts=False, stringtype_unspecified=False
    )
    assert bare == "jdbc:postgresql://h:5432/d"
    extra = pg.pg_url("h", "d", port=5433, connectTimeout=10)
    assert "jdbc:postgresql://h:5433/d?" in extra
    assert "connectTimeout=10" in extra


def test_pg_column_types_mapping(spark):
    from decimal import Decimal

    df = spark.createDataFrame(
        [(1, 1.5, "x", True, Decimal("1.23"), [1.0], b"\x00")],
        "id long, v double, s string, b boolean, d decimal(10,2), "
        "arr array<double>, raw binary",
    ).withColumn("ts", F.current_timestamp())
    ddl = pg.pg_column_types(
        df, overrides={"s": "GEOGRAPHY(POINTZ, 4326)"}
    )
    assert ddl == (
        "id BIGINT, v DOUBLE PRECISION, s GEOGRAPHY(POINTZ, 4326), "
        "b BOOLEAN, d NUMERIC(10,2), arr DOUBLE PRECISION[], raw BYTEA, "
        "ts TIMESTAMPTZ"
    )
    with pytest.raises(ValueError, match="override columns not in"):
        pg.pg_column_types(df, overrides={"nope": "TEXT"})
    with pytest.raises(TypeError, match="no Postgres mapping"):
        pg.pg_type(df.select(F.struct("id").alias("st")).schema[0].dataType)


def test_pg_upsert_sql_golden():
    sql = pg.pg_upsert_sql(
        "silver", ["raw_event_hash_id", "device_id", "v"],
        ["raw_event_hash_id"],
    )
    assert sql == (
        "INSERT INTO silver (raw_event_hash_id, device_id, v) "
        "VALUES (?, ?, ?) ON CONFLICT (raw_event_hash_id) DO NOTHING"
    )
    upd = pg.pg_upsert_sql(
        "silver", ["k", "a", "b"], ["k"], update_columns=["a", "b"]
    )
    assert upd.endswith("DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b")


def test_jdbc_execute_transactional(spark, derby_url):
    t = f"txn_{uuid.uuid4().hex[:8]}"
    pg.jdbc_execute(
        spark, derby_url,
        [f"CREATE TABLE {t} (id INT)", f"INSERT INTO {t} VALUES (1), (2)"],
    )
    n = (
        spark.read.format("jdbc").option("url", derby_url)
        .option("dbtable", f"(SELECT COUNT(*) AS n FROM {t}) q").load()
        .first()[0]
    )
    assert n == 2
    # all-or-nothing: the valid INSERT before the broken statement must
    # roll back with it
    with pytest.raises(Exception):
        pg.jdbc_execute(
            spark, derby_url,
            [f"INSERT INTO {t} VALUES (3)", "THIS IS NOT SQL"],
        )
    n2 = (
        spark.read.format("jdbc").option("url", derby_url)
        .option("dbtable", f"(SELECT COUNT(*) AS n FROM {t}) q").load()
        .first()[0]
    )
    assert n2 == 2, "rolled-back INSERT must not be visible"


def test_staged_swap_publish_and_validation(spark, derby_url):
    t = f"pub_{uuid.uuid4().hex[:8]}"
    v1 = spark.range(0, 100).select(F.col("id"))
    pg.write_jdbc_staged_swap(
        v1, derby_url, t, expected_rows=100, dialect="derby"
    )
    live = spark.read.format("jdbc").option("url", derby_url).option(
        "dbtable", t
    ).load()
    assert live.count() == 100

    # second publish replaces the first atomically
    v2 = spark.range(0, 37).select(F.col("id"))
    pg.write_jdbc_staged_swap(
        v2, derby_url, t, expected_rows=37, dialect="derby"
    )
    assert (
        spark.read.format("jdbc").option("url", derby_url)
        .option("dbtable", t).load().count() == 37
    )

    # failed validation leaves the live table untouched
    v3 = spark.range(0, 5).select(F.col("id"))
    with pytest.raises(ValueError, match="staged write validation failed"):
        pg.write_jdbc_staged_swap(
            v3, derby_url, t, expected_rows=6, dialect="derby"
        )
    assert (
        spark.read.format("jdbc").option("url", derby_url)
        .option("dbtable", t).load().count() == 37
    ), "live table must survive a failed staged publish"


def test_truncate_insert_preserves_table_identity(spark, derby_url):
    """write_jdbc_truncate_insert publishes through the EXISTING live
    table object — an index on it must survive the publish (the staged
    swap's rename would discard it), a failed validation must leave the
    live rows untouched, and a second publish fully replaces the rows."""
    t = f"ti_{uuid.uuid4().hex[:8]}"
    # live table created out-of-band (like a DBA-managed table), with an
    # index — the identity the publish must preserve
    pg.jdbc_execute(
        spark, derby_url,
        [f"CREATE TABLE {t} (id BIGINT)", f"CREATE INDEX {t}_idx ON {t} (id)"],
    )
    v1 = spark.range(0, 50).select(F.col("id"))
    pg.write_jdbc_truncate_insert(
        v1, derby_url, t, expected_rows=50, columns=["id"]
    )
    assert (
        spark.read.format("jdbc").option("url", derby_url)
        .option("dbtable", t).load().count() == 50
    )
    # the index still exists in the catalog — proof the publish kept the
    # table object (a rename-based swap would have dropped it)
    def index_exists():
        q = (
            "(SELECT COUNT(*) AS n FROM SYS.SYSCONGLOMERATES "
            f"WHERE CONGLOMERATENAME = '{t.upper()}_IDX') x"
        )
        return (
            spark.read.format("jdbc").option("url", derby_url)
            .option("dbtable", q).load().first()[0] == 1
        )

    assert index_exists()

    # failed validation leaves live rows untouched
    v2 = spark.range(0, 5).select(F.col("id"))
    with pytest.raises(ValueError, match="staged write validation failed"):
        pg.write_jdbc_truncate_insert(
            v2, derby_url, t, expected_rows=6, columns=["id"]
        )
    assert (
        spark.read.format("jdbc").option("url", derby_url)
        .option("dbtable", t).load().count() == 50
    )

    # successful re-publish replaces all rows, same table object
    v3 = spark.range(100, 117).select(F.col("id"))
    pg.write_jdbc_truncate_insert(
        v3, derby_url, t, expected_rows=17, columns=["id"]
    )
    got = sorted(
        r["ID"] if "ID" in r else r["id"]
        for r in spark.read.format("jdbc").option("url", derby_url)
        .option("dbtable", t).load().collect()
    )
    assert got == list(range(100, 117))
