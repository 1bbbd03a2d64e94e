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
