"""JDBC source/sink wrappers (S3, S9, S10).

Behavioral reference: ckpronto/datamine_v2.0 reads with
``pd.read_sql_query`` (``STEP 3 - EDA Analysis/database_pipeline.py:140-166``)
and bulk-loads with COPY + transactional validation
(``STEP 5 - CPD/05_load_candidates_to_db.py:163-195,284-326``).

Scale notes: a JDBC read without ``partitionColumn`` is a SINGLE-TASK scan
— always pass the partitioning triple for anything bigger than a lookup
table. Spark JDBC writes are batched inserts; post-write validation
replaces the reference's in-transaction checks (Spark writes aren't
transactional — validate, then atomically swap table names downstream).

Exercised end-to-end against embedded Derby (on Spark's classpath) in
tests/test_jdbc.py: validated write -> partitioned parallel read back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound,
    upper_bound,
    num_partitions: int,
    **options,
) -> DataFrame:
    """S3/S10: parallel JDBC read — `num_partitions` concurrent range
    scans over `partition_column`."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .options(**options)
        .load()
    )


def write_jdbc_validated(
    df: DataFrame,
    url: str,
    table: str,
    expected_rows: int | None = None,
    mode: str = "append",
    batchsize: int = 10000,
    **options,
) -> None:
    """S9: bulk JDBC write + post-write row-count validation (the
    reference's copy_from + validate + commit/rollback, minus the
    transaction: Spark JDBC writes are not transactional, so validate
    after and swap atomically in the database if needed)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**options)
        .mode(mode)
        .save()
    )
    if expected_rows is not None:
        spark = df.sparkSession
        back = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", f"(SELECT COUNT(*) AS n FROM {table}) q")
            .options(**options)
            .load()
        )
        # positional: engines differ on unquoted-identifier case (Derby
        # uppercases the alias to "N", Postgres lowercases)
        got = back.first()[0]
        if got < expected_rows:
            raise ValueError(
                f"post-write validation failed: {got} rows < expected "
                f"{expected_rows} in {table}"
            )
