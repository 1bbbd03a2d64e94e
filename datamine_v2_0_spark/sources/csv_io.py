"""CSV source/sink operators (S1, S8, S13).

Behavioral reference: ckpronto/datamine_v2.0
``STEP 1 - Ingest Raw Telemetry/01_ingest_raw_telemetry.py:169-251`` (header
validation, empty→NULL) and ``STEP 5 - CPD/05_cpd_orchestrator_polars.py:605-612``
(final CSV sink).

Scale notes: a headered CSV scan parallelizes by file split; schema is always
explicit (inferSchema would double-scan 100 TB). The single-file sink is for
small result sets only — the partitioned sink keeps writes parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class HeaderMismatchError(ValueError):
    """Raised when the CSV header does not match the declared schema."""


def read_csv_validated(
    spark: SparkSession,
    path: str,
    schema: StructType,
    expected_header: list[str] | None = None,
    null_tokens: list[str] | None = None,
    **options,
) -> DataFrame:
    """S1: schema-pinned CSV read with header validation and empty→NULL.

    Header check reads ONE row (limit 1 on a text scan), never the data.
    ``null_tokens``: extra string values to NULL-ify post-read in string
    columns (the P7 multi-token null set — pandas' ``na_values=['NULL',
    'null','None']``; Spark's csv nullValue takes a single token)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    expected = expected_header or [f.name for f in schema.fields]
    first = spark.read.text(path).limit(1).collect()
    if first:
        header = [c.strip().strip('"') for c in first[0]["value"].split(",")]
        if header != expected:
            raise HeaderMismatchError(
                f"CSV header mismatch: expected {expected}, got {header}"
            )
    opts = {"header": "true", "nullValue": "", "emptyValue": "", **options}
    df = spark.read.csv(path, schema=schema, **opts)
    if null_tokens:
        for f in schema.fields:
            if isinstance(f.dataType, StringType):
                df = df.withColumn(
                    f.name,
                    F.when(
                        F.col(f.name).isin(null_tokens), F.lit(None)
                    ).otherwise(F.col(f.name)),
                )
    return df


def write_csv_single(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S8: small-result CSV sink (single file via coalesce(1) — driver-report
    scale only; never for large outputs)."""
    df.coalesce(1).write.mode(mode).option("header", "true").csv(path)


def write_csv_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """S13: per-partition CSV export (one directory per key, e.g. the
    per-truck-date Label Studio feed, 02.1.1:210-307)."""
    (
        df.repartition(*partition_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .option("header", "true")
        .csv(path)
    )
