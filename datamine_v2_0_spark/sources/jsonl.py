"""JSON-lines corpus source/sink — the interchange format of LLM
training corpora (one JSON document per line, optionally gzipped).

Spark's native json reader handles JSONL and .gz transparently and in
parallel (gzip files split per-file, not per-block — so corpus shards
should be many moderate files, which is how JSONL corpora ship anyway).
Reads enforce a user schema (no sampling-inference job over 100 TB) and
quarantine undecodable lines via PERMISSIVE + _corrupt_record instead
of failing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType


def corpus_schema(*, id_field: str = "id", text_field: str = "text") -> StructType:
    """Minimal LLM-corpus schema: string id + text + optional metadata
    map. Callers with richer sidecar fields pass their own StructType."""
    return StructType(
        [
            StructField(id_field, StringType()),
            StructField(text_field, StringType()),
            StructField("meta", StringType()),
        ]
    )


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Read a JSONL corpus with a declared schema. Undecodable lines
    land in ``corrupt_col`` so a filter can route them to a quarantine
    sink; schema-valid rows have the column NULL.

    Implemented as a text scan + ``from_json`` rather than the raw json
    datasource: the raw scan forbids any query whose referenced columns
    reduce to the corrupt column alone
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — even
    ``clean.count()`` trips it after pruning), while the parsed form
    has no such restriction. Line splitting and .gz handling are
    identical for text and json sources."""
    full = StructType(
        schema.fields + [StructField(corrupt_col, StringType())]
    )
    # blank/whitespace-only lines parse to an all-NULL struct with a
    # NULL corrupt column — phantom "clean" empty documents; route them
    # to the corrupt column explicitly so split_corrupt quarantines them
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    parsed = raw.select(
        F.col("value").alias("__raw"),
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ).alias("__j"),
    )
    fields = [f.name for f in schema.fields]
    all_null = F.lit(True)
    for name in fields:
        all_null = all_null & F.col(f"__j.{name}").isNull()
    return parsed.select(
        *[F.col(f"__j.{name}").alias(name) for name in fields],
        F.when(
            F.col(f"__j.{corrupt_col}").isNotNull(),
            F.col(f"__j.{corrupt_col}"),
        )
        .when(all_null, F.col("__raw"))
        .alias(corrupt_col),
    )


def split_corrupt(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_the_corrupt_col, quarantined_rows).

    The quarantine side keeps ALL columns (schema fields null + the raw
    line): Spark disallows queries that reference only the
    corrupt-record column of a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and the
    quarantine sink wants the raw line anyway."""
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull())
    return clean, bad


def write_jsonl_corpus(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> None:
    """Write a corpus as JSONL shards. ``n_shards`` controls output
    file count via repartition (shard count = parallelism of every
    downstream reader — aim for 100-1000 MB per compressed shard);
    None keeps the upstream partitioning."""
    out = df.repartition(n_shards) if n_shards else df
    w = out.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
