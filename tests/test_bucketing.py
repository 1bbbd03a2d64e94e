"""Bucketed tables: same-bucketed equi join must plan WITHOUT a shuffle
exchange — the materialized co-location strategy for repeated big joins."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from datamine_v2_0_spark.plans import count_exchanges
from datamine_v2_0_spark.sources.parquet_io import write_bucketed_table


def test_bucketed_join_skips_shuffle(spark, tmp_path_factory):
    a = spark.createDataFrame([Row(k=i % 50, va=float(i)) for i in range(1000)])
    b = spark.createDataFrame([Row(k=i % 50, vb=float(i * 2)) for i in range(1000)])

    write_bucketed_table(a, "bkt_a", ["k"], 8, sort_cols=["k"])
    write_bucketed_table(b, "bkt_b", ["k"], 8, sort_cols=["k"])
    try:
        ta, tb = spark.table("bkt_a"), spark.table("bkt_b")
        j = ta.join(tb, "k")
        assert count_exchanges(j) == 0, "bucketed join should not shuffle"
        # and results are correct
        assert j.count() == 1000 * 20  # 50 keys x 20 x 20 matches / key...
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_bucketed_vs_plain_counts(spark):
    # arithmetic check for the expected join size used above:
    # 1000 rows, k = i % 50 -> 20 rows per key per side -> 50 * 20 * 20
    assert 50 * 20 * 20 == 20000
