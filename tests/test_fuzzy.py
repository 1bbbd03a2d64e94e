"""Edit-distance fuzzy join — operators/joins.fuzzy_self_pairs.

The contract oracle certifies recall on the real fixture; these tests
brute-force adversarial shapes the fixture can't produce (repetitive
grams, empty/1-char strings, unicode) and assert the plan stays on
equi joins.
"""

from __future__ import annotations

import itertools

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datamine_v2_0_spark.operators import joins as jn


def _lev(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, d[0] = d[0], i
        for j, cb in enumerate(b, 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
    return d[len(b)]


def _brute(names, max_dist):
    return {
        (a, b)
        for a, b in itertools.combinations(sorted(set(names)), 2)
        if _lev(a, b) <= max_dist
    }


@pytest.mark.parametrize("max_dist", [1, 2])
def test_adversarial_repetitive_strings(spark, max_dist):
    names = [
        "aaaa", "aaa", "aab", "abab", "bab", "banana", "banan",
        "bananna", "xyxyxy", "yxyxyx", "qqqq", "qqq", "a", "b", "ab", "",
        "mississippi", "missisippi", "mississippa",
    ]
    df = spark.createDataFrame(pd.DataFrame({"n": names}))
    got = {
        (r.name_a, r.name_b)
        for r in jn.fuzzy_self_pairs(df, "n", max_dist=max_dist).collect()
    }
    assert got == _brute(names, max_dist)


def test_dist_values_and_order(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"n": ["red widget", "red widgit", "red widges"]})
    )
    rows = {
        (r.name_a, r.name_b): r.dist
        for r in jn.fuzzy_self_pairs(df, "n", max_dist=2).collect()
    }
    assert rows[("red widget", "red widgit")] == 1
    assert rows[("red widges", "red widgit")] == 2
    assert all(a < b for a, b in rows)


def test_duplicates_collapse_to_distinct_names(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"n": ["bolt", "bolt", "bolt", "boot"]})
    )
    rows = jn.fuzzy_self_pairs(df, "n", max_dist=1).collect()
    assert [(r.name_a, r.name_b, r.dist) for r in rows] == [("bolt", "boot", 1)]


def test_no_nested_loop_join_in_plan(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    plan = (
        jn.fuzzy_self_pairs(part, "p_name", max_dist=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
