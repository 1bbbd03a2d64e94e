"""Declarative table-validation rules."""

from __future__ import annotations

import pytest

from datamine_v2_0_spark.operators import quality as qa


def _report(spark, df, rules):
    return {r["rule"]: (r["kind"], r["violations"]) for r in qa.validate_table(df, rules).collect()}


def test_validate_scalar_rules(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A", "abc"),
            (2, None, "N", "xyz"),
            (3, 99.0, "Z", None),   # out of range + out of set
            (None, 5.0, "A", "a1"),
        ],
        ["id", "qty", "flag", "code"],
    )
    got = _report(spark, df, [
        {"name": "id_nn", "kind": "not_null", "col": "id"},
        {"name": "qty_rng", "kind": "in_range", "col": "qty", "lo": 0.0, "hi": 50.0},
        {"name": "flag_dom", "kind": "in_set", "col": "flag", "values": ["A", "N"]},
        {"name": "code_fmt", "kind": "matches", "col": "code", "pattern": "^[a-z]+$"},
    ])
    assert got["id_nn"] == ("not_null", 1)
    assert got["qty_rng"] == ("in_range", 1)       # NULL qty doesn't violate
    assert got["flag_dom"] == ("in_set", 1)
    assert got["code_fmt"] == ("matches", 1)       # 'a1'; NULL code exempt


def test_validate_unique_and_ref(spark):
    df = spark.createDataFrame(
        [(1, 1, 100), (1, 1, 101), (1, 2, 102), (2, 1, 999), (None, 1, 100)],
        ["k1", "k2", "fk"],
    )
    dim = spark.createDataFrame([(100,), (101,), (102,)], ["key"])
    got = _report(spark, df, [
        {"name": "pk", "kind": "unique", "cols": ["k1", "k2"]},
        {"name": "fk", "kind": "ref", "col": "fk", "dim": dim, "dim_col": "key"},
    ])
    # (1,1) appears twice -> 1 duplicate; NULL-bearing row not counted
    assert got["pk"] == ("unique", 1)
    assert got["fk"] == ("ref", 1)  # 999


def test_validate_single_scan_for_scalar_rules(spark):
    df = spark.createDataFrame([(1, 2.0)], ["a", "b"])
    rep = qa.validate_table(df, [
        {"name": "r1", "kind": "not_null", "col": "a"},
        {"name": "r2", "kind": "in_range", "col": "b", "lo": 0.0, "hi": 1.0},
        {"name": "r3", "kind": "unique", "cols": ["a"]},
    ])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") == 1
    assert rep.count() == 3


def test_validate_unknown_kind_raises(spark):
    df = spark.createDataFrame([(1,)], ["a"])
    with pytest.raises(ValueError):
        qa.validate_table(df, [{"name": "x", "kind": "nope", "col": "a"}])


def test_psi_identical_distributions_zero(spark):
    rows = [(float(i % 10),) for i in range(100)]
    ref = spark.createDataFrame(rows, ["v"])
    out = qa.population_stability(ref, ref, "v").collect()
    assert len(out) == 10
    assert all(r["psi_term"] == pytest.approx(0.0, abs=1e-9) for r in out)
    assert sum(r["n_ref"] for r in out) == 100


def test_psi_shift_positive_and_clamped(spark):
    ref = spark.createDataFrame([(float(i),) for i in range(100)], ["v"])
    # current values far outside the reference range clamp into bin 9
    cur = spark.createDataFrame([(1000.0,) for _ in range(50)], ["v"])
    out = {r["bin"]: r for r in qa.population_stability(ref, cur, "v").collect()}
    assert len(out) == 10  # every bin appears even with zero counts
    assert out[9]["n_cur"] == 50 and out[9]["n_cur"] == 50
    psi = sum(r["psi_term"] for r in out.values())
    assert psi > 0.25  # "shifted" by the standard rule of thumb
    assert out[0]["n_cur"] == 0 and out[0]["p_cur"] == pytest.approx(1e-6)


def test_psi_nulls_ignored(spark):
    ref = spark.createDataFrame([(1.0,), (2.0,), (None,)], ["v"])
    out = qa.population_stability(ref, ref, "v").collect()
    assert sum(r["n_ref"] for r in out) == 2


def test_psi_constant_reference_no_error(spark):
    ref = spark.createDataFrame([(2.0,)] * 5, ["v"])
    cur = spark.createDataFrame([(2.0,), (9.0,)], ["v"])
    out = {r["bin"]: r for r in qa.population_stability(ref, cur, "v").collect()}
    assert out[0]["n_ref"] == 5
    assert sum(r["n_cur"] for r in out.values()) == 2  # 9.0 clamps to bin 9
