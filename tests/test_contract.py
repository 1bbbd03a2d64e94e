"""Driver-contract invariants: registry shape + smoke at sf0.001."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod

SF_SMALL = "/root/testdata/sf0.001"


def test_registry_shapes():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 50
    assert set(oracles) <= set(qs)
    # >= 80% of queries have a SQL oracle
    assert len(oracles) >= int(0.8 * len(qs))
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), name


@pytest.mark.skipif(not os.path.isdir(SF_SMALL), reason="driver testdata absent")
def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["c_mktsegment", "revenue", "n"]
