"""Smoke test for the driver contract."""

from __future__ import annotations

import __spark_entry__ as E


def test_entry_runs(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "sum_qty" in df.columns


def test_contract_shapes(spark):
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)
    # every oracle is a non-empty SQL string
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())
