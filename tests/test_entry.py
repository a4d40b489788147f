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


def test_priority_names_all_resolve(spark):
    """Every _PRIORITY name must exist in the registry (a typo silently
    drops the query from the budget-critical evaluation head), and the
    registry must begin with the priority block in order."""
    from deep_field_spark.queries import _PRIORITY, load_registry

    reg = load_registry()
    missing = [n for n in _PRIORITY if n not in reg]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    assert list(reg)[: len(_PRIORITY)] == _PRIORITY
