"""Differential test: every registered query with an oracle must match
DuckDB exactly (count + columns + values) at the test scale factor.

This is a local replica of the driver's CORRECTNESS gate — any failure
here would fail the driver's t2 check.
"""

from __future__ import annotations

import pytest

from deep_field_spark.queries import load_registry
from tests.oracle_utils import compare, duckdb_connect

REGISTRY = load_registry()
WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
NO_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connect(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(name, spark, sf_dir, con):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    compare(df, con, q.oracle)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(name, spark, sf_dir):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
