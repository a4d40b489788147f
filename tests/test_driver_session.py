"""Regression: the query surface must be self-sufficient on a session
that was NOT built by deep_field_spark.session.get_spark.

Round-1 driver failure mode: the driver constructs its own bare
SparkSession, so the session-level nanosAsLong conf never applied and
every events.parquet read (TIMESTAMP NANOS) raised PARQUET_TYPE_ILLEGAL.
These tests simulate that by unsetting the conf before each call — the
library code must set it back at runtime itself.
"""

from __future__ import annotations

import pytest

from deep_field_spark.catalog import table
from deep_field_spark.queries import load_registry

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


@pytest.fixture()
def bare_conf(spark):
    """Temporarily strip the session conf get_spark() installed."""
    spark.conf.unset(NANOS_CONF)
    try:
        yield spark
    finally:
        spark.conf.set(NANOS_CONF, "true")


def test_events_read_on_bare_session(bare_conf, sf_dir):
    ev = table(bare_conf, sf_dir, "events")
    assert ev.count() > 0
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_events_query_on_bare_session(bare_conf, sf_dir):
    q = load_registry()["sessionize_events"]
    assert q.fn(bare_conf, sf_dir).count() > 0


def test_streaming_on_bare_session(bare_conf, sf_dir):
    from deep_field_spark.streaming.windows import tumbling_counts

    out = tumbling_counts(bare_conf, sf_dir)
    assert out.count() > 0
