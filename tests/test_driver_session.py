"""Regression: the query surface must be self-sufficient on a session
that was NOT built by deep_field_spark.session.get_spark.

Round-1 driver failure mode: the driver constructs its own bare
SparkSession, so session-level confs never applied and every
events.parquet read (TIMESTAMP NANOS) raised PARQUET_TYPE_ILLEGAL.

Round-2 driver failure mode: pyspark 4.1 reads TIMESTAMP(NANOS) natively
as TIMESTAMP_NTZ (the legacy nanosAsLong conf is ignored), and
``F.unix_micros`` rejects NTZ inputs — killing every micros-arithmetic
query (sessionize, range joins) AND the whole bench run. The library now
routes all epoch math through ``catalog.ts_micros`` (NTZ-safe).

These tests simulate the driver by stripping get_spark's confs — the
library code must re-normalize the session at runtime itself.
"""

from __future__ import annotations

import pytest

from deep_field_spark.catalog import table, ts_micros
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
    # pyspark 4.1 reads parquet TIMESTAMP(NANOS) as timestamp_ntz; older
    # builds honored nanosAsLong and catalog converts the long to LTZ.
    assert dict(ev.dtypes)["ts"] in ("timestamp", "timestamp_ntz")


def test_ts_micros_accepts_ntz(spark):
    """unix_micros rejects TIMESTAMP_NTZ; ts_micros must not."""
    from pyspark.sql import functions as F

    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-01-01 00:00:01' AS ts"
    ).select(ts_micros(F.col("ts")).alias("us"))
    [row] = df.collect()
    assert row["us"] == 1_704_067_201_000_000


@pytest.mark.parametrize(
    "qname",
    ["sessionize_events", "join_range_events", "join_range_events_bucketed"],
)
def test_micros_queries_on_bare_session(bare_conf, sf_dir, qname):
    """The exact three queries the round-2 driver run turned red."""
    q = load_registry()[qname]
    assert q.fn(bare_conf, sf_dir).count() > 0


def test_streaming_on_bare_session(bare_conf, sf_dir):
    from deep_field_spark.streaming.windows import tumbling_counts

    out = tumbling_counts(bare_conf, sf_dir)
    assert out.count() > 0
