"""Bucketed (co-located) join: pre-bucketing both sides on the join
key eliminates the shuffle entirely — the 100 TB play for repeated
fact-fact joins (SURVEY §2.3 J6-J11 scale note)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from deep_field_spark import sinks
from deep_field_spark.catalog import table


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(no_broadcast, sf_dir):
    spark = no_broadcast
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_cust = f"b_orders_{suffix}", f"b_cust_{suffix}"
    try:
        sinks.write_bucketed(
            table(spark, sf_dir, "orders"), t_orders,
            ["o_custkey"], 8, sort_cols=["o_custkey"],
        )
        sinks.write_bucketed(
            table(spark, sf_dir, "customer"), t_cust,
            ["c_custkey"], 8, sort_cols=["c_custkey"],
        )
        joined = spark.table(t_orders).join(
            spark.table(t_cust),
            F.col("o_custkey") == F.col("c_custkey"),
        ).select("o_orderkey", "c_name")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: sort-merge join directly over bucketed scans
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and it still computes the right thing
        expected = (
            table(spark, sf_dir, "orders")
            .join(table(spark, sf_dir, "customer"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_cust}")
