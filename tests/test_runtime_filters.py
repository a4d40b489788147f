"""Runtime filtering at scale: bloom-filter join injection and dynamic
partition pruning (DPP).

Both are Catalyst features that only pay off at cluster scale — the
fixture data sits below their size thresholds, so the tests scale the
thresholds down to fixture size and assert (a) the runtime filter
actually appears in the physical plan and (b) semantics are unchanged
(same rows as the unfiltered plan). At 100 TB the same declarative
join gets these for free with default thresholds — which is the point
of expressing everything as DataFrame joins instead of hand-rolled
lookups.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _confs(spark, **kv):
    saved = {}
    try:
        for k, v in kv.items():
            key = k.replace("__", ".")
            saved[key] = spark.conf.get(key, None)
            spark.conf.set(key, v)
        yield
    finally:
        for key, v in saved.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_bloom_filter_join_injected_and_semantics_preserved(spark, sf_dir):
    """A selective dim filter on one side of a shuffle join must inject
    a bloom filter (might_contain) into the fact scan side once the
    creation/application thresholds admit fixture-sized inputs — the
    runtime row-level pruning a 100 TB fact join depends on."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_orderpriority = '1-URGENT'"
    ).select("o_orderkey")
    baseline = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy().agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
        .collect()[0]
    )
    with _confs(
        spark,
        spark__sql__autoBroadcastJoinThreshold="-1",  # force shuffle join
        spark__sql__optimizer__runtime__bloomFilter__applicationSideScanSizeThreshold="0",
        spark__sql__optimizer__runtime__bloomFilter__creationSideThreshold="100MB",
    ):
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        got = (
            j.groupBy().agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
            .collect()[0]
        )
    assert (got.n, got.q) == (baseline.n, baseline.q)
    assert got.n > 0


def test_dynamic_partition_pruning_on_partitioned_sink(spark, sf_dir, tmp_path):
    """Events written partitioned by event_type; joining against a
    filtered dim on the partition key must plan a dynamicpruning
    partition filter — only the matching partitions are scanned, the
    partition-elimination behavior every partitioned 100 TB fact table
    relies on when the selective predicate arrives via a join."""
    out = str(tmp_path / "events_by_type")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value", "event_type"
    )
    ev.write.partitionBy("event_type").parquet(out)
    fact = spark.read.parquet(out)
    # DPP requires a SELECTIVE PREDICATE on the dim side (the pruning
    # subquery is derived from it) and a file-based dim for stats — a
    # filtered parquet dim, as in production
    dim_path = str(tmp_path / "type_dim")
    spark.createDataFrame(
        [("purchase", 2.0), ("click", 1.0), ("view", 0.5),
         ("login", 0.1), ("logout", 0.1)],
        "event_type string, weight double",
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("weight") >= 1.0)
    with _confs(
        spark,
        spark__sql__optimizer__dynamicPartitionPruning__enabled="true",
        # fixture partitions are tiny; make the broadcast-reuse path
        # always considered worthwhile
        spark__sql__optimizer__dynamicPartitionPruning__useStats="false",
    ):
        j = fact.join(dim, "event_type").select("event_id", "weight")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan
        n = j.count()
    # semantics: identical to a static IN filter on the two types
    want = ev.filter(F.col("event_type").isin("purchase", "click")).count()
    assert n == want and n > 0


def test_aqe_skew_join_splits_hot_key(spark, sf_dir):
    """AQE's built-in skew handling — the adaptive complement of the
    manual salt in join_skew_salted: a sort-merge join whose fact side
    has one hot key (amplified 20x here, 'click') must be re-planned
    at runtime as SortMergeJoin(skew=true) with the hot reduce
    partition split across mapper-boundary chunks (AQEShuffleRead
    'skewed'), semantics unchanged.

    Two fixture-scale adjustments, both size-not-shape: the skew
    thresholds scale down (same move as the bloom/DPP tests above),
    and the fact side is repartitioned to 8 mappers — AQE splits a
    skewed reduce partition at MAPPER granularity, and the single
    small fixture file otherwise produces one mapper, leaving nothing
    to split (at 100 TB the fact scan has thousands of mappers and
    this is never a constraint).

    When is the manual salt still required? When the hot-key operator
    is broadcast-ineligible and NOT this exact SMJ shape — e.g. a
    skewed AGGREGATION (no join to split), or a join whose child isn't
    a plain shuffle (an agg or window between shuffle and join breaks
    the Sort(Shuffle) pattern the rule matches). SCALE.md §skew has
    the decision table."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    fact = (
        ev.withColumn(
            "rep",
            F.when(F.col("event_type") == "click", 20).otherwise(1),
        )
        .withColumn("i", F.explode(F.sequence(F.lit(1), F.col("rep"))))
        .drop("rep", "i")
        .repartition(8)
    )
    dim = spark.createDataFrame(
        [(t, i) for i, t in enumerate(
            ["click", "view", "signup", "error", "purchase"]
        )],
        "event_type string, w int",
    )
    baseline = (
        fact.join(F.broadcast(dim), "event_type")
        .agg(F.count("*").alias("n"), F.sum("w").alias("s"))
        .collect()[0]
    )
    with _confs(
        spark,
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes="2KB",
        spark__sql__adaptive__advisoryPartitionSizeInBytes="1KB",
    ):
        res = fact.join(dim, "event_type").agg(
            F.count("*").alias("n"), F.sum("w").alias("s")
        )
        row = res.collect()[0]
        plan = res._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin(skew=true)" in plan, plan
    # 'skewed' or 'coalesced and skewed', depending on whether the
    # coalesce rule also fired on the same read
    assert any(
        "AQEShuffleRead" in ln and "skewed" in ln
        for ln in plan.splitlines()
    ), plan
    assert (row.n, row.s) == (baseline.n, baseline.s)
    assert row.n > 0
