"""Structured Streaming operators over the events stream.

The reference is batch-only (SURVEY.md §2.9); this is the (parity)
streaming surface: watermarked tumbling/sliding windows, session
windows, and custom stateful processing via applyInPandasWithState.

For tests/oracle runs a static parquet directory drives the stream to
completion synchronously (memory sink + processAllAvailable) — the
same topology runs against Kafka/files on a cluster by swapping the
source; watermarks are declared so the plan is append-capable in
production even where the local check uses complete mode.
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StructField, StructType, TimestampType,
)


def _stream_dir(sf_dir: str) -> str:
    """The file stream source needs a directory; expose the single
    events.parquet through a symlinked temp dir (testdata is RO)."""
    import os
    import tempfile

    d = os.path.join(tempfile.gettempdir(), "dfs_stream", sf_dir.strip("/").replace("/", "_"))
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    target = f"{sf_dir}/events.parquet"
    # Recreate rather than trust a stale/broken symlink from a prior run.
    if os.path.islink(link) and os.readlink(link) != target:
        os.remove(link)
    if not os.path.exists(link):
        os.symlink(target, link)
    return d


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import ensure_nanos_conf, fix_nanos_ts

    ensure_nanos_conf(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = spark.readStream.schema(schema).format("parquet").load(_stream_dir(sf_dir))
    ev = fix_nanos_ts(raw)
    # Watermarks require TIMESTAMP (LTZ); pyspark 4.1 reads parquet
    # TIMESTAMP(NANOS) as TIMESTAMP_NTZ. Session TZ is pinned to UTC by
    # ensure_nanos_conf, so this cast is the exact identity on the naive
    # value (and a no-op where ts is already LTZ).
    return ev.withColumn("ts", F.col("ts").cast("timestamp_ltz"))


def _run_to_memory(agg: DataFrame, mode: str) -> DataFrame:
    name = f"stream_out_{uuid.uuid4().hex[:10]}"
    # A stateful streaming op creates ONE state store per shuffle
    # partition, fixed at first start (checkpoint-bound). On a
    # default-conf session that is 200 stores per stateful operator —
    # pure overhead at any local scale (a bare-session stream-stream
    # join measured 22 s, ~4x the same plan at 32). Pin a bounded
    # count for the query's lifetime; the session value is restored
    # after. On a real cluster this knob is sized to executor count.
    sess = agg.sparkSession
    old = sess.conf.get("spark.sql.shuffle.partitions")
    sess.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        q = (
            agg.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        sess.conf.set("spark.sql.shuffle.partitions", old)
    # Return the sink table directly — no driver-side collect round-trip.
    # The memory sink is the local oracle harness only; the production
    # topology is the same plan with writeStream.format("parquet"/"kafka")
    # + append mode, where watermarks bound state store size.
    return agg.sparkSession.table(name)


def tumbling_counts(spark: SparkSession, sf_dir: str, width: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts per event_type."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", width), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("window.start").alias("wstart"), "event_type", "n", "sum_value"
    )


def sliding_counts(
    spark: SparkSession, sf_dir: str, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Watermarked sliding-window counts: each event lands in
    width/slide windows via Expand (shuffle volume scales with that
    factor, not with a range join)."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", width, slide))
        .agg(F.count("*").alias("n"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(F.col("window.start").alias("wstart"), "n")


def session_window_counts(spark: SparkSession, sf_dir: str, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-merged), counts per session."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("session_window.start").alias("session_start"), "user_id", "n_events"
    )


def static_enrich_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the events stream enriched with the STATIC
    customer dimension (market segment) before a watermarked tumbling
    agg. The production pattern for dimension lookups in a stream —
    the static side is planned as a broadcast per micro-batch (and
    re-resolved each batch, so a slowly-refreshing dim table just
    works); no state store is involved in the join itself, so state
    is bounded by the window agg alone."""
    from ..catalog import table

    ev = events_stream(spark, sf_dir)
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = ev.join(F.broadcast(dim), "user_id")
    agg = (
        enriched.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), F.col("c_mktsegment"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("window.start").alias("wstart"), "c_mktsegment", "n", "sum_value"
    )


_STATE_SCHEMA = StructType([StructField("n", LongType())])
_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _count_state(key, pdfs, state: GroupState):
    n = state.get[0] if state.exists else 0
    last_ts = None
    for pdf in pdfs:
        n += len(pdf)
        mx = pdf["ts"].max()
        last_ts = mx if last_ts is None else max(last_ts, mx)
    state.update((n,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "last_ts": [last_ts]})


def dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark over an at-least-once stream.

    The stream is the events source unioned with itself (simulated
    redelivery); dedup on event_id within a 1h watermark returns each
    event exactly once. State is bounded by the watermark horizon —
    the scale contract that plain dropDuplicates on a stream lacks.
    """
    doubled = events_stream(spark, sf_dir).unionByName(events_stream(spark, sf_dir))
    dd = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    return _run_to_memory(dd, "append")


def purchase_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding 30 minutes.

    Both sides carry watermarks and the join condition bounds event
    time on both sides — the two requirements that let Spark expire
    join state instead of buffering both streams forever. State per
    side is (watermark + interval) wide regardless of stream length:
    the only stream-stream join shape that survives at 100 TB/day.
    """
    ev = events_stream(spark, sf_dir).select("event_id", "user_id", "ts", "event_type")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
    ).select("purchase_id", "click_id", "user_id")
    return _run_to_memory(joined, "append")


def stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator: running per-user event counts via
    applyInPandasWithState (the Python stateful-processing surface —
    (flat)MapGroupsWithState is Scala-only)."""
    ev = events_stream(spark, sf_dir).select("user_id", "ts")
    agg = ev.groupBy("user_id").applyInPandasWithState(
        _count_state,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(agg, "update")
    return out.select("user_id", "n_events")


def stateful_user_counts_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user event counts via transformWithStateInPandas —
    Spark 4's arbitrary-stateful API (the applyInPandasWithState
    successor): typed per-key state handles (ValueState here; List/Map
    state and timers in the same handle API) over the RocksDB state
    store provider, which transformWithState requires — and which is
    also the right provider at scale (changelog-checkpointed,
    spill-to-disk state instead of JVM-heap HDFSBackedStateStore).
    Same semantics as stateful_user_counts: on one availableNow pass
    the final state equals the batch groupBy, so the same oracle
    hash-checks it.

    Environment note: the transformWithState Python worker speaks a
    protobuf-based state-server protocol — ``google.protobuf`` must be
    importable on the workers (absent in this container, so the test
    importorskips; applyInPandasWithState above is the dependency-free
    gated path and stays the registry query)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _CountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            n = sum(len(pdf) for pdf in rows)
            prev = self._n.get()
            total = (prev[0] if prev is not None else 0) + n
            self._n.update((total,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

        def close(self) -> None:
            pass

    ev = events_stream(spark, sf_dir).select("user_id", "ts")
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        agg = ev.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_CountProcessor(),
            outputStructType="user_id bigint, n_events bigint",
            outputMode="Update",
            timeMode="None",
        )
        out = _run_to_memory(agg, "update")
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
    return out.select("user_id", "n_events")
