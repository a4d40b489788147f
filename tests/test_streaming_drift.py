"""Streaming PSI drift monitor (streaming/drift.py): frozen reference
artifact + per-micro-batch drift reports, equivalence with the batch
audit pinned."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from deep_field_spark.catalog import table
from deep_field_spark.queries import load_registry
from deep_field_spark.queries.events import PSI_SPLIT_TS
from deep_field_spark.streaming import drift

REGISTRY = load_registry()


def _halves(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("event_type", "value", "ts")
    split = F.lit(PSI_SPLIT_TS).cast("timestamp")
    ref = ev.filter(F.col("ts") < split).select("event_type", "value")
    cur = ev.filter(F.col("ts") >= split).select("event_type", "value")
    return ref, cur


def test_single_batch_stream_reproduces_batch_audit(spark, sf_dir, tmp_path):
    """One micro-batch carrying the whole 'current' half must produce
    EXACTLY dq_distribution_drift's rows — same types, same n_ref /
    n_cur, same DECIMAL-rounded PSI values. The streaming monitor is
    the batch audit refactored around a frozen artifact, not a
    reimplementation that can drift from it."""
    ref, cur = _halves(spark, sf_dir)
    ref_path = str(tmp_path / "ref")
    drift.freeze_reference(ref, ref_path)

    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    cur.coalesce(1).write.mode("overwrite").parquet(f"{src}/all")
    stream = spark.readStream.schema(cur.schema).parquet(f"{src}/*")
    q = drift.foreach_batch_psi(
        stream, ref_path, str(tmp_path / "reports"), str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(120), 'stream did not drain'

    got = {
        r.event_type: (r.n_ref, r.n_cur, r.psi)
        for r in spark.read.parquet(str(tmp_path / "reports")).collect()
    }
    want = {
        r.event_type: (r.n_ref, r.n_cur, r.psi)
        for r in REGISTRY["dq_distribution_drift"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_multi_batch_reports_and_replay_idempotence(spark, sf_dir, tmp_path):
    """Two files → two batch-id-keyed reports whose n_cur sums to the
    full current half; a second availableNow pass over the same files
    (fresh checkpoint NOT shared) is prevented by the original
    checkpoint from reprocessing — report count unchanged."""
    ref, cur = _halves(spark, sf_dir)
    ref_path = str(tmp_path / "ref")
    drift.freeze_reference(ref, ref_path)

    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    h = F.abs(F.hash("event_type", "value")) % 2
    cur.withColumn("_h", h).filter(F.col("_h") == 0).drop("_h").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{src}/f1")
    cur.withColumn("_h", h).filter(F.col("_h") == 1).drop("_h").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{src}/f2")

    reports = str(tmp_path / "reports")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(cur.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/*")
    q = drift.foreach_batch_psi(stream, ref_path, reports, ckpt)
    assert q.awaitTermination(120), 'stream did not drain'

    got = spark.read.option("basePath", reports).parquet(reports)
    batch_ids = {r.batch_id for r in got.select("batch_id").distinct().collect()}
    assert len(batch_ids) == 2, batch_ids
    n_cur_total = (
        got.groupBy("event_type").agg(F.sum("n_cur").alias("s")).collect()
    )
    want = {
        r.event_type: r.n
        for r in cur.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert {r.event_type: r.s for r in n_cur_total} == want

    # replay over the same files with the SAME checkpoint: no new work
    stream2 = spark.readStream.schema(cur.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/*")
    q2 = drift.foreach_batch_psi(stream2, ref_path, reports, ckpt)
    assert q2.awaitTermination(120), 'stream did not drain'
    got2 = spark.read.option("basePath", reports).parquet(reports)
    assert got2.count() == got.count()


def test_approx_frozen_reference_monitor_within_tolerance(
    spark, sf_dir, tmp_path
):
    """freeze_reference(approx=True) — the 100 TB artifact — must
    produce per-type PSI within PSI_APPROX_TOL of the exact-cut batch
    audit (the calibrated contract of dq_distribution_drift_approx),
    with identical n_ref / n_cur (counts don't depend on cuts)."""
    from deep_field_spark.queries.events import PSI_APPROX_TOL

    ref, cur = _halves(spark, sf_dir)
    ref_path = str(tmp_path / "ref_approx")
    drift.freeze_reference(ref, ref_path, approx=True)

    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    cur.coalesce(1).write.mode("overwrite").parquet(f"{src}/all")
    stream = spark.readStream.schema(cur.schema).parquet(f"{src}/*")
    q = drift.foreach_batch_psi(
        stream, ref_path, str(tmp_path / "reports"), str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(120), 'stream did not drain'

    got = {
        r.event_type: (r.n_ref, r.n_cur, r.psi)
        for r in spark.read.parquet(str(tmp_path / "reports")).collect()
    }
    want = {
        r.event_type: (r.n_ref, r.n_cur, r.psi)
        for r in REGISTRY["dq_distribution_drift"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for t in want:
        assert got[t][:2] == want[t][:2], (t, got[t], want[t])
        assert abs(got[t][2] - want[t][2]) <= PSI_APPROX_TOL, (
            t, got[t][2], want[t][2],
        )
