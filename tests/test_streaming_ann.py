"""Streaming ANN serving (streaming/ann_serve.py): micro-batches of
queries answered from the persisted IVFPQ state, equivalence with the
batch serve + replay idempotence pinned. (The single-batch twin
streaming_ann_serve is oracle-gated in tests/test_queries_oracle.py —
these tests cover what the oracle can't: batch partitioning and
checkpoint replay.)"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from deep_field_spark.catalog import table
from deep_field_spark.queries.similarity import (
    ADC_K,
    QUERY_MOD,
    _ivfpq_build,
    _ivfpq_serve_state,
)
from deep_field_spark.streaming import ann_serve


def _rows(df):
    return {
        (r.qid, r.rnk, r.neighbor_id, r.adc_dist)
        for r in df.select("qid", "rnk", "neighbor_id", "adc_dist").collect()
    }


def test_multi_batch_serving_and_replay(spark, sf_dir, tmp_path):
    """Per-query top-k is independent of batch membership, so serving
    the query sample in TWO micro-batches must produce exactly the
    union the batch path produces in one pass — and a checkpoint
    replay over the same files must add no new work (read-only
    serving: the overwrite-per-batch reports are the only output)."""
    name = _ivfpq_build(spark, sf_dir)
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    want = _rows(_ivfpq_serve_state(spark, name, q, k=ADC_K))
    assert want, "query sample must not be empty"

    src = str(tmp_path / f"queries_{uuid.uuid4().hex[:6]}")
    half = F.col("qid") % (2 * QUERY_MOD) == 0
    q.filter(half).coalesce(1).write.parquet(f"{src}/f1")
    q.filter(~half).coalesce(1).write.parquet(f"{src}/f2")

    reports = str(tmp_path / "reports")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(q.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/*")
    sq = ann_serve.foreach_batch_ann_serve(
        stream, name, reports, ckpt, k=ADC_K
    )
    assert sq.awaitTermination(120), "stream did not drain"

    got = spark.read.option("basePath", reports).parquet(reports)
    batch_ids = {r.batch_id for r in got.select("batch_id").distinct().collect()}
    assert len(batch_ids) == 2, batch_ids
    assert _rows(got) == want

    # replay over the same files with the SAME checkpoint: no new work
    stream2 = spark.readStream.schema(q.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/*")
    sq2 = ann_serve.foreach_batch_ann_serve(
        stream2, name, reports, ckpt, k=ADC_K
    )
    assert sq2.awaitTermination(120), "stream did not drain"
    assert _rows(spark.read.option("basePath", reports).parquet(reports)) == want
