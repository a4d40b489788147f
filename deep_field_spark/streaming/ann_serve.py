"""Streaming ANN serving: queries arrive as micro-batches and are
answered from the PERSISTED IVFPQ state — the retrieval sibling of the
PSI drift monitor (streaming/drift.py) and the read-side complement of
the streaming ingests (operators/ivf_state.foreach_batch_ingest).

Production retrieval is exactly this shape: the index is built (or
incrementally ingested) by one job, and a serving loop answers query
batches against it — probe ``nprobe`` cells from the broadcast
centroids, join the code-only bucketed cell table exchange-free on
cid, ADC-score the probed codes against each query's bounded LUT.
Per micro-batch, the only data in motion is |batch| x nprobe probe
rows and the probed codes; the corpus-sized cell table never moves.

Reports land in ``{report_path}/batch_id={id}`` with mode=overwrite —
the established replay-idempotence contract (a crash-replayed batch
rewrites the identical report; serving is read-only against the
state, so there is no absorb step to order against).

Equivalence with the batch path is driver-gated: the registered twin
(queries/similarity.streaming_ann_serve) drives the standard query
sample through a single availableNow micro-batch and shares
ann_ivfpq_search's oracle; multi-batch partitioning + checkpoint
replay are pinned in tests/test_streaming_ann.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def foreach_batch_ann_serve(
    stream_df: DataFrame,
    name: str,
    report_path: str,
    checkpoint: str,
    *,
    k: int,
    nprobe: int | None = None,
):
    """Attach an IVFPQ serving loop to a stream of (qid, q_emb) query
    rows: each micro-batch is answered from the attached state
    ``name`` (built by queries/similarity._ivfpq_build or
    ivf_state.build with PQ codes + the ``pq`` aux table) and its
    top-``k`` report lands batch-id-keyed under ``report_path``."""
    # lazy: queries.similarity registers into the queries package,
    # which imports this streaming package first — a module-level
    # import here would be circular (the drift.py precedent)
    from ..queries.similarity import IVFPQ_NPROBE, _ivfpq_serve_state

    np_ = IVFPQ_NPROBE if nprobe is None else nprobe

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        report = _ivfpq_serve_state(spark, name, batch_df, k=k, nprobe=np_)
        report.write.mode("overwrite").parquet(
            f"{report_path}/batch_id={batch_id}"
        )

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
