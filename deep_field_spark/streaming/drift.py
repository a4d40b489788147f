"""Streaming distribution-drift monitor: the day-2 twin of the batch
PSI audit (queries/events.dq_distribution_drift).

The batch query answers "did this half-month drift against that one?";
production wants the same answer PER ARRIVING MICRO-BATCH against a
FROZEN reference — the monitoring posture of every feature-store /
model-serving deployment, and the DQ sibling of the LSH/IVF streaming
ingests (operators/lsh_state.py, operators/ivf_state.py):

- ``freeze_reference``: the reference deciles AND per-bin reference
  counts are computed ONCE from the batch build and persisted — a
  |event_types|-row artifact. Day-2 never re-reads the reference data.
- ``foreach_batch_psi``: each micro-batch is binned against the frozen
  cuts (a broadcast join — the batch never shuffles), reduced to
  (type, bin) counts via partial aggregation, folded into per-type PSI
  with the exact formula/smoothing/DECIMAL discipline of the batch
  query, and the per-batch report lands in
  ``{report_path}/batch_id={id}`` (overwrite per batch id — a
  crash-replayed batch rewrites the identical report, so the monitor
  is replay-idempotent; there is no absorb step to order against).

At 100 TB: the frozen artifact is bounded by the type vocabulary, each
micro-batch moves only its own (type, bin) counts, and nothing
corpus-sized ever shuffles. Equivalence with the batch query is pinned
in tests/test_streaming_drift.py: a single-micro-batch stream over the
"current" half reproduces dq_distribution_drift's PSI values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import stats


def _psi_conf() -> tuple[int, float]:
    # lazy: queries.events registers into the queries package, which
    # imports this streaming package first — a module-level import
    # here would be circular
    from ..queries.events import PSI_BINS, PSI_SMOOTH

    return PSI_BINS, PSI_SMOOTH


def freeze_reference(
    ref: DataFrame, path: str, *, approx: bool = False
) -> None:
    """Persist the frozen reference artifact: (event_type, cs, rns, nr)
    — decile cutpoints, per-bin counts (index = bin), and the total.
    One row per event type; the entire day-2 monitor reads only this.

    ``approx=True`` cuts at percentile_approx instead of the exact
    percentile — the 100 TB posture: the exact form is a sort-based
    aggregate whose per-type group is corpus-sized at scale, while the
    GK sketch is a mergeable partial aggregation with bounded memory.
    Day-2 PSI values shift by at most the calibrated tolerance
    (queries/events.dq_distribution_drift_approx measures the exact/
    approx flanks side by side and asserts the gap in-row)."""
    PSI_BINS, PSI_SMOOTH = _psi_conf()
    qs = F.array(*[F.lit((i + 1) / PSI_BINS) for i in range(PSI_BINS - 1)])
    if approx:
        from ..queries.events import PSI_APPROX_ACC

        cut_expr = F.percentile_approx("value", qs, F.lit(PSI_APPROX_ACC))
    else:
        # exact cuts are DECIMAL-quantized so the frozen artifact bins
        # identically to the batch audit and its DuckDB oracle (raw
        # percentile interpolation is 1-ulp engine-dependent —
        # functions/stats.py; sketch cuts stay raw, their tolerance
        # contract absorbs it)
        cut_expr = stats.quantized_cuts(F.percentile("value", qs))
    cuts = ref.groupBy("event_type").agg(cut_expr.alias("cs"))
    v = F.col("value")
    rb = (
        ref.join(F.broadcast(cuts), "event_type")
        .select(
            "event_type",
            F.size(F.filter(F.col("cs"), lambda c: c < v)).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("n"))
    )
    grid = cuts.select(
        "event_type",
        F.explode(F.array(*[F.lit(i) for i in range(PSI_BINS)])).alias("bin"),
    )
    rns = (
        grid.join(rb, ["event_type", "bin"], "left")
        .select("event_type", "bin", F.coalesce("n", F.lit(0)).alias("n"))
        .groupBy("event_type")
        .agg(
            F.sort_array(F.collect_list(F.struct("bin", "n"))).alias("bn"),
        )
        .select(
            "event_type",
            F.col("bn.n").alias("rns"),
            F.aggregate("bn.n", F.lit(0).cast("long"), lambda a, x: a + x)
            .alias("nr"),
        )
    )
    cuts.join(rns, "event_type").write.mode("overwrite").parquet(path)


def batch_psi(batch_df: DataFrame, ref: DataFrame) -> DataFrame:
    """(event_type, n_ref, n_cur, psi) of one batch of (event_type,
    value) rows against the frozen reference — the exact smoothing and
    DECIMAL(28,18) term discipline of dq_distribution_drift, so a
    single-batch stream reproduces the batch audit bit-for-bit. Types
    absent from the batch produce no row (a monitor reports on what
    arrived); types absent from the REFERENCE are dropped by the
    broadcast join (no cuts to bin against — surface them upstream via
    a vocabulary audit, not a NULL-bin PSI)."""
    PSI_BINS, PSI_SMOOTH = _psi_conf()
    v = F.col("value")
    cb = (
        batch_df.join(F.broadcast(ref.select("event_type", "cs")), "event_type")
        .select(
            "event_type",
            F.size(F.filter(F.col("cs"), lambda c: c < v)).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("n_c"))
    )
    tot_c = cb.groupBy("event_type").agg(F.sum("n_c").alias("nc"))
    grid = ref.select(
        "event_type", "nr", F.posexplode("rns").alias("bin", "n_r")
    )
    j = (
        grid.join(cb, ["event_type", "bin"], "left")
        .join(F.broadcast(tot_c), "event_type")
    )
    p = (F.col("n_r") + PSI_SMOOTH) / (F.col("nr") + PSI_BINS * PSI_SMOOTH)
    q = (F.coalesce(F.col("n_c"), F.lit(0)) + PSI_SMOOTH) / (
        F.col("nc") + PSI_BINS * PSI_SMOOTH
    )
    term = ((q - p) * F.log(q / p)).cast("decimal(28,18)")
    return j.groupBy("event_type").agg(
        F.first("nr").alias("n_ref"),
        F.first("nc").alias("n_cur"),
        F.round(F.sum(term).cast("decimal(28,18)"), 6)
        .cast("double")
        .alias("psi"),
    )


def foreach_batch_psi(
    stream_df: DataFrame,
    ref_path: str,
    report_path: str,
    checkpoint: str,
):
    """Attach the PSI monitor to a stream of (event_type, value) rows:
    per micro-batch, the drift report lands in
    ``{report_path}/batch_id={id}``. Overwrite-per-batch-id makes a
    crash-replayed batch rewrite the identical report (the monitor has
    no state to absorb, so report-then-absorb ordering is moot here —
    contrast lsh_state/ivf_state.foreach_batch_ingest)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ref = batch_df.sparkSession.read.parquet(ref_path)
        report = batch_psi(batch_df, ref)
        report.write.mode("overwrite").parquet(
            f"{report_path}/batch_id={batch_id}"
        )

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
