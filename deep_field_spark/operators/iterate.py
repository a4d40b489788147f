"""Lineage control for iterative-loop state (PageRank, Lloyd's,
pointer-jumping components, GD trainers).

Each round must sever the state's lineage or round N's plan contains
rounds 1..N-1 as subtrees (O(iters^2) stages — measured 58 s -> 10 s
on graph_pagerank). HOW it is severed is an environment decision:

- ``localCheckpoint`` keeps the materialized partitions on executor
  block stores — free of a durable FS, the right call on local[n],
  but NOT fault-tolerant: lose an executor mid-loop on a cluster and
  the job fails (the lineage that could recompute the blocks is gone).
- ``checkpoint`` writes to the SparkContext's checkpoint directory —
  survives executor loss, the cluster posture, but needs
  ``spark.sparkContext.setCheckpointDir(...)`` pointing at shared
  storage (HDFS/S3).

``iter_checkpoint`` makes the stated cluster posture code instead of
prose: reliable checkpoint whenever the session has a checkpoint dir,
localCheckpoint otherwise. A cluster deployment opts in with one
setCheckpointDir call and every iterative loop upgrades.

Retention caveat for the reliable path: Spark never deletes reliable
checkpoint files on its own — each loop iteration leaves one full
materialized state copy in the checkpoint dir, unbounded growth for a
long-running trainer. Deployments that call setCheckpointDir MUST also
set ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` so
checkpoints whose RDDs go out of scope are garbage-collected (the
final state survives as long as its DataFrame is referenced); see the
cluster-posture notes in SCALE.md.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


def iter_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir():
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


@contextmanager
def pinned_loop(spark: SparkSession) -> Iterator[None]:
    """Scope AQE off for an iterative loop whose physical layout is
    already statically pinned (edges/state repartitioned+sorted on the
    round key at an explicitly derived partition count — the
    iter_checkpoint loop discipline).

    Inside such a loop AQE cannot improve the plan — coalescing is
    moot (the partition count is the deliberately derived
    scaling.loop_partitions value, and checkpointed LogicalRDD leaves
    pin it) — but it still materializes every Exchange as a separate
    query stage, i.e. one driver barrier per shuffle per round.
    Measured on graph_pagerank at sf0.1 (interleaved A/B, both
    orders): 5 rounds 6.2-6.5 s with AQE vs 3.7-5.0 s without,
    bit-identical results. The cost is relative, not absolute: the
    same per-round barriers exist at any scale, they just amortize
    against larger stages. Trade-off: forgoing AQE's runtime
    skew-split INSIDE the loop — acceptable where the loop key's skew
    is bounded by construction (degree-bounded graphs, k-bounded
    centroid states); a deployment that needs it back re-enables AQE
    around the loop it cares about. The session value is restored on
    exit, so only the loop's own stages are affected."""
    conf = spark.conf
    key = "spark.sql.adaptive.enabled"
    saved = conf.get(key)
    try:
        conf.set(key, "false")
        yield
    finally:
        conf.set(key, saved)
