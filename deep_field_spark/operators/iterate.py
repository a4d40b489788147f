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

from pyspark.sql import DataFrame


def iter_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir():
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
