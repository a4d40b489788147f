"""iter_checkpoint: the cluster fault-tolerance posture as code — the
iterative loops (PageRank, components) sever lineage with a RELIABLE
checkpoint when the session has a checkpoint dir, localCheckpoint
otherwise (r6 verdict #7)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from deep_field_spark.operators.components import connected_components
from deep_field_spark.operators.iterate import iter_checkpoint
from deep_field_spark.queries import load_registry

REGISTRY = load_registry()


def _set_dir(spark, d):
    spark.sparkContext.setCheckpointDir(d)


def _clear_dir(spark):
    getattr(spark._jsc.sc(), "checkpointDir_$eq")(spark._jvm.scala.Option.empty())


def _dir_files(d):
    return [
        os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs
    ]


def test_iter_checkpoint_switches_on_checkpoint_dir(spark, tmp_path):
    assert spark.sparkContext.getCheckpointDir() is None
    df = spark.range(100).select("id", (F.col("id") * 2).alias("v"))
    local = iter_checkpoint(df)
    assert local.count() == 100

    d = str(tmp_path / "ckpt")
    _set_dir(spark, d)
    try:
        reliable = iter_checkpoint(df)
        assert reliable.count() == 100
        # the reliable path writes RDD checkpoint files into the dir
        assert _dir_files(d), "no checkpoint files — localCheckpoint was used"
    finally:
        _clear_dir(spark)
    assert spark.sparkContext.getCheckpointDir() is None


def test_iterative_loops_run_under_reliable_checkpointing(spark, sf_dir, tmp_path):
    """graph_pagerank and connected_components must produce the same
    answers with a checkpoint dir set (reliable mode) as without —
    and actually use the dir."""
    d = str(tmp_path / "ckpt_loops")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    base = {
        (r.v, r.comp) for r in connected_components(pairs).collect()
    }
    pr_base = {
        (r.node, round(r.centrality, 6))
        for r in REGISTRY["graph_pagerank"].fn(spark, sf_dir).collect()
    }
    _set_dir(spark, d)
    try:
        got = {(r.v, r.comp) for r in connected_components(pairs).collect()}
        pr_got = {
            (r.node, round(r.centrality, 6))
            for r in REGISTRY["graph_pagerank"].fn(spark, sf_dir).collect()
        }
        assert _dir_files(d)
    finally:
        _clear_dir(spark)
    assert got == base
    assert pr_got == pr_base
