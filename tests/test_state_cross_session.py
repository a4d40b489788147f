"""The REAL day-2 cluster contract for persisted state artifacts:
state built by one Spark application, attached and served by a
DIFFERENT application (fresh JVM, bare conf-less session, empty
catalog) via the shared-storage root conf — not merely re-registered
after a catalog drop inside the builder's own session (that path is
covered in tests/test_ivf_state.py / the lsh_state suite).

One subprocess round-trip covers both state families: the child
process attaches the IVF state AND the LSH state from the root the
parent wrote, runs a probe search, pins the exchange-free bucketed
read IN THE CHILD (SelectedBucketsCount / no Exchange above the cell
scan on a session that never saw the build), and emits its rows for
the parent to compare against the builder-session results."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
import uuid

from pyspark.sql import functions as F

from deep_field_spark.catalog import table
from deep_field_spark.operators import ivf_state, lsh_state
from deep_field_spark.queries.similarity import (
    EMB_INCR_MIN,
    IVF_STATE_K,
    IVF_STATE_NPROBE,
    _lloyd_centroids,
)

ROOT_CONF = "spark.deepfield.lshStateRoot"

_CHILD = r"""
import json, sys
from pyspark.sql import SparkSession, functions as F

root, name, sf_dir = sys.argv[1:4]
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .config("@ROOT_CONF@", root)
    .appName("xsess-attach-child")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from deep_field_spark.operators import ivf_state, lsh_state

assert not spark.catalog.tableExists(name + "_cells")
ivf_state.attach(spark, name)
emb = spark.read.parquet(sf_dir + "/embeddings.parquet")
q = emb.filter(F.col("vec_id") % 100 == 0).select(
    F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
)
res = ivf_state.search(spark, name, q, k=@K@, nprobe=@NPROBE@)
old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
plan = res._jdf.queryExecution().executedPlan().toString()
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
lines = plan.splitlines()
scans = [i for i, l in enumerate(lines)
         if "FileScan" in l and name + "_cells" in l]
assert scans, plan
for i in scans:
    above = "\n".join(lines[max(0, i - 2): i])
    assert "Exchange" not in above, plan
assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan

rows = sorted(
    (r.qid, r.rnk, r.neighbor_id, r.cos_sim) for r in res.collect()
)

# day-2 WRITE from the fresh application: ingest a new batch against
# the frozen centroids through the attached catalog entries
batch = emb.filter(
    (F.col("vec_id") >= 400) & (F.col("vec_id") < 410)
).select("vec_id", "embedding")
ing = ivf_state.ingest(spark, name, batch).count()
n_cells = spark.table(name + "_cells").count()

# the LSH artifact attaches in the same fresh catalog too
lsh_state.attach(spark, name + "_lsh")
n_bands = spark.table(name + "_lsh_bands").count()
n_shingles = spark.table(name + "_lsh_shingles").count()

print(json.dumps({"rows": rows, "bands": n_bands,
                  "shingles": n_shingles, "ingested": ing,
                  "cells_after": n_cells}))
"""


@pytest.mark.slow
def test_state_attaches_in_fresh_process(spark, sf_dir, tmp_path):
    name = f"xsess_{uuid.uuid4().hex[:8]}"
    root = str(tmp_path / "stateroot")
    old = spark.conf.get(ROOT_CONF, None)
    spark.conf.set(ROOT_CONF, root)
    try:
        emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        base = emb.filter(F.col("vec_id") < EMB_INCR_MIN)
        ivf_state.build(base, _lloyd_centroids(base, k=16), name)
        q = emb.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
        )
        want_rows = sorted(
            [r.qid, r.rnk, r.neighbor_id, r.cos_sim]
            for r in ivf_state.search(
                spark, name, q, k=IVF_STATE_K, nprobe=IVF_STATE_NPROBE
            ).collect()
        )
        from deep_field_spark.queries.dedup import BANDS, NGRAM, NUM_HASHES

        docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
        lsh_state.build(
            docs,
            f"{name}_lsh",
            ngram=NGRAM,
            num_hashes=NUM_HASHES,
            bands=BANDS,
        )
        want_bands = spark.table(f"{name}_lsh_bands").count()
        want_shingles = spark.table(f"{name}_lsh_shingles").count()

        child = (
            _CHILD.replace("@ROOT_CONF@", ROOT_CONF)
            .replace("@K@", str(IVF_STATE_K))
            .replace("@NPROBE@", str(IVF_STATE_NPROBE))
        )
        out = subprocess.run(
            [sys.executable, "-c", child, root, name, sf_dir],
            capture_output=True,
            text=True,
            timeout=300,
            cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr[-4000:]
        got = json.loads(out.stdout.strip().splitlines()[-1])
        assert got["rows"] == want_rows
        assert got["bands"] == want_bands
        assert got["shingles"] == want_shingles
        # the child's day-2 ingest (vec_id 400-409, absent from the
        # parent's base build) absorbed exactly once, and the parent
        # session sees the child's append through the shared root
        assert got["ingested"] == 10
        assert got["cells_after"] == EMB_INCR_MIN + 10
        spark.catalog.refreshTable(f"{name}_cells")
        assert spark.table(f"{name}_cells").count() == EMB_INCR_MIN + 10
    finally:
        ivf_state.drop(spark, name)
        lsh_state.drop(spark, f"{name}_lsh")
        if old is None:
            spark.conf.unset(ROOT_CONF)
        else:
            spark.conf.set(ROOT_CONF, old)
