"""Bucketed-state compaction (sinks.compact_bucketed via
ivf_state.compact / lsh_state.compact): every ingest appends up to
num_buckets small files, so day-N state accumulates the classic
small-file problem. Compaction must (a) shrink to one file per
bucket, (b) leave results identical, (c) preserve the bucket spec so
the probe join stays exchange-free, and (d) keep the state
ingestable afterwards."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from deep_field_spark.catalog import table
from deep_field_spark.operators import ivf_state, lsh_state
from deep_field_spark.operators.ivf_state import STATE_BUCKETS
from deep_field_spark.queries.dedup import BANDS, NGRAM, NUM_HASHES
from deep_field_spark.queries.similarity import (
    EMB_INCR_MIN,
    IVF_STATE_K,
    IVF_STATE_NPROBE,
    _lloyd_centroids,
)


@pytest.fixture()
def state_name(spark):
    name = f"cmpst_{uuid.uuid4().hex[:8]}"
    yield name
    ivf_state.drop(spark, name)
    lsh_state.drop(spark, f"{name}_lsh")


def test_ivf_compact_one_file_per_bucket_same_answers(
    spark, sf_dir, state_name
):
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < EMB_INCR_MIN)
    ivf_state.build(base, _lloyd_centroids(base, k=16), state_name)
    # five ingests -> up to 5*num_buckets extra files
    for lo in range(EMB_INCR_MIN, EMB_INCR_MIN + 50, 10):
        ivf_state.ingest(
            spark,
            state_name,
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 10)),
        )
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )

    def run():
        return {
            (r.qid, r.rnk, r.neighbor_id, r.cos_sim)
            for r in ivf_state.search(
                spark, state_name, q, k=IVF_STATE_K, nprobe=IVF_STATE_NPROBE
            ).collect()
        }

    before = run()
    stats = ivf_state.compact(spark, state_name)
    assert stats["files_before"] > STATE_BUCKETS, stats
    assert stats["files_after"] <= STATE_BUCKETS, stats
    assert run() == before

    # the bucket contract survives the rewrite: exchange-free probe
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            ivf_state.search(
                spark, state_name, q, k=IVF_STATE_K, nprobe=IVF_STATE_NPROBE
            )
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    lines = plan.splitlines()
    scans = [
        i for i, l in enumerate(lines)
        if "FileScan" in l and f"{state_name}_cells" in l
    ]
    assert scans, plan
    for i in scans:
        above = "\n".join(lines[max(0, i - 2): i])
        assert "Exchange" not in above, plan

    # still ingestable: the anti-join sees the compacted rows
    post = ivf_state.ingest(
        spark,
        state_name,
        emb.filter(
            (F.col("vec_id") >= EMB_INCR_MIN)
            & (F.col("vec_id") < EMB_INCR_MIN + 60)
        ),
    )
    assert post.count() == 10  # only 450-459 are new
    assert (
        spark.table(f"{state_name}_cells").count() == EMB_INCR_MIN + 60
    )


def test_lsh_compact_both_tables(spark, sf_dir, state_name):
    docs = table(spark, sf_dir, "documents")
    name = f"{state_name}_lsh"
    lsh_state.build(
        docs.filter(F.col("doc_id") < 200),
        name,
        ngram=NGRAM,
        num_hashes=NUM_HASHES,
        bands=BANDS,
    )
    for lo in (200, 250):
        lsh_state.ingest(
            spark,
            name,
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 50)),
            ngram=NGRAM,
            num_hashes=NUM_HASHES,
            bands=BANDS,
            threshold=0.6,
        )
    n_sh = spark.table(f"{name}_shingles").count()
    n_bd = spark.table(f"{name}_bands").count()
    stats = lsh_state.compact(spark, name)
    for t in ("shingles", "bands"):
        assert stats[t]["files_after"] <= STATE_BUCKETS, stats
        assert stats[t]["files_after"] < stats[t]["files_before"], stats
    assert spark.table(f"{name}_shingles").count() == n_sh
    assert spark.table(f"{name}_bands").count() == n_bd


def test_attach_heals_a_crashed_compact_swap(spark, sf_dir, state_name):
    """A compact() killed mid-swap leaves the cell directory under a
    side name and the catalog entry dropped; the next attach() must
    restore the directory (sinks.recover_swapped_location) and
    re-register the table — serving heals on attach, not only on a
    compact re-run. A recovery-path compact reports recovered=True so
    progress gates don't misread it as a no-op."""
    import os

    from deep_field_spark.operators.lsh_state import _location

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < EMB_INCR_MIN)
    ivf_state.build(base, _lloyd_centroids(base, k=16), state_name)
    loc = _location(spark, f"{state_name}_cells")

    # simulate the crash window: table dropped, live dir renamed away
    spark.sql(f"DROP TABLE IF EXISTS {state_name}_cells")
    os.rename(loc, f"{loc}__compact")

    ivf_state.attach(spark, state_name)
    assert spark.table(f"{state_name}_cells").count() == EMB_INCR_MIN

    # a compact over the healed state reports honestly
    stats = ivf_state.compact(spark, state_name)
    assert stats["recovered"] is False
    assert spark.table(f"{state_name}_cells").count() == EMB_INCR_MIN

    # and a compact that itself performs the recovery flags it
    spark.sql(f"DROP TABLE IF EXISTS {state_name}_cells")
    os.rename(loc, f"{loc}__old")
    stats = ivf_state.compact(spark, state_name)
    assert stats["recovered"] is True
    assert spark.table(f"{state_name}_cells").count() == EMB_INCR_MIN


def test_compact_aborts_on_concurrent_append(spark, sf_dir, state_name):
    """A writer that appends between compaction's staging read and the
    directory swap must ABORT the compaction (live dir untouched,
    appended rows kept), not silently lose the appended files with the
    __old rmtree (advisor r8). Simulated by appending via a monkey-
    patched write_bucketed hook that fires after staging is written."""
    import os
    import shutil

    from deep_field_spark import sinks
    from deep_field_spark.operators.lsh_state import _location

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < EMB_INCR_MIN)
    ivf_state.build(base, _lloyd_centroids(base, k=16), state_name)
    loc = _location(spark, f"{state_name}_cells")

    orig = sinks.write_bucketed
    appended = {}

    def hooked(df, tbl, cols, nb, **kw):
        orig(df, tbl, cols, nb, **kw)
        if tbl.endswith("__compact_tmp") and not appended:
            # the concurrent ingest lands AFTER staging is complete
            appended["report"] = ivf_state.ingest(
                spark,
                state_name,
                emb.filter(
                    (F.col("vec_id") >= EMB_INCR_MIN)
                    & (F.col("vec_id") < EMB_INCR_MIN + 10)
                ),
            )

    sinks.write_bucketed = hooked
    try:
        with pytest.raises(RuntimeError, match="concurrent"):
            ivf_state.compact(spark, state_name)
    finally:
        sinks.write_bucketed = orig

    # live state intact: base rows + the concurrently-ingested batch
    assert spark.table(f"{state_name}_cells").count() == EMB_INCR_MIN + 10
    # staging discarded, no swap-side leftovers
    assert not os.path.exists(f"{loc}__compact")
    assert not os.path.exists(f"{loc}__old")
    # and a quiet-window re-run succeeds
    stats = ivf_state.compact(spark, state_name)
    assert stats["files_after"] <= STATE_BUCKETS
    assert spark.table(f"{state_name}_cells").count() == EMB_INCR_MIN + 10
    shutil.rmtree(f"{loc}__old", ignore_errors=True)


def test_bucket_spec_persisted_and_validated(spark, sf_dir, state_name):
    """The build persists _bucket_spec.json beside the cell table; a
    fresh-catalog attach() with no argument re-registers the TRUE
    bucket count even when it isn't the default, and an explicit
    contradictory count raises instead of registering a layout that
    lies about the files (advisor r8)."""
    from deep_field_spark import sinks
    from deep_field_spark.operators.lsh_state import _location

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < EMB_INCR_MIN)
    ivf_state.build(
        base, _lloyd_centroids(base, k=16), state_name, num_buckets=4
    )
    loc = _location(spark, f"{state_name}_cells")
    assert sinks.read_bucket_spec(loc) == {
        "bucket_cols": ["cid"],
        "num_buckets": 4,
    }

    # compact with the (wrong) default must refuse, not corrupt
    with pytest.raises(ValueError, match="bucket-count mismatch"):
        ivf_state.compact(spark, state_name, num_buckets=STATE_BUCKETS)

    # fresh-catalog attach with no argument picks up the real count
    spark.sql(f"DROP TABLE {state_name}_cells")
    ivf_state.attach(spark, state_name)
    ddl = spark.sql(
        f"SHOW CREATE TABLE {state_name}_cells"
    ).first()[0]
    assert "INTO 4 BUCKETS" in ddl, ddl

    # spec-default compact keeps the true layout and survives the swap
    stats = ivf_state.compact(spark, state_name)
    assert stats["files_after"] <= 4
    assert sinks.read_bucket_spec(loc)["num_buckets"] == 4

    # attach with an explicit contradictory count raises too
    spark.sql(f"DROP TABLE {state_name}_cells")
    with pytest.raises(ValueError, match="bucket-count mismatch"):
        ivf_state.attach(spark, state_name, num_buckets=STATE_BUCKETS)
    ivf_state.attach(spark, state_name)

    # and the day-2 INGEST resolves the true count from the spec too —
    # a hardcoded default would either fail Spark's append validation
    # or silently land 8-bucket files under the 4-bucket spec
    ivf_state.ingest(
        spark,
        state_name,
        emb.filter(
            (F.col("vec_id") >= EMB_INCR_MIN)
            & (F.col("vec_id") < EMB_INCR_MIN + 10)
        ),
    )
    assert spark.table(f"{state_name}_cells").count() == EMB_INCR_MIN + 10


def test_never_built_state_attach_message(spark, state_name):
    """attach() of a state that was never built names both the missing
    location and the swap-side candidates it checked (advisor r8: the
    bare FileNotFoundError(location) hid 'never built' vs 'lost both
    swap sides')."""
    with pytest.raises(FileNotFoundError, match="never built"):
        ivf_state.attach(spark, f"{state_name}_nonexistent")
