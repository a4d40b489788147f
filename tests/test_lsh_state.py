"""Persisted LSH state (operators/lsh_state): the day-2 incremental
near-dup ingestion artifact — state on disk as bucketed tables, batches
joined against it, exactly-once candidate emission on replay."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from deep_field_spark.catalog import table
from deep_field_spark.operators import lsh_state
from deep_field_spark.queries.dedup import (
    BANDS,
    MINHASH_THRESHOLD,
    NGRAM,
    NUM_HASHES,
)

KW = dict(
    ngram=NGRAM, num_hashes=NUM_HASHES, bands=BANDS, threshold=MINHASH_THRESHOLD
)


@pytest.fixture()
def state_name(spark):
    name = f"lshst_{uuid.uuid4().hex[:8]}"
    yield name
    lsh_state.drop(spark, name)


def _brute_best(docs, lo, hi, corpus_hi):
    """Reference answer: best exact-Jaccard corpus match per batch doc
    computed with NO LSH (full join) — the state path may only differ
    by missing sub-threshold rows LSH never promises (none planted
    here below band-collision reach at this threshold)."""
    from deep_field_spark.functions import texting
    from deep_field_spark.operators import dedup as D
    from pyspark.sql import Window

    sh = D.shingled(docs, "text", "doc_id", NGRAM)
    b = sh.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    c = sh.filter(F.col("doc_id") < corpus_hi).select(
        F.col("doc_id").alias("cid"), F.col("shingles").alias("shc")
    )
    pair = (
        b.crossJoin(c)
        .withColumn("jac", texting.jaccard(F.col("shingles"), F.col("shc")))
        .filter(F.col("jac") >= MINHASH_THRESHOLD)
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("jac"), F.asc("cid"))
    return {
        (r.doc_id, r.cid, round(r.jac, 6))
        for r in pair.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }


def test_two_batch_ingest_exactly_once(spark, sf_dir, state_name):
    docs = table(spark, sf_dir, "documents")
    lsh_state.build(docs.filter(F.col("doc_id") < 300), state_name, **{
        k: v for k, v in KW.items() if k != "threshold"
    })

    batch_a = docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
    batch_b = docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 500))

    # batch A: every doc reported once; matches agree with brute force
    ra = lsh_state.ingest(spark, state_name, batch_a, **KW)
    a_rows = ra.collect()
    assert len(a_rows) == batch_a.count()
    assert len({r.doc_id for r in a_rows}) == len(a_rows)
    got_a = {
        (r.doc_id, r.dup_of, r.jaccard) for r in a_rows if r.dup_of is not None
    }
    assert got_a == _brute_best(docs, 300, 400, 300)

    # replayed ingest of batch A: exactly-once — all docs already
    # absorbed, nothing re-emitted, state tables unchanged
    n_bands = spark.table(f"{state_name}_bands").count()
    assert lsh_state.ingest(spark, state_name, batch_a, **KW).count() == 0
    assert spark.table(f"{state_name}_bands").count() == n_bands

    # batch B sees corpus + batch A as its state
    rb = lsh_state.ingest(spark, state_name, batch_b, **KW)
    got_b = {
        (r.doc_id, r.dup_of, r.jaccard)
        for r in rb.collect()
        if r.dup_of is not None
    }
    assert got_b == _brute_best(docs, 400, 500, 400)


def test_state_join_is_colocated_on_buckets(spark, sf_dir, state_name):
    """The candidate join against the state's (band, key) bucketed
    table must not exchange the corpus side — the whole point of
    paying the bucket shuffle at build time."""
    docs = table(spark, sf_dir, "documents")
    lsh_state.build(docs.filter(F.col("doc_id") < 300), state_name, **{
        k: v for k, v in KW.items() if k != "threshold"
    })
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        report = lsh_state.ingest(
            spark, state_name,
            docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 350)),
            append=False, **KW,
        )
        plan = report._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # both state scans are bucketed relations: no Exchange directly
    # above a state-table file scan
    lines = plan.splitlines()
    scans = [
        i for i, l in enumerate(lines)
        if "FileScan" in l and state_name in l
    ]
    assert scans, plan
    for i in scans:
        above = "\n".join(lines[max(0, i - 2): i])
        assert "Exchange" not in above, plan
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan


def test_streaming_ingest_foreach_batch(spark, sf_dir, state_name, tmp_path):
    """Streaming day-2 ingestion: docs arriving as micro-batches are
    deduped against and absorbed into the persisted state; per-batch
    reports land batch-id-keyed; a second availableNow pass over the
    same files ingests nothing new."""
    import os

    docs = table(spark, sf_dir, "documents")
    lsh_state.build(docs.filter(F.col("doc_id") < 300), state_name, **{
        k: v for k, v in KW.items() if k != "threshold"
    })

    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400)).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{src}/f1")
    reports = str(tmp_path / "reports")
    ckpt = str(tmp_path / "ckpt")

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/*")
    q = lsh_state.foreach_batch_ingest(stream, state_name, reports, ckpt, **KW)
    q.awaitTermination(120)

    got = spark.read.parquet(reports)
    assert got.count() == 100
    flagged = {
        (r.doc_id, r.dup_of, r.jaccard)
        for r in got.filter(F.col("dup_of").isNotNull()).collect()
    }
    assert flagged == _brute_best(docs, 300, 400, 300)

    # second batch of files, new availableNow pass: only new docs flow,
    # and they see corpus + batch-1 as their state
    docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 500)).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{src}/f2")
    stream2 = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/*")
    q2 = lsh_state.foreach_batch_ingest(stream2, state_name, reports, ckpt, **KW)
    q2.awaitTermination(120)

    got2 = spark.read.parquet(reports)
    assert got2.count() == 200  # 100 per ingested batch, no re-emission
    flagged2 = {
        (r.doc_id, r.dup_of, r.jaccard)
        for r in got2.filter(
            (F.col("dup_of").isNotNull()) & (F.col("doc_id") >= 400)
        ).collect()
    }
    assert flagged2 == _brute_best(docs, 400, 500, 400)


def test_attach_reregisters_state_in_fresh_catalog(spark, sf_dir, state_name):
    """The day-2 flow across sessions: build today, ingest tomorrow.
    Simulated by dropping the catalog ENTRIES (bytes stay on disk) and
    re-attaching — ingest must see the same state, bucket layout
    included."""
    docs = table(spark, sf_dir, "documents")
    lsh_state.build(docs.filter(F.col("doc_id") < 300), state_name, **{
        k: v for k, v in KW.items() if k != "threshold"
    })
    batch = docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 350))
    expect = {
        (r.doc_id, r.dup_of, r.jaccard)
        for r in lsh_state.ingest(
            spark, state_name, batch, append=False, **KW
        ).collect()
    }

    # "new session": in-memory catalog forgets the tables; disk keeps them
    for t in (f"{state_name}_bands", f"{state_name}_shingles"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    lsh_state.attach(spark, state_name)

    got = {
        (r.doc_id, r.dup_of, r.jaccard)
        for r in lsh_state.ingest(
            spark, state_name, batch, append=False, **KW
        ).collect()
    }
    assert got == expect
    # and the re-attached table still scans bucketed (no exchange above it)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            lsh_state.ingest(spark, state_name, batch, append=False, **KW)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan


def test_replayed_batch_keeps_original_report(spark, sf_dir, state_name, tmp_path):
    """The ADVICE r6 crash window: a micro-batch crashes AFTER ingest
    absorbed its docs but BEFORE the checkpoint commit. The replayed
    batch's anti-join excludes the absorbed docs, so its recomputed
    report is EMPTY — the guard must keep the original non-empty
    report instead of overwriting the batch's dedup evidence away."""
    docs = table(spark, sf_dir, "documents")
    lsh_state.build(docs.filter(F.col("doc_id") < 300), state_name, **{
        k: v for k, v in KW.items() if k != "threshold"
    })
    batch = docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 350))
    dest = str(tmp_path / "reports" / "batch_id=0")

    def _guarded_write(report):
        if report.isEmpty():
            jvm = spark._jvm
            p = jvm.org.apache.hadoop.fs.Path(f"{dest}/_SUCCESS")
            fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(p):
                return
        report.write.mode("overwrite").parquet(dest)

    # first attempt: report written (via on_report, BEFORE absorb),
    # docs absorbed — then the "crash" (checkpoint never commits)
    lsh_state.ingest(spark, state_name, batch, on_report=_guarded_write, **KW)
    first = spark.read.parquet(dest)
    assert first.count() == 50
    want = {(r.doc_id, r.dup_of, r.jaccard) for r in first.collect()}

    # replay: same batch, docs already in state → empty report; the
    # original evidence must survive
    replay = lsh_state.ingest(
        spark, state_name, batch, on_report=_guarded_write, **KW
    )
    assert replay.count() == 0
    kept = spark.read.parquet(dest)
    assert {(r.doc_id, r.dup_of, r.jaccard) for r in kept.collect()} == want


def test_configurable_state_root(spark, sf_dir, state_name, tmp_path):
    """spark.deepfield.lshStateRoot redirects BOTH state artifacts
    (LSH + IVF share the resolver): the production day-2 posture where
    the root is durable shared storage instead of the app-id temp
    default. Files must land under the configured root and ingest must
    work against them."""
    from deep_field_spark.operators import lsh_state

    root = str(tmp_path / "durable_state_root")
    spark.conf.set(lsh_state.ROOT_CONF, root)
    try:
        docs = table(spark, sf_dir, "documents")
        lsh_state.build(docs.filter(F.col("doc_id") < 100), state_name, **{
            k: v for k, v in KW.items() if k != "threshold"
        })
        import os
        assert os.path.isdir(f"{root}/{state_name}_bands")
        assert os.path.isdir(f"{root}/{state_name}_shingles")
        got = lsh_state.ingest(
            spark, state_name,
            docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 120)),
            append=False, **KW,
        )
        assert got.count() == 20
    finally:
        lsh_state.drop(spark, state_name)
        spark.conf.unset(lsh_state.ROOT_CONF)


def test_streaming_lifecycle_ingest_compact_ingest(
    spark, sf_dir, state_name, tmp_path
):
    """The FULL day-2 streaming lifecycle on ONE LSH state — the twin
    of test_ivf_state.py::test_streaming_lifecycle_ingest_compact_serve
    (r9 verdict #5): batch A arrives as a 2-file stream
    (foreach_batch_ingest), BOTH state tables are compacted, then batch
    B arrives as a second stream against the compacted state. Batch B's
    dedup report must equal the brute-force truth over base ∪ A (so
    candidates span the pre- and post-compaction corpus), per-batch
    reports must land exactly once, and a replayed ingest of B must be
    a no-op."""
    docs = table(spark, sf_dir, "documents")
    lsh_state.build(docs.filter(F.col("doc_id") < 300), state_name, **{
        k: v for k, v in KW.items() if k != "threshold"
    })

    def _stream_ingest(lo, hi, tag):
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        src = str(tmp_path / f"{tag}_arrivals")
        batch.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
            f"{src}/f1"
        )
        batch.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
            f"{src}/f2"
        )
        stream = spark.readStream.schema(batch.schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(f"{src}/*")
        q = lsh_state.foreach_batch_ingest(
            stream, state_name,
            str(tmp_path / f"{tag}_reports"), str(tmp_path / f"{tag}_ckpt"),
            **KW,
        )
        assert q.awaitTermination(120), f"{tag} ingest stream did not drain"
        return spark.read.option("basePath", str(tmp_path / f"{tag}_reports"))\
            .parquet(str(tmp_path / f"{tag}_reports") + "/batch_id=*")

    # --- batch A streams in (two micro-batches), then compact
    ra = _stream_ingest(300, 400, "a")
    assert ra.count() == 100
    assert ra.select("batch_id").distinct().count() == 2
    stats = lsh_state.compact(spark, state_name)
    for key in ("shingles", "bands"):
        assert stats[key]["files_after"] < stats[key]["files_before"], key

    # --- batch B streams in against the compacted state
    rb = _stream_ingest(400, 500, "b")
    rows = rb.collect()
    # micro-batch granularity: docs of the SECOND micro-batch see the
    # first micro-batch's docs already absorbed into the state, so the
    # truth corpus is per-micro-batch (base ∪ A ∪ earlier-B-arrivals)
    batch_docs = {
        bid: {r.doc_id for r in rows if r.batch_id == bid}
        for bid in {r.batch_id for r in rows}
    }
    assert len(batch_docs) == 2

    def _truth(batch_ids, corpus_ids_extra):
        from deep_field_spark.functions import texting
        from deep_field_spark.operators import dedup as D
        from pyspark.sql import Window

        sh = D.shingled(docs, "text", "doc_id", NGRAM)
        b = sh.filter(F.col("doc_id").isin([int(i) for i in batch_ids]))
        c = sh.filter(
            (F.col("doc_id") < 400)
            | F.col("doc_id").isin([int(i) for i in corpus_ids_extra])
        ).select(F.col("doc_id").alias("cid"), F.col("shingles").alias("shc"))
        pair = (
            b.crossJoin(c)
            .withColumn("jac", texting.jaccard(F.col("shingles"), F.col("shc")))
            .filter(F.col("jac") >= MINHASH_THRESHOLD)
        )
        w = Window.partitionBy("doc_id").orderBy(F.desc("jac"), F.asc("cid"))
        return {
            (r.doc_id, r.cid, round(r.jac, 6))
            for r in pair.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .collect()
        }

    first, second = sorted(batch_docs)
    got_b = {
        (r.doc_id, r.dup_of, r.jaccard) for r in rows if r.dup_of is not None
    }
    assert got_b == (
        _truth(batch_docs[first], set())
        | _truth(batch_docs[second], batch_docs[first])
    )
    # candidates span base ∪ A: state holds every absorbed doc, and the
    # truth set B was checked against includes the streamed-in A docs
    assert spark.table(f"{state_name}_shingles").count() == 500

    # --- replay idempotence across the compaction+stream history
    n_bands = spark.table(f"{state_name}_bands").count()
    assert lsh_state.ingest(
        spark, state_name,
        docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 500)),
        **KW,
    ).count() == 0
    assert spark.table(f"{state_name}_bands").count() == n_bands


def test_clone_is_byte_identical_and_independent(spark, sf_dir, state_name):
    """lsh_state.clone (behind the day-1 base-state session memo) must
    return exactly the source's rows under the new name and stay fully
    independent: an absorbing ingest on the clone never moves the
    source tables."""
    from deep_field_spark.catalog import table

    docs = table(spark, sf_dir, "documents")
    bkw = {k: v for k, v in KW.items() if k != "threshold"}
    lsh_state.build(docs.filter(F.col("doc_id") < 300), state_name, **bkw)
    dst = f"{state_name}_c"
    try:
        lsh_state.clone(spark, state_name, dst)
        for suffix in ("bands", "shingles"):
            s = spark.table(f"{state_name}_{suffix}")
            d = spark.table(f"{dst}_{suffix}")
            assert s.exceptAll(d).count() == 0
            assert d.exceptAll(s).count() == 0
        n_sh = spark.table(f"{state_name}_shingles").count()
        lsh_state.ingest(
            spark, dst,
            docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 350)),
            **KW,
        )
        assert spark.table(f"{dst}_shingles").count() == n_sh + 50
        assert spark.table(f"{state_name}_shingles").count() == n_sh
    finally:
        lsh_state.drop(spark, dst)
