"""Sinks: partitioned parquet, bucketed tables, idempotent streaming."""

from __future__ import annotations

import glob
import os

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
