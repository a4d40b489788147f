"""The Python DataSource form of the HTML cache source: same rows as
the built-in-scan composition (read_cache), partition-per-file
parallelism, page-type filtering."""

from __future__ import annotations

from deep_field_spark.scraping import cache as C
from deep_field_spark.sources.htmlcache_ds import HtmlCacheDataSource

RES = "/root/reference/tests/scraping/resources"


def _register(spark):
    try:
        spark.dataSource.register(HtmlCacheDataSource)
    except Exception as e:  # already registered in this session
        if "already" not in str(e).lower():
            raise


def test_datasource_matches_read_cache(spark):
    _register(spark)
    ds = spark.read.format("bbref_cache").option("path", RES).load()
    via_scan = C.read_cache(spark, RES)
    a = sorted((r.page_type, r.name_id, len(r.html)) for r in ds.collect())
    b = sorted((r.page_type, r.name_id, len(r.html)) for r in via_scan.collect())
    assert a == b and a


def test_datasource_partition_per_file_and_filter(spark):
    _register(spark)
    ds = spark.read.format("bbref_cache").option("path", RES).option(
        "pagetype", "GamePage"
    ).load()
    rows = ds.collect()
    assert rows and all(r.page_type == "GamePage" for r in rows)
    # one partition per cache file: executor-side parallelism scales
    # with the cache, not with the page-type count
    assert ds.rdd.getNumPartitions() == len(rows)


def test_datasource_empty_cache_ok(spark, tmp_path):
    _register(spark)
    ds = spark.read.format("bbref_cache").option("path", str(tmp_path)).load()
    assert ds.count() == 0
    assert [f.name for f in ds.schema.fields] == ["page_type", "name_id", "html"]


def test_datasource_write_roundtrip(spark, tmp_path):
    _register(spark)
    src = spark.read.format("bbref_cache").option("path", RES).option(
        "pagetype", "GamePage"
    ).load()
    out = str(tmp_path / "cache_out")
    src.write.format("bbref_cache").option("path", out).mode("append").save()
    back = spark.read.format("bbref_cache").option("path", out).load()
    a = sorted((r.page_type, r.name_id, len(r.html)) for r in src.collect())
    b = sorted((r.page_type, r.name_id, len(r.html)) for r in back.collect())
    assert a == b and a
    # no temp litter after commit: staging dirs are ._ds_tmp_<uuid>,
    # so glob the pattern rather than a literal name
    import glob
    import os
    leaked = glob.glob(os.path.join(out, "**", "._ds_tmp*"), recursive=True)
    assert leaked == [], leaked


def test_datasource_streaming_incremental_batches(spark, tmp_path):
    """Streaming form: files arriving between micro-batch triggers are
    picked up exactly once — offsets are sorted-prefix counts per page
    type, so each availableNow pass consumes precisely the new files."""
    import os
    import shutil

    _register(spark)
    root = str(tmp_path / "cache_stream")
    gp = os.path.join(root, "GamePage")
    os.makedirs(gp)
    src_files = sorted(
        f for f in os.listdir(os.path.join(RES, "GamePage")) if f.endswith(".shtml")
    )
    assert len(src_files) >= 3
    shutil.copy(os.path.join(RES, "GamePage", src_files[0]), gp)

    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def drain():
        q = (
            spark.readStream.format("bbref_cache").option("path", root).load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got1 = {r.name_id for r in spark.read.parquet(out).collect()}
    assert got1 == {src_files[0][: -len(".shtml")]}

    # two more pages "arrive"; the next drain reads ONLY them
    shutil.copy(os.path.join(RES, "GamePage", src_files[1]), gp)
    shutil.copy(os.path.join(RES, "GamePage", src_files[2]), gp)
    drain()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3  # no re-reads, no misses
    assert {r.name_id for r in rows} == {
        f[: -len(".shtml")] for f in src_files[:3]
    }


def test_datasource_stream_writer_cache_to_cache(spark, tmp_path):
    """All four quadrants at once: stream FROM one cache tree INTO
    another through the custom format — pages land once, identical
    bytes, no temp litter."""
    import os

    _register(spark)
    out = str(tmp_path / "cache_copy")
    ck = str(tmp_path / "ckw")
    q = (
        spark.readStream.format("bbref_cache").option("path", RES).load()
        .writeStream.format("bbref_cache")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    src = spark.read.format("bbref_cache").option("path", RES).load()
    dst = spark.read.format("bbref_cache").option("path", out).load()
    a = sorted((r.page_type, r.name_id, len(r.html)) for r in src.collect())
    b = sorted((r.page_type, r.name_id, len(r.html)) for r in dst.collect())
    assert a == b and a
    assert not os.path.isdir(os.path.join(out, "._ds_tmp"))


def test_datasource_write_overwrite_replaces_cache(spark, tmp_path):
    """mode('overwrite') must REPLACE the cache: pages absent from the
    written frame do not survive."""
    import os

    _register(spark)
    out = str(tmp_path / "cache_ovw")
    full = spark.read.format("bbref_cache").option("path", RES).option(
        "pagetype", "GamePage"
    ).load()
    full.write.format("bbref_cache").option("path", out).mode("append").save()
    n_full = spark.read.format("bbref_cache").option("path", out).load().count()
    one = full.orderBy("name_id").limit(1)
    one.write.format("bbref_cache").option("path", out).mode("overwrite").save()
    back = spark.read.format("bbref_cache").option("path", out).load().collect()
    assert n_full > 1 and len(back) == 1
    assert back[0].name_id == one.first().name_id


def test_datasource_stream_honors_pagetype(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "st_out")
    ck = str(tmp_path / "st_ck")
    q = (
        spark.readStream.format("bbref_cache").option("path", RES)
        .option("pagetype", "SchedulePage").load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck).trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert rows and all(r.page_type == "SchedulePage" for r in rows)
