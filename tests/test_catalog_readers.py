"""csv/json reader round-trip tests (SURVEY §2.1 parity: the reference
reads HTML and writes SQLite; the engine additionally exposes the
standard batch file formats)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from deep_field_spark.catalog import read_csv, read_json, table


def test_csv_round_trip(spark, sf_dir):
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "nation_csv")
        nation.write.option("header", "true").csv(path)
        back = read_csv(
            spark, path, schema="n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"
        )
        assert back.count() == nation.count()
        assert sorted(r.n_name for r in back.collect()) == sorted(
            r.n_name for r in nation.collect()
        )


def test_csv_infer_schema(spark, sf_dir):
    region = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "region_csv")
        region.write.option("header", "true").csv(path)
        back = read_csv(spark, path)
        assert dict(back.dtypes)["r_regionkey"] == "int"
        assert back.count() == region.count()


def test_json_round_trip(spark, sf_dir):
    region = table(spark, sf_dir, "region")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "region_json")
        region.write.json(path)
        back = read_json(spark, path, schema="r_regionkey BIGINT, r_name STRING")
        assert back.count() == region.count()
        assert set(back.columns) == set(region.columns)


def test_json_corrupt_record_quarantine(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "bad.json")
        with open(path, "w") as f:
            f.write('{"a": 1}\n{"a": bogus}\n{"a": 3}\n')
        back = read_json(spark, path, schema="a BIGINT, _corrupt_record STRING")
        rows = back.cache().collect()
        assert len(rows) == 3
        bad = [r for r in rows if r._corrupt_record is not None]
        assert len(bad) == 1  # malformed row quarantined, job survives


def test_parse_bytes_conf_values():
    """spread()'s split estimate must understand Spark byte-strings —
    misreading '128m' as 128 bytes silently disabled the repartition."""
    from deep_field_spark.catalog import _parse_bytes

    assert _parse_bytes("128m") == 128 * 1024 * 1024
    assert _parse_bytes("134217728b") == 134217728
    assert _parse_bytes("134217728") == 134217728
    assert _parse_bytes("2g") == 2 << 30
    assert _parse_bytes("64k") == 64 * 1024
    # unknown junk falls back to the 128 MiB default, never a tiny number
    assert _parse_bytes("oops") == 128 * 1024 * 1024
    # fractional magnitudes, accepted by Spark's byte-conf parser
    assert _parse_bytes("0.5g") == 512 * 1024 * 1024
    assert _parse_bytes("1.5m") == int(1.5 * 1024 * 1024)


def test_spread_repartitions_small_local_scan(spark, sf_dir):
    from deep_field_spark.catalog import spread, table

    d = spread(table(spark, sf_dir, "documents"))
    target = spark.sparkContext.defaultParallelism
    assert d.rdd.getNumPartitions() >= min(target, 2)
