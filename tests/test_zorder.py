"""write_zorder: the layout contract, measured on real file footers.

A single-column sort prunes only its leading key; Z-order must let a
box predicate skip files on EVERY clustered dimension. We write the
same rows both ways, then read the parquet footers and count how many
files' (min, max) ranges overlap a probe box — the exact computation
a scan's file-skipping does.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from deep_field_spark.sinks import write_zorder

COLS = ("l_partkey", "l_suppkey")


def _files_overlapping(path: str, box: dict[str, tuple[int, int]]) -> int:
    """Count part-files whose footer min/max intersects the box on
    every constrained column (file-skipping's admission test)."""
    n = 0
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        schema_names = md.schema.to_arrow_schema().names
        lo: dict[str, int] = {}
        hi: dict[str, int] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = schema_names[ci] if ci < len(schema_names) else col.path_in_schema
                st = col.statistics
                if st is None or name not in box:
                    continue
                lo[name] = min(lo.get(name, st.min), st.min)
                hi[name] = max(hi.get(name, st.max), st.max)
        if all(lo[c] <= b_hi and hi[c] >= b_lo for c, (b_lo, b_hi) in box.items()):
            n += 1
    return n


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(*COLS)
    root = tmp_path_factory.mktemp("zorder")
    zpath, spath = str(root / "z"), str(root / "s")
    write_zorder(li, zpath, list(COLS), bits=8, n_files=8)
    # the comparison layout: same file count, classic leading-column sort
    (
        li.repartitionByRange(8, COLS[0])
        .sortWithinPartitions(COLS[0])
        .write.mode("overwrite")
        .parquet(spath)
    )
    bounds = li.agg(
        *[F.min(c).alias(f"mn_{c}") for c in COLS],
        *[F.max(c).alias(f"mx_{c}") for c in COLS],
    ).first()
    return spark, li, zpath, spath, bounds


def _slab(bounds, col, frac_lo=0.2, frac_hi=0.3):
    # a slab that does NOT straddle the range midpoint: a 45-55% probe
    # crosses every layout's MSB split and nothing could prune it
    mn, mx = bounds[f"mn_{col}"], bounds[f"mx_{col}"]
    return (
        int(mn + (mx - mn) * frac_lo),
        int(mn + (mx - mn) * frac_hi),
    )


def test_zorder_round_trips_all_rows(layouts):
    spark, li, zpath, _, _ = layouts
    back = spark.read.parquet(zpath)
    assert back.count() == li.count()
    a = li.agg(*[F.sum(c).alias(c) for c in COLS]).first()
    b = back.agg(*[F.sum(c).alias(c) for c in COLS]).first()
    assert tuple(a) == tuple(b)


def test_zorder_prunes_on_non_leading_dimension(layouts):
    """A slab on the SECOND clustered column: the leading-column sort
    cannot skip anything (every file spans the full suppkey range);
    Z-order must skip some files."""
    _, _, zpath, spath, bounds = layouts
    box = {COLS[1]: _slab(bounds, COLS[1])}
    z, s = _files_overlapping(zpath, box), _files_overlapping(spath, box)
    assert s == 8  # the single-column layout is blind on this dim
    assert z < s, (z, s)


def test_zorder_worst_case_across_dims_beats_single_sort(layouts):
    """The Z-order guarantee is the WORST case over clustered dims: a
    leading-column sort is perfect on its key and blind (8/8) on the
    other; Z-order pays a little on each dim but its worst dim must
    beat the single sort's worst dim."""
    _, _, zpath, spath, bounds = layouts
    z_worst = max(
        _files_overlapping(zpath, {c: _slab(bounds, c)}) for c in COLS
    )
    s_worst = max(
        _files_overlapping(spath, {c: _slab(bounds, c)}) for c in COLS
    )
    assert s_worst == 8
    assert z_worst < s_worst, (z_worst, s_worst)


def test_zorder_2d_box_prunes(layouts):
    _, _, zpath, _, bounds = layouts
    box = {c: _slab(bounds, c) for c in COLS}
    assert _files_overlapping(zpath, box) < 8


def _morton_ref(vals: tuple[int, ...], bits: int) -> int:
    z = 0
    k = len(vals)
    for j in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> j) & 1) << (j * k + i)
    return z


def test_morton_column_matches_reference_and_is_bijective(spark):
    """The column-expression interleave must agree with an independent
    Python reference on the FULL 2-D 4-bit grid, and be a bijection
    (256 distinct z values for 256 distinct rank pairs)."""
    from pyspark.sql import functions as F

    from deep_field_spark.sinks import morton_column

    grid = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(grid, ["x", "y"])
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", morton_column([F.col("x"), F.col("y")], 4).alias("z")
        ).collect()
    }
    assert len(set(got.values())) == 256
    for (x, y), z in got.items():
        assert z == _morton_ref((x, y), 4), (x, y, z)


def test_morton_three_columns_round_trip(spark):
    from pyspark.sql import functions as F

    from deep_field_spark.sinks import morton_column

    grid = [(a, b, c) for a in range(8) for b in range(8) for c in range(8)]
    df = spark.createDataFrame(grid, ["a", "b", "c"])
    cols = [F.col("a"), F.col("b"), F.col("c")]
    zs = [r.z for r in df.select(morton_column(cols, 3).alias("z")).collect()]
    assert len(set(zs)) == len(grid)
    assert max(zs) < (1 << 9)


@pytest.fixture(scope="module")
def skew_layouts(spark, tmp_path_factory):
    """A Zipf-distributed column (v = N//(id+1): half the rows share
    v=1) beside a uniform scrambled column — the skew case where
    min-max ranks collapse and quantile ranks must restore pruning."""
    n = 20_000
    df = spark.range(n).select(
        (F.lit(n) / (F.col("id") + 1)).cast("long").alias("v"),
        ((F.col("id") * 2654435761) % n).alias("u"),
    )
    root = tmp_path_factory.mktemp("zorder_skew")
    mpath, qpath = str(root / "minmax"), str(root / "quantile")
    write_zorder(df, mpath, ["v", "u"], bits=8, n_files=8, rank_mode="minmax")
    write_zorder(df, qpath, ["v", "u"], bits=8, n_files=8, rank_mode="quantile")
    return spark, df, mpath, qpath


def test_zorder_quantile_round_trips_all_rows(skew_layouts):
    spark, df, mpath, qpath = skew_layouts
    for path in (mpath, qpath):
        back = spark.read.parquet(path)
        assert back.count() == df.count()
        a = df.agg(F.sum("v"), F.sum("u")).first()
        b = back.agg(F.sum("v"), F.sum("u")).first()
        assert tuple(a) == tuple(b)


def test_zorder_quantile_boundaries_prune_on_zipf_column(skew_layouts):
    """Footer-overlap on a selective probe inside the skewed column's
    crowded region (v in [5, 9]: ~9% of rows, but min-max maps it to
    rank 0 — the SAME rank as the v=1 mass holding half the table, so
    every file admits the probe). Quantile ranks spread the crowded
    region across the rank space; the probe must overlap strictly
    fewer files, and genuinely prune (< n_files)."""
    _, _, mpath, qpath = skew_layouts
    box = {"v": (5, 9)}
    m = _files_overlapping(mpath, box)
    q = _files_overlapping(qpath, box)
    assert q < m, (q, m)
    assert q < 8, q
