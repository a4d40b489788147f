"""Local simulation of the driver's correctness gate.

Runs every registered query on a BARE SparkSession (no get_spark confs —
exactly how the driver builds one) and, where an oracle exists, the
DuckDB twin; compares row counts and (sorted-columns, sorted-rows)
values with a small float tolerance. Prints per-query wall time so slow
queries — which can blow the driver's global time budget and truncate
the whole evaluation — are visible locally.

Usage: python tools/driver_sim.py [sf_dir] [only_prefix ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deep_field_spark.catalog import TABLES  # noqa: E402


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return int(v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def driver_canon_probe(cols, rows):
    """Reproduce the driver's pandas-based canonicalization, which is
    STRICTER than this sim's tuple-izing comparator: the driver sorts a
    pandas DataFrame with ``sort_values`` over every column, and pandas
    factorizes object columns through a hash table — so a list/array
    cell raises ``TypeError: unhashable type: 'list'`` (the round-3
    driver-red on embedding_quantize_int8 that this sim failed to
    predict). Raises the same TypeError the driver would.
    """
    import pandas as pd

    order = sorted(cols)
    pdf = pd.DataFrame(rows or None, columns=cols)
    # identical to the driver's _canon: sort_values over all columns
    pdf[order].sort_values(by=order)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = sys.argv[2:]

    import duckdb
    from pyspark.sql import SparkSession

    from deep_field_spark.queries import load_registry

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver_sim")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    reg = load_registry()
    names = [
        n for n in reg
        if not prefixes or any(n.startswith(p) for p in prefixes)
    ]
    n_pass = n_fail = n_rowsonly = 0
    total_t0 = time.time()
    for name in names:
        q = reg[name]
        t0 = time.time()
        try:
            df = q.fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            spark_s = time.time() - t0
        except Exception as e:
            print(f"FAIL  {name}: SPARK ERR {type(e).__name__}: {str(e)[:160]}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"rows  {name}: {len(rows)} rows (no oracle) [{spark_s:.1f}s]")
            n_rowsonly += 1
            continue
        t1 = time.time()
        try:
            cur = con.execute(q.oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            duck_s = time.time() - t1
        except Exception as e:
            print(f"FAIL  {name}: ORACLE ERR {type(e).__name__}: {str(e)[:160]}")
            n_fail += 1
            continue
        if sorted(cols) != sorted(ocols):
            print(f"FAIL  {name}: COLS spark={sorted(cols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        if len(rows) != len(orows):
            print(f"FAIL  {name}: ROWS spark={len(rows)} oracle={len(orows)} [{spark_s:.1f}s]")
            n_fail += 1
            continue
        try:
            driver_canon_probe(cols, rows)
            driver_canon_probe(ocols, orows)
        except TypeError as e:
            print(f"FAIL  {name}: DRIVER-CANON {type(e).__name__}: {str(e)[:120]}")
            n_fail += 1
            continue
        a = norm_rows(cols, rows)
        b = norm_rows(ocols, orows)
        if a != b:
            bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
            print(f"FAIL  {name}: VALUES differ at sorted row {bad}:")
            print(f"      spark : {a[bad]}")
            print(f"      oracle: {b[bad]}")
            n_fail += 1
            continue
        print(f"ok    {name}: {len(rows)} rows [spark {spark_s:.1f}s, duck {duck_s:.1f}s]")
        n_pass += 1
    print(
        f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} fail "
        f"of {len(names)} in {time.time() - total_t0:.0f}s"
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
