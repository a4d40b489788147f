"""Local replica of the driver's DuckDB differential check:
row-count + column names + order-insensitive value comparison.

Values are normalized (floats rounded, timestamps to UTC-naive) and
rows sorted, then compared exactly — stricter than a hash so failures
show the first differing row.
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split()
    import os

    for t in tables:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (the sf1 replica): a directory of
            # part files — DuckDB needs the glob form
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except ImportError:
        pass
    return v


def _key(row):
    return tuple((x is None, str(x)) for x in row)


def driver_canon_check(cols, rows) -> None:
    """Reproduce the driver's pandas canonicalization, which is stricter
    than this module's tuple-izing comparator: the driver sorts a pandas
    DataFrame via ``sort_values`` over every column, and pandas hashes
    object cells — so a list/array output column raises ``TypeError:
    unhashable type: 'list'`` (the round-3 driver-red the local harness
    failed to predict). Called on the RAW spark rows before _norm
    tuple-izes lists away.
    """
    import pandas as pd

    order = sorted(cols)
    pd.DataFrame(list(rows) or None, columns=list(cols))[order].sort_values(by=order)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    sdf = spark_df
    scols = list(sdf.columns)
    raw = sdf.collect()
    driver_canon_check(scols, [tuple(r) for r in raw])
    srows = [tuple(_norm(v) for v in r) for r in raw]

    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = [tuple(_norm(v) for v in r) for r in res.fetchall()]

    assert sorted(scols) == sorted(dcols), f"columns differ: spark={scols} duckdb={dcols}"
    assert len(srows) == len(drows), f"row counts differ: spark={len(srows)} duckdb={len(drows)}"

    sorder = [scols.index(c) for c in sorted(scols)]
    dorder = [dcols.index(c) for c in sorted(dcols)]
    s_sorted = sorted([tuple(r[i] for i in sorder) for r in srows], key=_key)
    d_sorted = sorted([tuple(r[i] for i in dorder) for r in drows], key=_key)
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        assert a == b, f"row {i} differs (cols {sorted(scols)}):\n  spark={a}\n  duck ={b}"
