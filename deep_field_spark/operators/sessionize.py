"""Batch sessionization: lag + running sum of gap-breaks.

One shuffle (partition by user), two window passes over the same
partitioning (Spark reuses the sort). The streaming twin is
``session_window`` in streaming/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..catalog import ts_micros


def sessionize(df: DataFrame, user_col: str, ts_col: str, gap_minutes: int,
               tiebreak_col: str) -> DataFrame:
    """Add a 1-based ``session_id`` per user: a new session starts when
    the gap since the previous event exceeds ``gap_minutes``."""
    # Pin session TZ to UTC so ts_micros on TIMESTAMP_NTZ inputs is
    # well-defined even when this operator is the first library call on
    # an externally built session (NTZ→LTZ casts are non-injective
    # across DST folds in local timezones).
    from ..catalog import ensure_nanos_conf

    ensure_nanos_conf(df.sparkSession)
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    prev_ts = F.lag(ts_col).over(w)
    # Microsecond-precision gap test (unix_timestamp truncates to whole
    # seconds and would disagree with epoch_us oracles on sub-second gaps).
    # ts_micros (not unix_micros) so TIMESTAMP_NTZ inputs — how parquet
    # TIMESTAMP(NANOS) reads under pyspark 4.1 — work on any session.
    gap_us = gap_minutes * 60 * 1_000_000
    new_session = F.when(
        prev_ts.isNull()
        | ((ts_micros(F.col(ts_col)) - ts_micros(prev_ts)) > gap_us),
        1,
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
