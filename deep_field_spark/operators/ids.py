"""Scalable dense surrogate-id assignment.

The naive form — ``row_number() OVER (ORDER BY ...)`` with no
partition — pulls the entire table through ONE task (Spark warns
``WindowExec: No Partition Defined``); fine at fixture scale, the
single worst bottleneck at 100 TB. This module implements the standard
two-phase prefix-sum instead:

  1. bucket every row by a deterministic hash of ``bucket_cols``
     (``pmod(xxhash64(...), n_buckets)``);
  2. rank rows *within* each bucket — a properly partitioned window,
     n_buckets-way parallel;
  3. compute per-bucket exclusive offsets from the (≤ n_buckets)-row
     bucket-count aggregate — bounded data regardless of input scale —
     and broadcast them back;
  4. ``id = base + bucket_offset + within_bucket_rank``.

Ids are dense (1..N above ``base``) and deterministic: the total order
is (bucket, order_cols), which is stable across re-runs, cluster sizes
and partitionings because the bucket is a content hash, never a
partition index. That determinism is what makes idempotent resume work
(re-running an upsert assigns the same ids — reference parity with
deepfield's stable autoincrement keys, dbmodels via peewee).

The step-3 window is partitioned by a constant: a single partition,
but over AT MOST ``n_buckets`` rows by construction — the classic
two-level scan, not a hidden global sort of the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKET = "_ids_bucket"
_RANK = "_ids_rank"
_OFFSET = "_ids_offset"
_BASE = "_ids_base"


def dense_ids(
    df: DataFrame,
    order_cols: list[str],
    *,
    bucket_cols: list[str] | None = None,
    bucket_expr: Column | None = None,
    base: DataFrame | Column | None = None,
    n_buckets: int = 1024,
    id_col: str = "id",
) -> DataFrame:
    """Append ``id_col`` with dense deterministic ids ``base+1..base+N``.

    ``order_cols`` must be a row-unique key (ties would make ranks
    nondeterministic). ``bucket_cols`` (default ``order_cols``) choose
    the hash the buckets derive from — bucket by a prefix (e.g. the
    game key for plays) to keep related rows contiguous in id space.
    ``bucket_expr`` overrides the hash entirely with a caller-supplied
    integer Column: pass a bucket that is a monotone function of
    ``order_cols`` (e.g. the leading hex byte of the md5 key the rows
    are ordered by) and the id order becomes the GLOBAL ``order_cols``
    order — a total-order rank with no partition-less window — while
    staying replayable in engines without xxhash64 (DuckDB oracles).
    ``base`` is either a 1-row DataFrame with column ``_id_base`` (the
    in-plan form — no driver-side action) or a Column/literal; None
    means 0.
    """
    bucket_cols = bucket_cols or order_cols
    if bucket_expr is None:
        bucket_expr = F.pmod(
            F.xxhash64(*[F.col(c) for c in bucket_cols]), F.lit(n_buckets)
        )
    bucketed = df.withColumn(_BUCKET, bucket_expr)
    in_bucket = Window.partitionBy(_BUCKET).orderBy(*[F.col(c) for c in order_cols])
    ranked = bucketed.withColumn(_RANK, F.row_number().over(in_bucket).cast("long"))

    counts = bucketed.groupBy(_BUCKET).agg(F.count(F.lit(1)).alias("_ids_n"))
    # Exclusive prefix sum over the ≤ n_buckets count rows. One
    # partition is CORRECT here — the input is bounded by construction
    # regardless of data scale — but the partition key must be declared
    # or WindowExec warns "No Partition Defined ... serious performance
    # degradation" (and plan pins can't tell it from a global sort of
    # the fact table). A bare lit(0) gets constant-folded back to the
    # partition-less form, so derive the always-zero key from the
    # bucket column, which the optimizer cannot fold.
    pre = (
        Window.partitionBy(F.pmod(F.col(_BUCKET), F.lit(1)))
        .orderBy(_BUCKET)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        _BUCKET, F.coalesce(F.sum("_ids_n").over(pre), F.lit(0)).alias(_OFFSET)
    )

    out = ranked.join(F.broadcast(offsets), _BUCKET)
    if isinstance(base, DataFrame):
        out = out.crossJoin(F.broadcast(base.select(F.col("_id_base").alias(_BASE))))
        base_col = F.col(_BASE)
    elif base is not None:
        base_col = base if isinstance(base, Column) else F.lit(base)
    else:
        base_col = F.lit(0)
    return (
        out.withColumn(id_col, (base_col + F.col(_OFFSET) + F.col(_RANK)).cast("long"))
        .drop(_BUCKET, _RANK, _OFFSET, _BASE)
    )


def max_id_base(existing: DataFrame, id_col: str = "id") -> DataFrame:
    """1-row ``_id_base`` DataFrame = ``coalesce(max(id), 0)`` of an
    existing table — the in-plan replacement for a driver-side
    ``select(max(id)).first()`` per incremental build."""
    return existing.agg(F.coalesce(F.max(id_col), F.lit(0)).alias("_id_base"))
