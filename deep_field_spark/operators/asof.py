"""As-of and range joins — operators vanilla Spark lacks natively.

As-of join uses the union+window formulation rather than a per-key
``pd.merge_asof``: one shuffle on the key, no Python in the loop, and
the window is a linear scan per partition — this is the shape that
survives 100 TB (skew on the key is the only hazard; AQE skew-join
handles it since the shuffle is a plain hash partition on the key).

Range join bucketizes the range key so Spark gets an equi-join on
(key, bucket) instead of a broadcast-nested-loop over the full cross
product; the residual range predicate filters within buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key.

    Returns left columns + ``{right_ts}{suffix}`` (+ value cols,
    suffixed). Unmatched left rows keep nulls.
    """
    value_cols = value_cols or []
    rstruct = F.struct(
        F.col(right_ts).alias("ts"), *[F.col(c).alias(c) for c in value_cols]
    )
    r = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias("__ts"),
        rstruct.alias("__rval"),
        F.lit(1).alias("__is_right"),
    )
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(r.schema["__rval"].dataType).alias("__rval"),
        F.lit(0).alias("__is_right"),
    ).select(on, "__ts", "__rval", "__is_right",
             F.struct(*[F.col(c) for c in lcols]).alias("__lrow"))
    r = r.select(on, "__ts", "__rval", "__is_right",
                 F.lit(None).cast(l.schema["__lrow"].dataType).alias("__lrow"))

    # Right rows sort before left rows at equal ts → inclusive (<=) match.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        l.unionByName(r)
        .withColumn("__m", F.last("__rval", ignorenulls=True).over(w))
        .filter(F.col("__is_right") == 0)
    )
    out = matched.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in lcols],
        F.col(f"__m.ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_val: Column,
    right_lo: Column,
    right_hi: Column,
    bucket_width: float,
    equi_keys: list[str] | None = None,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Join rows where ``right_lo <= left_val <= right_hi`` via bucket
    equi-join: explode each right interval into the buckets it spans,
    equi-join on (bucket + any equi keys), then apply the exact range
    predicate as a residual filter.

    This is the scale form of a time-range join: the plain non-equi
    condition alone hash-partitions on nothing, while the bucket key
    (plus real equi keys like user_id) gives the shuffle a partition
    key whose fan-out is bounded by span/bucket_width. Pick
    bucket_width near the median interval span.
    """
    keys = ["__bucket"] + (equi_keys or [])
    lb = left.withColumn("__bucket", F.floor(left_val / bucket_width))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(F.floor(right_lo / bucket_width), F.floor(right_hi / bucket_width))
        ),
    )
    cond = (left_val >= right_lo) & (left_val <= right_hi)
    if extra_cond is not None:
        cond = cond & extra_cond
    return lb.join(rb, on=keys).filter(cond).drop("__bucket")
