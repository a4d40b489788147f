"""Top-K: global and per-group.

Global top-k = orderBy + limit → Catalyst plans TakeOrderedAndProject
(per-partition heap, no full sort). Per-group top-k = row_number over a
window; the shuffle is on the group key only. Always pass a unique
tie-breaker column — row_number over ties is otherwise nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(df: DataFrame, part_cols: list[str], order_cols: list[Column], k: int,
                    rank_col: str = "rn") -> DataFrame:
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
