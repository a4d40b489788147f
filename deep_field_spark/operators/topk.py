"""Top-K: global and per-group.

Global top-k = orderBy + limit → Catalyst plans TakeOrderedAndProject
(per-partition heap, no full sort). Per-group top-k = row_number over a
window; the shuffle is on the group key only. Always pass a unique
tie-breaker column — row_number over ties is otherwise nondeterministic.

``top_k_per_group_sharded`` is the scale form: a single
Window.partitionBy(group) streams every group's FULL row set through one
task, so a hot group (one source's whole vocabulary, one customer's
whole history) serializes no matter how many executors exist. The
two-stage variant first takes top-k per (group, md5-shard) — bounded
parallelism within the group — then merges the ≤ k·shards survivors per
group. The union of per-shard top-ks contains the global top-k, so the
result is IDENTICAL to the one-window form (same oracle SQL replays it
with a plain rank) while no task ever sees more than one shard's rows
in stage 1 or k·shards rows in stage 2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# shards per group in the two-stage top-k: stage-2 merge input is
# ≤ k·SHARD_COUNT rows per group — wide enough to break hot groups,
# small enough that the merge window input stays trivially bounded
SHARD_COUNT = 16


def top_k_per_group(df: DataFrame, part_cols: list[str], order_cols: list[Column], k: int,
                    rank_col: str = "rn") -> DataFrame:
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def md5_shard(col: Column | str, shards: int = SHARD_COUNT) -> Column:
    """Content-independent 0..shards-1 bucket of a key column: the two
    leading hex digits of md5, mod shards. Replayable verbatim in DuckDB
    (strpos arithmetic over the same md5 hex) — the property every
    shard key in this repo must have so oracles can re-derive it."""
    h = F.md5(F.col(col).cast("string") if isinstance(col, str) else col.cast("string"))
    return (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % shards).cast("int")


def top_k_per_group_sharded(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[Column],
    k: int,
    shard_of: Column | str,
    rank_col: str = "rn",
    shards: int = SHARD_COUNT,
) -> DataFrame:
    """Exact per-group top-k that never streams a whole group through
    one task: pre-top-k per (group, _shard) then merge ≤ k·shards rows
    per group. ``shard_of`` must be a column (or expression) that is a
    pure function of the row — usually the within-group key — so the
    shard assignment is deterministic under any partitioning.

    Correctness: every global top-k row is, a fortiori, in the top-k of
    its own shard, so stage 1 never drops a global winner; stage 2 ranks
    the survivors with the SAME order and therefore returns exactly the
    one-window result (oracles replay it with a plain rank window)."""
    shard = md5_shard(shard_of, shards) if isinstance(shard_of, str) else shard_of
    pre = Window.partitionBy(*part_cols, "_shard").orderBy(*order_cols)
    survivors = (
        df.withColumn("_shard", shard)
        .withColumn("_prk", F.row_number().over(pre))
        .filter(F.col("_prk") <= k)
        .drop("_prk", "_shard")
    )
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
