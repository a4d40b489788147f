"""Batch and streaming output sinks.

The reference persists to SQLite (scraping/sqlite_sink.py covers that
parity row, S7-S9); this module is the cluster-scale output surface a
100 TB pipeline actually ships through:

  write_partitioned — date/source-partitioned parquet with bounded
      file sizes and within-partition clustering. Dynamic partition
      overwrite makes re-running one day/source idempotent without
      truncating the rest of the table.
  write_bucketed — bucketed + sorted table for shuffle-free joins:
      two tables bucketed on the same key join with zero exchange
      (the scale answer to "this join shuffles 100 TB every run").
  foreach_batch_idempotent — streaming foreachBatch sink with
      batchId-keyed commit paths: replayed micro-batches (restart,
      speculative retry) overwrite their own directory instead of
      double-appending — the standard exactly-once parquet recipe.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet write with file-size and clustering control.

    - ``partitionBy`` gives partition pruning to every downstream scan
      (filters on the partition cols never touch other directories).
    - ``sortWithinPartitions`` clusters rows inside each file so
      min/max row-group stats make selective predicates skippable
      (poor man's Z-order; one column is usually enough).
    - ``maxRecordsPerFile`` bounds file size so a skewed partition
      becomes many splittable files, not one 50 GB file.
    - dynamic partition overwrite: only the partitions present in
      ``df`` are replaced — re-running one day is idempotent and
      leaves the other days untouched.
    """
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    (
        out.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (+ sorted) managed table.

    Both sides of a recurring large-large join written with the same
    (cols, num_buckets) join with NO exchange: the bucket layout IS
    the shuffle, paid once at write time instead of per query
    (proof: tests/test_bucketed_join.py asserts the exchange-free
    plan). Sorting within buckets additionally enables sort-merge
    join without a sort step.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table, format="parquet")


def foreach_batch_idempotent(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> StreamingQuery:
    """Streaming parquet sink with exactly-once semantics.

    Each micro-batch lands in ``{path}/batch_id={id}`` with
    mode=overwrite: if the batch is replayed after a failure (offsets
    committed to the checkpoint but the write unacknowledged), the
    rerun overwrites its own directory — no duplicates, no lost
    batches. Readers see the union of batch directories; the
    batch_id=N partitioning also records provenance.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df) if transform is not None else batch_df
        out.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
