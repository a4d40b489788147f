"""Batch and streaming output sinks.

The reference persists to SQLite (scraping/sqlite_sink.py covers that
parity row, S7-S9); this module is the cluster-scale output surface a
100 TB pipeline actually ships through:

  write_partitioned — date/source-partitioned parquet with bounded
      file sizes and within-partition clustering. Dynamic partition
      overwrite makes re-running one day/source idempotent without
      truncating the rest of the table.
  write_zorder — Z-order (Morton) clustered layout: multi-dim
      min/max locality so box predicates prune files on every
      clustered column, not just the leading sort key.
  write_bucketed — bucketed + sorted table for shuffle-free joins:
      two tables bucketed on the same key join with zero exchange
      (the scale answer to "this join shuffles 100 TB every run").
  foreach_batch_idempotent — streaming foreachBatch sink with
      batchId-keyed commit paths: replayed micro-batches (restart,
      speculative retry) overwrite their own directory instead of
      double-appending — the standard exactly-once parquet recipe.
  compact_partitioned — small-file compaction with per-partition
      atomic swap (post-hoc repair for streaming append footprints).
  merge_upsert — copy-on-write MERGE INTO (upsert + delete) as one
      statically-pruned job with dynamic partition overwrite: only
      the partitions the updates touch are read or rewritten.
  foreach_batch_merge_upsert — streaming CDC apply: per micro-batch
      latest-version-per-key collapse, then merge_upsert; replays
      are exactly-once by merge idempotency.
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



def morton_column(ranks, bits: int):
    """Bit-interleave k integer rank columns into one Morton value:
    bit j of column i lands at position j*k + i (LSB-first). Pure
    column expressions — stays inside whole-stage codegen. Bijective
    for ranks in [0, 2^bits): tests/test_zorder.py checks the
    round-trip against an independent Python reference."""
    from pyspark.sql import functions as F

    k = len(ranks)
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, j).bitwiseAND(F.lit(1)).cast("long")
            z = z.bitwiseOR(F.shiftleft(bit, j * k + i))
    return z


def write_zorder(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 8,
    n_files: int = 8,
    mode: str = "overwrite",
    rank_mode: str = "minmax",
) -> None:
    """Z-order clustered parquet write: multi-dimensional locality so
    min/max row-group stats prune on EVERY clustered column, not just
    the leading sort key.

    A lexicographic sort on (a, b) gives perfect pruning on `a` and
    none on `b`; interleaving the bit representations of the columns'
    normalized ranks (Morton code) gives each of k columns ~bits/k
    effective prefix bits, so a box predicate on any subset of the
    clustered columns touches O(fraction^(1/k)) of the files instead
    of all of them. This is the same layout contract as
    OPTIMIZE ... ZORDER BY in lakehouse engines, built from plain
    DataFrame ops:

      1. each column is scaled to a ``bits``-bit integer rank.
         ``rank_mode="minmax"`` (default) is linear scaling — cheap,
         deterministic, one extra aggregate — and is the right choice
         for roughly-uniform columns. ``rank_mode="quantile"`` ranks by
         approx_percentile bucket boundaries instead (rank = number of
         quantile cutpoints <= value): on a skewed column linear
         scaling collapses most rows into a few low rank values, so
         every file's footer spans the crowded region and a selective
         probe there prunes nothing — quantile ranks equalize row
         counts per rank value, restoring pruning. Same interleave
         afterwards; one sketch aggregate instead of min/max.
      2. ranks are bit-interleaved into the Morton value z — pure
         column expressions, whole-stage-codegen friendly,
      3. repartitionByRange(z) + sortWithinPartitions(z) writes files
         that own compact z-ranges, i.e. compact hyper-rectangles.

    The write costs one range shuffle — identical to any global sort
    — and buys file- and row-group-level skipping for the lifetime of
    the data. tests/test_sinks.py measures the contract: a 2-D box
    predicate overlaps strictly fewer file footprints under Z-order
    than under single-column clustering.
    """
    from pyspark.sql import functions as F

    if rank_mode not in ("minmax", "quantile"):
        raise ValueError(f"unknown rank_mode {rank_mode!r}")
    scale = (1 << bits) - 1
    ranks = []
    if rank_mode == "quantile":
        # 2^bits - 1 interior quantile cutpoints per column; rank =
        # |{cutpoints <= value}| in [0, scale]. The sketch is mergeable
        # (one pass, partial-aggregable); the cutpoint arrays are one
        # row of bits-sized arrays — broadcast as literals-by-join
        qs = F.array(*[F.lit(i / (1 << bits)) for i in range(1, 1 << bits)])
        bounds = df.agg(
            *[
                F.percentile_approx(F.col(c).cast("double"), qs, F.lit(10000)).alias(
                    f"_qb_{c}"
                )
                for c in zorder_cols
            ]
        )
        out = df.crossJoin(F.broadcast(bounds))
        for c in zorder_cols:
            v = F.col(c).cast("double")
            ranks.append(
                F.size(F.filter(F.col(f"_qb_{c}"), lambda b: b <= v)).cast("int")
            )
        drop_cols = [f"_qb_{c}" for c in zorder_cols]
    else:
        aggs = []
        for c in zorder_cols:
            aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
        # bounds is one row — broadcast it as literals-by-join (keeps the
        # builder free of a driver collect; the cross join is 1-row)
        bounds = df.agg(*aggs)
        out = df.crossJoin(F.broadcast(bounds))
        for c in zorder_cols:
            mn, mx = F.col(f"_mn_{c}"), F.col(f"_mx_{c}")
            num = F.col(c).cast("double") - mn.cast("double")
            den = F.when(
                mx.cast("double") > mn.cast("double"),
                mx.cast("double") - mn.cast("double"),
            ).otherwise(F.lit(1.0))
            ranks.append(
                F.least(F.lit(scale), F.floor(num / den * scale).cast("int"))
            )
        drop_cols = [f"_mn_{c}" for c in zorder_cols] + [
            f"_mx_{c}" for c in zorder_cols
        ]
    z = morton_column(ranks, bits)
    out = (
        out.withColumn("_z", z)
        .drop(*drop_cols)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    out.write.mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed (+ sorted) table — managed, or external when ``path``
    is given (data at an explicit location instead of the session's
    CWD-dependent warehouse directory; the bucket metadata lives in
    the catalog either way).

    Both sides of a recurring large-large join written with the same
    (cols, num_buckets) join with NO exchange: the bucket layout IS
    the shuffle, paid once at write time instead of per query
    (proof: tests/test_bucketed_join.py asserts the exchange-free
    plan). Sorting within buckets additionally enables sort-merge
    join without a sort step.

    The frame is hash-repartitioned on the bucket columns into
    ``num_buckets`` tasks before the write: Spark's bucket id and its
    shuffle hash are the same Murmur3 function with the same modulus
    (the compact_bucketed invariant), so each task holds exactly one
    bucket's rows and emits ONE file per bucket — without it every
    write task emits a file per bucket it touches, and the table is
    born needing compaction (measured 32 tasks x 8 buckets = 256
    KB-sized files per build at sf0.1; every subsequent scan of the
    state pays the footer overhead).
    """
    df = df.repartition(num_buckets, *bucket_cols)
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table, format="parquet")
    if path is not None:
        # persist the bucket spec beside the data (underscore-prefixed,
        # so parquet readers ignore it): attach()/compact() validate
        # their num_buckets argument against it instead of trusting the
        # caller — a restated spec that lies about the files silently
        # corrupts exchange-free join results
        write_bucket_spec(path, bucket_cols, num_buckets)


def write_bucket_spec(
    location: str, bucket_cols: list[str], num_buckets: int
) -> None:
    import json
    import os

    with open(os.path.join(location, "_bucket_spec.json"), "w") as fh:
        json.dump(
            {"bucket_cols": list(bucket_cols), "num_buckets": num_buckets},
            fh,
        )


def read_bucket_spec(location: str) -> dict | None:
    """The bucket spec persisted by write_bucketed(path=...), or None
    for states written before the spec existed (or managed tables).
    A state left mid-swap by a crashed compaction is readable too
    (the side directories carry the same spec), so callers can
    resolve the bucket count BEFORE deciding to recover."""
    import json
    import os

    for root in (location, f"{location}__compact", f"{location}__old"):
        p = os.path.join(root, "_bucket_spec.json")
        if os.path.exists(p):
            with open(p) as fh:
                return json.load(fh)
    return None


def resolve_num_buckets(
    location: str, requested: int | None, default: int
) -> int:
    """Reconcile a caller-supplied bucket count with the on-disk spec.

    None → the spec's value (or ``default`` for pre-spec states); an
    explicit value that CONTRADICTS the spec raises instead of
    re-registering a layout that lies about the files (advisor r8:
    compact with non-default buckets then attach with the default
    silently corrupted exchange-free joins)."""
    spec = read_bucket_spec(location)
    on_disk = spec["num_buckets"] if spec else None
    if requested is None:
        return on_disk if on_disk is not None else default
    if on_disk is not None and on_disk != requested:
        raise ValueError(
            f"bucket-count mismatch at {location}: on-disk spec says "
            f"{on_disk} buckets, caller asked for {requested} — pass "
            "num_buckets=None to use the persisted spec"
        )
    return requested


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


def compact_partitioned(
    spark,
    path: str,
    partition_cols: list[str],
    target_bytes_per_file: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict[str, int]:
    """Small-file compaction for a partitioned parquet table.

    Streaming appends and per-batch writes accumulate thousands of
    KB-sized files per partition; at 100 TB the resulting footer/open
    overhead dominates scan time long before the bytes do. Compaction
    rewrites each partition into ``ceil(partition_bytes /
    target_bytes_per_file)`` files:

    - file counts come from the file index (no data read) — the
      per-partition size drives a per-row repartition key, so hot
      partitions get more output files instead of one giant one;
    - the rewrite goes through a temp directory then an atomic-ish
      directory swap per partition, so a concurrent reader sees either
      the old or the new file set, never a partial mix;
    - ``sortWithinPartitions`` re-clusters during the same pass (the
      natural moment to restore min/max skippability).

    Returns {"files_before": n, "files_after": m}. The production
    version runs per-partition-subset (compact yesterday only); this
    whole-table form is the building block.
    """
    import math
    import os
    import shutil

    from pyspark.sql import functions as F

    def _part_files(root: str) -> dict[str, list[str]]:
        out: dict[str, list[str]] = {}
        for dirpath, _dirs, files in os.walk(root):
            pq = [f for f in files if f.endswith(".parquet")]
            if pq:
                rel = os.path.relpath(dirpath, root)
                out[rel] = [os.path.join(dirpath, f) for f in pq]
        return out

    before = _part_files(path)
    files_before = sum(len(v) for v in before.values())
    tmp = path.rstrip("/") + "._compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)

    df = spark.read.parquet(path)
    sizes = {
        rel: sum(os.path.getsize(f) for f in fs) for rel, fs in before.items()
    }
    n_files = {
        rel: max(1, math.ceil(sz / target_bytes_per_file))
        for rel, sz in sizes.items()
    }
    # rewrite partition-by-partition: bounded memory, per-partition
    # atomic swap, and each partition picks its own output file count
    for rel, k in n_files.items():
        preds = [
            F.col(c) == v.split("=", 1)[1]
            for c, v in zip(partition_cols, rel.split(os.sep))
        ]
        cond = preds[0]
        for p in preds[1:]:
            cond = cond & p
        part = df.filter(cond).repartition(k)
        if sort_cols:
            part = part.sortWithinPartitions(*sort_cols)
        part.drop(*partition_cols).write.mode("overwrite").parquet(
            os.path.join(tmp, rel)
        )
        # swap: readers see old files or new files, never both
        live = os.path.join(path, rel)
        old = live + "._old"
        os.rename(live, old)
        os.rename(os.path.join(tmp, rel), live)
        shutil.rmtree(old)
    shutil.rmtree(tmp, ignore_errors=True)
    files_after = sum(len(v) for v in _part_files(path).values())
    return {"files_before": files_before, "files_after": files_after}


def _validate_partition_values(parts) -> None:
    """merge_upsert's path-safety contract, shared by the bootstrap and
    merge paths: partition-directory names are reconstructed as literal
    f"{col}={value}" and pruned with literal filters, which silently
    miss Spark's escaped names and __HIVE_DEFAULT_PARTITION__ (NULL) —
    fail loudly on any value that would need either."""
    for vals in parts:
        for v in vals:
            if v is None or not str(v).replace("-", "").replace("_", "").replace(
                ".", ""
            ).isalnum():
                raise ValueError(
                    f"partition value {v!r} is null or needs path escaping; "
                    "merge_upsert requires path-safe, non-null partition values"
                )


def merge_upsert(
    spark,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str],
    delete_col: str | None = None,
    check_unique: bool = True,
    partition_stable_keys: bool = True,
) -> dict[str, int]:
    """Copy-on-write MERGE (upsert + delete) into a partitioned
    parquet table — the ``MERGE INTO`` shape of Delta/Iceberg without
    a table format, as ONE Spark job:

    - the affected-partition list is a metadata-scale collect (one row
      per touched partition, never data rows) turned into a literal
      partition filter, so the target scan is statically pruned to the
      partitions the updates touch — a 100 TB table with a 1-partition
      update reads 1 partition;
    - surviving target rows = pruned target anti-joined against the
      update keys (matched rows are replaced, not patched — the
      copy-on-write contract);
    - survivors ∪ upserts write back with dynamic partition overwrite:
      Spark's commit protocol replaces exactly the partitions present
      in the output and leaves every other directory untouched (the
      surgical-overwrite property test_write_partitioned_dynamic_
      overwrite_is_surgical already pins);
    - rows flagged ``delete_col`` are dropped from the upsert side, so
      a matched+flagged key disappears; a partition whose rows are ALL
      deleted produces no output rows, which dynamic overwrite would
      skip — those directories are removed explicitly;
    - a nonexistent/empty target bootstraps: the non-deleted upserts
      are written as the initial table (the first micro-batch of a CDC
      stream needs no pre-created target).

    ``updates`` must be key-unique (MERGE's multiple-matches error);
    ``check_unique`` verifies with one tiny agg and raises.

    ``partition_stable_keys=True`` (default) is the pruning contract:
    a key's partition values never change, so matched rows can only
    live in the partitions the updates name — a key whose update
    carries a DIFFERENT partition value would leave its old row in
    place and duplicate. When keys can move partitions, pass False:
    a key-locate pre-pass (semi-join of the full target against the
    update keys) finds every partition holding a matched key and adds
    it to the rewrite set — one extra scan, the price of MERGE
    without an index, which is exactly why table formats keep
    key→file stats.

    Returns partition-level stats.
    """
    import os
    import shutil

    from pyspark.sql import functions as F

    if check_unique:
        dups = (
            updates.groupBy(*key_cols).count().filter(F.col("count") > 1).limit(1).count()
        )
        if dups:
            raise ValueError("updates are not unique on " + ",".join(key_cols))

    upserts = updates
    if delete_col is not None:
        # NULL flag means "not deleted": a bare ~col(delete_col) is
        # NULL for NULL flags and the filter would silently drop the
        # row from the upsert side while its key still anti-joins the
        # target — the row would vanish instead of upserting
        upserts = updates.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
        keys = updates.select(*key_cols).distinct()
    else:
        keys = upserts.select(*key_cols).distinct()

    import glob as _glob

    # bootstrap ONLY when the path truly has no parquet footprint (the
    # first micro-batch of a CDC stream). Deliberately a filesystem
    # check, not a try/except around the read: a corrupt or
    # half-written existing table must FAIL the merge loudly, never be
    # silently replaced by the upserts alone. (Local-FS scope, as
    # documented for this module.)
    has_data = os.path.isdir(path) and any(
        True for _ in _glob.iglob(os.path.join(path, "**", "*.parquet"),
                                  recursive=True)
    )
    if not has_data:
        out = upserts
        # the bootstrap must enforce the SAME partition-value safety
        # the merge path does: a NULL / needs-escaping value accepted
        # here succeeds today and bricks the table one day late (every
        # subsequent merge raises on the value the bootstrap let in)
        _validate_partition_values(
            {tuple(r) for r in out.select(*partition_cols).distinct().collect()}
        )
        (
            out.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
        n_parts = out.select(*partition_cols).distinct().count()
        return {
            "partitions_touched": n_parts,
            "partitions_deleted": 0,
            "bootstrapped": True,
        }
    target = spark.read.parquet(path)
    parts = {tuple(r) for r in updates.select(*partition_cols).distinct().collect()}
    if not partition_stable_keys:
        # key-locate pre-pass: matched keys may live in partitions the
        # updates don't name — add those to the rewrite set
        parts |= {
            tuple(r)
            for r in target.join(keys, key_cols, "left_semi")
            .select(*partition_cols)
            .distinct()
            .collect()
        }
    # the emptied-partition cleanup below reconstructs directory names
    # as literal f"{col}={value}"; Spark escapes special characters in
    # partition paths and writes NULLs as __HIVE_DEFAULT_PARTITION__,
    # where that reconstruction (and the literal pruning filter) would
    # silently miss — fail loudly instead of corrupting. Validated
    # AFTER the key-locate union so target-derived partition values
    # (a matched key living in a NULL/escaped partition) are rejected
    # too — a literal filter can never prune those correctly.
    _validate_partition_values(parts)
    parts = sorted(parts)
    cond = F.lit(False)
    for vals in parts:
        c = F.lit(True)
        for col, v in zip(partition_cols, vals):
            c = c & (F.col(col) == F.lit(v))
        cond = cond | c

    survivors = target.filter(cond).join(keys, key_cols, "left_anti")
    # localCheckpoint (eager), not persist(): the write below
    # OVERWRITES the same path this lineage reads. A persist() only
    # caches — an evicted partition or lost executor would recompute
    # from the partially-deleted input mid-write (silent corruption).
    # Checkpointing materializes and SEVERS the lineage, so loss of
    # the checkpointed blocks fails the job loudly instead.
    merged = survivors.unionByName(
        upserts.select(*target.columns)
    ).localCheckpoint(eager=True)
    # which touched partitions still have rows? must be derived from
    # the merge OUTPUT before writing — after the write a fully-
    # deleted partition's stale directory still reads back as live
    out_parts = {
        tuple(r) for r in merged.select(*partition_cols).distinct().collect()
    }
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    merged.unpersist()  # frees the checkpointed blocks (RDD-backed)

    # partitions fully emptied by deletes: dynamic overwrite wrote no
    # directory for them, so drop the stale one (metadata-scale)
    removed = 0
    for vals in parts:
        if vals not in out_parts:
            rel = os.path.join(
                *[f"{c}={v}" for c, v in zip(partition_cols, vals)]
            )
            full = os.path.join(path, rel)
            if os.path.isdir(full):
                shutil.rmtree(full)
                removed += 1
    return {
        "partitions_touched": len(parts),
        "partitions_deleted": removed,
    }


def foreach_batch_merge_upsert(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    key_cols: list[str],
    partition_cols: list[str],
    seq_col: str,
    delete_col: str | None = None,
) -> StreamingQuery:
    """Streaming CDC apply: each micro-batch MERGEs into the
    partitioned parquet table via ``merge_upsert`` — the
    foreachBatch + MERGE recipe every lakehouse streaming-upsert
    pipeline uses.

    A CDC micro-batch can carry several versions of one key, so the
    batch is first collapsed to the latest version per key by
    ``seq_col`` (a keyed window — per-task state is one key's
    in-batch versions). Exactly-once comes from merge idempotency,
    not from batch-keyed paths: a replayed micro-batch (offsets
    committed, write unacknowledged) re-applies the same upserts onto
    a table where they already hold, reaching the same state.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # merge_upsert runs several independent jobs over its updates
        # (partition collect, output-partition collect, the write); an
        # unpersisted window-over-shuffle is re-evaluated per job and
        # row_number over tied (key, seq) pairs can pick DIFFERENT
        # winners each time — the touched-partition list and the
        # written rows could then disagree. Persisting pins ONE
        # outcome for all consumers; equal-seq ties remain arbitrary
        # (as in any CDC apply) but are now internally consistent.
        w = Window.partitionBy(*key_cols).orderBy(F.desc(seq_col))
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", seq_col)
            .persist()
        )
        try:
            merge_upsert(
                batch_df.sparkSession,
                path,
                latest,
                key_cols=key_cols,
                partition_cols=partition_cols,
                delete_col=delete_col,
                check_unique=False,  # uniqueness holds by construction
            )
        finally:
            latest.unpersist()

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def recover_swapped_location(location: str) -> bool:
    """Restore a state directory left mid-swap by a crashed
    compact_bucketed run: if ``location`` is missing, rename back the
    surviving side directory (``__compact`` is preferred — it is always
    COMPLETE before the swap begins; ``__old`` is the pre-compaction
    copy). Returns True when a recovery happened. Called by
    compact_bucketed itself AND by the state attach() paths, so a
    crashed maintenance job heals on the next attach instead of
    erroring until someone thinks to re-run compact."""
    import os

    if os.path.exists(location):
        return False
    candidates = (f"{location}__compact", f"{location}__old")
    for candidate in candidates:
        if os.path.exists(candidate):
            os.rename(candidate, location)
            return True
    raise FileNotFoundError(
        f"state directory {location} does not exist and neither "
        f"crashed-swap side does ({candidates[0]}, {candidates[1]}): "
        "either this state was never built (build it first) or all "
        "copies of its data are gone"
    )


def compact_bucketed(
    spark,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    location: str,
    sort_cols: list[str] | None = None,
    transform=None,
) -> dict[str, int]:
    """Small-file compaction for a BUCKETED external table — the day-N
    hygiene step the persisted-state ingests create a need for: every
    ``ivf_state.ingest`` / ``lsh_state.ingest`` append writes up to
    ``num_buckets`` new files, so a year of hourly micro-batches is
    ~9k x buckets KB-sized files and the probe scan goes footer-bound
    long before it goes byte-bound.

    The rewrite repartitions on the bucket columns into ``num_buckets``
    tasks — Spark's bucket id and its shuffle hash are the same
    Murmur3-based function with the same modulus, so each task holds
    exactly one bucket's rows and ``bucketBy`` emits ONE file per
    bucket. Data lands in a staging directory first, then the swap is
    two renames (live -> ``__old``, staging -> live — the
    compact_partitioned pattern): a crash at ANY point leaves a full
    copy of the data recoverable by directory name (``__old`` before
    the second rename, live after), never an rmtree'd sole copy. On an
    object store the renames are copies — run it per-bucket-subset
    there. The table is re-registered with the SAME bucket spec, so
    the exchange-free join contract is preserved (pinned in
    tests/test_state_compaction.py). This is a single-writer
    maintenance step: run it in the ingest job's quiet window —
    queries started BEFORE the swap may lose their file handles when
    ``__old`` is removed at the end. A concurrent-writer GUARD narrows
    (but cannot close) the silent-loss window: the live directory's
    parquet listing is snapshotted before the staging read and
    re-checked immediately before the swap — an ingest that landed in
    between aborts the compaction (staging discarded, live directory
    untouched) with an error. A writer racing the milliseconds between
    that re-check and the renames can still lose rows into ``__old``,
    so the quiet-window discipline stands; the guard converts the
    common failure (a whole ingest running during the minutes-long
    staging rewrite) from silent loss into a loud abort.

    Returns {"files_before": n, "files_after": m}.
    """
    import os
    import shutil

    def _listing(root: str) -> frozenset[tuple[str, int, int]]:
        # (relpath, size, mtime_ns): mtime_ns makes a same-named,
        # same-size REWRITE between snapshot and re-check detectable
        # (advisor r9) — size alone would let it slip past the guard
        # and be dropped by the swap.
        def _stat(p: str) -> tuple[int, int]:
            st = os.stat(p)
            return st.st_size, st.st_mtime_ns

        return frozenset(
            (os.path.relpath(os.path.join(dirpath, f), root),
             *_stat(os.path.join(dirpath, f)))
            for dirpath, _d, files in os.walk(root)
            for f in files
            if f.endswith(".parquet")
        )

    staging = f"{location}__compact"
    old_dir = f"{location}__old"
    recovered = recover_swapped_location(location)
    snapshot = _listing(location)
    before = len(snapshot)
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(old_dir, ignore_errors=True)
    # read the raw FILES, not the catalog table: the bucketed table's
    # scan advertises HashPartitioning(bucket_cols, num_buckets), so
    # Catalyst would eliminate the repartition below as redundant —
    # while the runtime scan (auto-bucketed-scan disabled for a plain
    # read) actually produces file-split partitions, yielding one file
    # per (task, bucket) instead of one per bucket
    df = spark.read.parquet(location)
    if transform is not None:
        # schema-preserving row filter/rewrite riding the compaction
        # scan (e.g. ivf_state.compact(reclaim=True) dropping
        # tombstoned rows) — the caller owns the correctness argument
        # that the dropped rows were already invisible to readers
        df = transform(df)
    # write_bucketed repartitions onto the bucket columns itself (one
    # task per bucket -> one file per bucket) and its sortBy makes the
    # bucketed writer sort within each task, so no pre-shaping here
    tmp_table = f"{table}__compact_tmp"
    spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
    write_bucketed(
        df, tmp_table, bucket_cols, num_buckets,
        sort_cols=sort_cols, path=staging,
    )
    # swap: catalog entries first (metadata only), then two renames —
    # a full data copy exists on disk at every instant (crash between
    # the renames leaves it under __old; the recovery block above
    # restores either side directory on the next run)
    schema = spark.table(tmp_table).schema
    # concurrent-writer guard: abort (live dir untouched) if any file
    # appeared/changed since the staging read — those rows are NOT in
    # staging and the swap would silently drop them
    if _listing(location) != snapshot:
        spark.sql(f"DROP TABLE {tmp_table}")
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            f"compact_bucketed aborted: {location} was written to "
            "during compaction (a concurrent ingest?) — the staged "
            "rewrite no longer covers the live data. Nothing was "
            "changed; re-run in a quiet window."
        )
    spark.sql(f"DROP TABLE {tmp_table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    os.rename(location, old_dir)
    os.rename(staging, location)
    shutil.rmtree(old_dir, ignore_errors=True)
    cols_sql = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema
    )
    sort_sql = (
        f"SORTED BY ({', '.join(sort_cols)}) " if sort_cols else ""
    )
    spark.sql(
        f"CREATE TABLE {table} ({cols_sql}) USING parquet "
        f"CLUSTERED BY ({', '.join(bucket_cols)}) {sort_sql}"
        f"INTO {num_buckets} BUCKETS "
        f"LOCATION '{location}'"
    )
    spark.catalog.refreshTable(table)
    # "recovered" marks a run that first restored a crashed swap: its
    # files_before counts the already-compacted survivor, so progress
    # gates (files_after < files_before) must not read it as a no-op
    return {
        "files_before": before,
        "files_after": len(_listing(location)),
        "recovered": recovered,
    }
