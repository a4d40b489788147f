"""Persisted MinHash-LSH state: the day-2 incremental-dedup artifact.

The one-shot queries (queries/dedup.py) rebuild banded signatures per
run; a production crawl does that exactly once, keeps the banded table
ON DISK, and joins each day's batch against it. This module is that
artifact:

- ``build``: banded signature table bucketed on (band, key) + a
  shingle table bucketed on the doc id, both written once via
  ``sinks.write_bucketed`` — the bucket layout IS the shuffle, paid at
  build time; every subsequent batch join against the state reads it
  exchange-free on the corpus side (the batch side, always the tiny
  side, shuffles to match).
- ``ingest``: a new batch is (1) anti-joined against the state's known
  ids — re-running an interrupted ingest is a no-op for already-
  absorbed docs, the scrape pipeline's frontier idempotence applied to
  corpus growth; (2) signed and band-joined against the state to get
  candidate pairs (id pairs only, text never shuffles); (3) verified
  with exact Jaccard against the state's shingle table; (4) appended
  to both state tables, so the next batch sees it.

At 100 TB the two state tables are the only corpus-sized artifacts and
neither moves at ingest time: the (band, key) bucketing co-locates the
candidate join, the id bucketing co-locates the verify join, and batch
work scales with the batch.

Reference parity note: the reference has no incremental near-dup state
(it is an exact-keyed scraper); this is part of the LLM-training-data
surface (MinHash/LSH family, SURVEY §2 additions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import sinks
from ..functions import texting
from . import dedup as D

STATE_BUCKETS = 8


def _tables(name: str) -> tuple[str, str]:
    return f"{name}_bands", f"{name}_shingles"


ROOT_CONF = "spark.deepfield.lshStateRoot"


def _location(spark: SparkSession, table: str) -> str:
    """External data location for a state table.

    Root resolution: the ``spark.deepfield.lshStateRoot`` conf if set
    (a production deployment points it at durable shared storage so
    ``attach`` finds yesterday's state from a fresh session), else a
    temp-dir path scoped by the Spark application id — two concurrent
    sessions on the same host (parallel benches over the same sf_dir)
    must NOT share a default root, or one session's ``build`` rmtree
    deletes the other's live state mid-query. Not the session's
    warehouse directory: that defaults to ./spark-warehouse of whatever
    CWD built the session, which an externally-driven session may not
    own. The catalog still carries the bucket metadata; only the bytes
    move."""
    import tempfile

    root = spark.conf.get(ROOT_CONF, None)
    if root is None:
        app_id = spark.sparkContext.applicationId
        root = f"{tempfile.gettempdir()}/dfs_lsh_state/{app_id}"
    return f"{root}/{table.lower()}"


def _banded_from_shingles(
    sh: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(id, band, key) derived from an (id, shingles-array) frame, so
    the raw text is never re-tokenized for the signature pass."""
    exploded = sh.select(id_col, F.explode("shingles").alias("shingle"))
    sig = D.minhash_signatures(exploded, id_col, num_hashes)
    return D.band_keyed(sig, id_col, bands, num_hashes // bands)


def build(
    docs: DataFrame,
    name: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int,
    num_hashes: int,
    bands: int,
    num_buckets: int | None = None,
) -> None:
    """Materialize the LSH state for an initial corpus (overwrite).

    Stale LOCATIONS are cleared first: the data directory outlives an
    in-memory catalog (a fresh session sees the old run's directory
    but no table entry, and saveAsTable refuses with
    LOCATION_ALREADY_EXISTS), so build is self-healing across
    sessions.
    """
    import shutil

    spark = docs.sparkSession
    if num_buckets is None:
        # layout sized by the data (functions/scaling.n_state_buckets;
        # see ivf_state.build) — _bucket_spec.json governs thereafter
        from ..functions import scaling

        num_buckets = scaling.n_state_buckets(docs.count())
    t_bands, t_shingles = _tables(name)
    for t in (t_bands, t_shingles):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(_location(spark, t), ignore_errors=True)
    # tokenize+shingle ONCE: the persisted frame feeds both state
    # writes (bands derive from it too), so the corpus text is read a
    # single time per build. Materialize it eagerly (count) BEFORE the
    # writes so the two can run concurrently off the cache — they are
    # independent jobs (distinct tables, shared read-only input), so a
    # small thread pool lets the shingle write's straggler tail
    # back-fill with the band signature tasks (guide §2.6 overlap).
    sh = D.shingled(docs, text_col, id_col, ngram).persist()
    sh.count()

    def _write_shingles() -> None:
        spark.sparkContext.setJobDescription(f"lsh build {name}: shingles")
        sinks.write_bucketed(
            sh, t_shingles, [id_col], num_buckets,
            path=_location(spark, t_shingles),
        )

    def _write_bands() -> None:
        spark.sparkContext.setJobDescription(f"lsh build {name}: bands")
        banded = _banded_from_shingles(sh, id_col, num_hashes, bands)
        sinks.write_bucketed(
            banded, t_bands, ["band", "key"], num_buckets,
            path=_location(spark, t_bands),
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [pool.submit(_write_shingles), pool.submit(_write_bands)]
        for f in futs:
            f.result()
    spark.sparkContext.setJobDescription(None)
    sh.unpersist()


def drop(spark: SparkSession, name: str) -> None:
    import shutil

    for t in _tables(name):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(_location(spark, t), ignore_errors=True)


def clone(spark: SparkSession, src: str, dst: str) -> None:
    """File-level copy of an existing state under a new name (replacing
    any prior ``dst``), registered via ``attach`` — the ivf_state.clone
    twin. A byte-copy returns exactly the rows an identical rebuild
    would (same parquet bytes, same ``_bucket_spec.json``) with zero
    recompute and zero shuffle; the clone is fully independent of its
    source, so ingest/compact on it never touch the source dirs."""
    import shutil

    drop(spark, dst)
    for k in ("bands", "shingles"):
        shutil.copytree(
            _location(spark, f"{src}_{k}"), _location(spark, f"{dst}_{k}")
        )
    attach(spark, dst)


def attach(
    spark: SparkSession,
    name: str,
    *,
    id_col: str = "doc_id",
    num_buckets: int | None = None,
) -> None:
    """Re-register on-disk state in a FRESH session's catalog.

    An in-memory catalog dies with its session while the state bytes
    don't — the real day-2 flow is build today, ingest tomorrow. This
    recreates the two bucketed-table entries (schema inferred from the
    parquet footers, bucket count read back from each table's own
    ``_bucket_spec.json`` — an explicit argument that contradicts it
    raises, see sinks.resolve_num_buckets) so ``ingest`` works against
    yesterday's state. On a cluster with a persistent metastore this
    is a no-op.
    """
    t_bands, t_shingles = _tables(name)
    specs = {
        t_bands: ["band", "key"],
        t_shingles: [id_col],
    }
    for t, cols in specs.items():
        if spark.catalog.tableExists(t):
            continue
        loc = _location(spark, t)
        sinks.recover_swapped_location(loc)
        nb = sinks.resolve_num_buckets(loc, num_buckets, STATE_BUCKETS)
        schema = spark.read.parquet(loc).schema
        cols_sql = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema)
        spark.sql(
            f"CREATE TABLE {t} ({cols_sql}) USING parquet "
            f"CLUSTERED BY ({', '.join(cols)}) INTO {nb} BUCKETS "
            f"LOCATION '{loc}'"
        )


def ingest(
    spark: SparkSession,
    name: str,
    batch: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int,
    num_hashes: int,
    bands: int,
    threshold: float,
    append: bool = True,
    num_buckets: int | None = None,
    on_report=None,
) -> DataFrame:
    """Dedup a batch against the persisted state; optionally absorb it.

    Returns one row per NEW batch doc: ``(id, dup_of, jaccard)`` with
    ``dup_of``/``jaccard`` NULL when the doc has no state match at or
    above ``threshold`` (ties resolve to the best Jaccard, then the
    lowest state id — the same contract as dedup_incremental_minhash).
    Docs already absorbed into the state are excluded entirely, which
    makes a replayed ingest exactly-once ACROSS batches: candidates
    are emitted the first time a doc is seen and never again. Within
    one batch the ids must be unique — the anti-join can't see
    duplicates arriving together (dedupe upstream, the merge_upsert
    check_unique contract).

    ``on_report`` (append path only): called with the materialized
    report BEFORE the state appends run. A caller that persists the
    report durably here cannot lose it to a crash between the state
    mutation and its own write — the absorb-then-report ordering is
    the window where dedup evidence silently vanishes (see
    foreach_batch_ingest).
    """
    t_bands, t_shingles = _tables(name)
    state_bands = spark.table(t_bands)
    state_sh = spark.table(t_shingles)

    known = state_sh.select(id_col)
    new = batch.join(known, id_col, "left_anti")

    # shingle the batch once, derive signatures from the materialized
    # frame — the batch text is tokenized exactly one time. On the
    # append path the lineage must be SEVERED (localCheckpoint), not
    # merely cached: the append later WRITES to the same shingle table
    # this lineage anti-joins, and a cache eviction mid-append would
    # recompute against the table being mutated. Read-only ingests
    # (append=False) just cache.
    new_sh = D.shingled(new, text_col, id_col, ngram)
    new_sh = new_sh.localCheckpoint(eager=True) if append else new_sh.persist()
    new_banded = _banded_from_shingles(new_sh, id_col, num_hashes, bands)

    cand = (
        new_banded.join(
            state_bands.select(
                F.col(id_col).alias("_state_id"), "band", "key"
            ),
            ["band", "key"],
        )
        .select(id_col, "_state_id")
        .distinct()
    )
    pair = (
        cand.join(new_sh, id_col)
        .join(
            state_sh.select(
                F.col(id_col).alias("_state_id"),
                F.col("shingles").alias("_state_shingles"),
            ),
            "_state_id",
        )
        .withColumn(
            "jaccard", texting.jaccard(F.col("shingles"), F.col("_state_shingles"))
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # best match per doc as ONE hash aggregation with map-side partial
    # combine (min of a struct ordered lexicographically: -jaccard
    # puts the highest Jaccard first, _state_id breaks ties upward —
    # the row_number window this replaces needed Exchange+Sort and
    # shipped every candidate row to one task per doc)
    best = (
        pair.groupBy(id_col)
        .agg(
            F.min(
                F.struct(
                    (-F.col("jaccard")).alias("nj"),
                    F.col("_state_id").alias("sid"),
                    F.col("jaccard").alias("j"),
                )
            ).alias("m")
        )
        .select(id_col, F.col("m.sid").alias("dup_of"), F.col("m.j").alias("jaccard"))
    )
    # the report's id spine is new_sh (row-preserving shingle of
    # `new`, already checkpointed) — re-using `new` here would replay
    # the known-ids anti-join against the full state shingle table
    report = new_sh.select(id_col).join(best, id_col, "left").select(
        id_col, "dup_of", F.round("jaccard", 6).alias("jaccard")
    )

    if append:
        # the report must be computed OFF the pre-append state; sever
        # lineage before mutating the tables it reads
        report = report.localCheckpoint(eager=True)
        if on_report is not None:
            on_report(report)
        # append order matters for crash-safety: bands FIRST, shingles
        # second. The known-ids anti-join reads the SHINGLE table, so a
        # crash between the two appends replays the whole batch (docs
        # not yet in shingles) and the band rows merely duplicate —
        # benign, the candidate join is .distinct() on id pairs. The
        # reverse order would leave docs known-but-bandless: absorbed,
        # never again findable as dup sources. Permanent recall loss.
        # bucket counts resolve from each table's own persisted spec
        # (same contract as attach/compact — a hardcoded default would
        # break, or silently corrupt, a non-default-bucket state)
        nb_bands = sinks.resolve_num_buckets(
            _location(spark, t_bands), num_buckets, STATE_BUCKETS
        )
        nb_sh = sinks.resolve_num_buckets(
            _location(spark, t_shingles), num_buckets, STATE_BUCKETS
        )
        # repartition onto the bucket columns so each append lands ONE
        # file per bucket instead of one per (task x bucket) — without
        # it every day-2 ingest adds up to 32xnb KB-sized files and
        # every subsequent read of the state pays the footer overhead
        # (the write_bucketed/compact_bucketed invariant: bucket id
        # and shuffle hash are the same Murmur3 mod nb)
        new_banded.repartition(nb_bands, "band", "key").write.mode(
            "append"
        ).format("parquet").bucketBy(nb_bands, "band", "key").saveAsTable(t_bands)
        new_sh.repartition(nb_sh, id_col).write.mode("append").format(
            "parquet"
        ).bucketBy(nb_sh, id_col).saveAsTable(t_shingles)
        new_sh.unpersist()
    # append=False leaves new_sh cached for the caller's consumption
    # of the report (the session's clearCache-between-queries
    # discipline reclaims it)
    return report


def foreach_batch_ingest(
    stream_df: DataFrame,
    name: str,
    report_path: str,
    checkpoint: str,
    **ingest_kwargs,
):
    """Streaming form of the day-2 ingestion: each micro-batch of
    newly-crawled docs is deduped against (and absorbed into) the
    persisted LSH state, and its dedup report lands in
    ``{report_path}/batch_id={id}``.

    Exactly-once, including for the REPORT: the report is written
    durably BEFORE the batch is absorbed into the state (``ingest``'s
    ``on_report`` hook), so a crash after the state appends cannot
    strand an unwritten report. The replay of such a crash sees every
    batch doc already absorbed → ``ingest`` returns an EMPTY report —
    which must NOT overwrite the completed report written pre-crash:
    the empty-replay guard keeps the existing ``_SUCCESS``-committed
    directory. (Absorb-then-write, the naive order, loses the dedup
    evidence for the whole batch on exactly that crash.)
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        dest = f"{report_path}/batch_id={batch_id}"

        def _write(report: DataFrame) -> None:
            if report.isEmpty():
                # every doc already absorbed — a replayed batch. Keep
                # the original report if one was committed; only a
                # batch that REALLY had nothing new writes empty.
                jvm = spark._jvm
                p = jvm.org.apache.hadoop.fs.Path(f"{dest}/_SUCCESS")
                fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
                if fs.exists(p):
                    return
            report.write.mode("overwrite").parquet(dest)

        report = ingest(spark, name, batch_df, on_report=_write, **ingest_kwargs)
        if ingest_kwargs.get("append", True) is False:
            # read-only form: no absorb step exists, write directly
            _write(report)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact(
    spark: SparkSession,
    name: str,
    *,
    id_col: str = "doc_id",
    num_buckets: int | None = None,
) -> dict[str, dict[str, int]]:
    """Rewrite both state tables to one file per bucket — the LSH twin
    of ivf_state.compact (every ingest appends per-bucket files to the
    shingle AND band tables). ``id_col`` must match the build(); the
    bucket count comes from each table's persisted spec (an explicit
    contradictory argument raises, see sinks.resolve_num_buckets)."""
    from .. import sinks

    t_bands, t_shingles = _tables(name)
    out: dict[str, dict[str, int]] = {}
    for key, t, cols in (
        ("shingles", t_shingles, [id_col]),
        ("bands", t_bands, ["band", "key"]),
    ):
        loc = _location(spark, t)
        nb = sinks.resolve_num_buckets(loc, num_buckets, STATE_BUCKETS)
        out[key] = sinks.compact_bucketed(spark, t, cols, nb, loc)
    return out
