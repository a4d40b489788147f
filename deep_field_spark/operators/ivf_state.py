"""Persisted IVF index state: the ANN sibling of the LSH artifact
(operators/lsh_state.py).

The one-shot queries (queries/similarity.py) retrain centroids and
re-assign the corpus per run; a production vector store trains the
coarse quantizer once, keeps the cell-assigned vector table ON DISK
bucketed by cell id, and serves every search + absorbs every ingest
against that layout:

- ``build``: vectors are assigned to their nearest centroid (argmax
  cosine against the BROADCAST k-row centroid table — the corpus never
  shuffles for assignment) and written bucketed on ``cid``; the
  centroid table is persisted beside it. The bucket layout IS the
  probe shuffle, paid once at build time.
- ``ingest``: new vectors are anti-joined against the state's known
  ids (replay-idempotent, same contract as lsh_state.ingest), assigned
  to the FROZEN centroids — the standard production posture: the index
  structure is stable day-to-day, data grows; retraining is a rebuild
  — and appended to the cell table.
- ``search``: each query picks its ``nprobe`` nearest cells from the
  broadcast centroids, then probes the cell table with a ``cid``
  equi-join the bucket layout serves exchange-free on the corpus side;
  exact cosine + per-query top-k runs on the probed subset only.
- ``compact``: day-N hygiene — ingests append per-bucket files, so the
  cell table is periodically rewritten to one file per bucket
  (sinks.compact_bucketed), same bucket spec, answers unchanged.

At 100 TB the cell table is the only corpus-sized artifact and it
never moves: searches shuffle |queries|*nprobe probe rows, ingests
shuffle the batch. Recall is governed by nprobe exactly as in
FAISS-style IVF; the recall contract is hash-checked by the
ann_recall_report pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import sinks
from ..functions import vectors as V
from .lsh_state import _location

STATE_BUCKETS = 8


def _tables(name: str) -> tuple[str, str]:
    return f"{name}_cells", f"{name}_centroids"


def assign(
    vecs: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, id, vec, [payload...]): nearest-centroid argmax over the
    broadcast k-row centroid table — ties to the lowest cid, matching
    the trainer's assignment step so the oracle replays it. Any extra
    columns on ``vecs`` (e.g. PQ codes) ride along untouched — the
    cell table is the natural home for per-vector serving payload."""
    payload = [c for c in vecs.columns if c not in (id_col, vec_col)]
    # per-row HOF argmax over the collected centroid array: zero
    # Exchange (the window form shuffled n·k scored rows carrying the
    # vector payload k times; guide §2.4). Tie discipline identical
    # (cos DESC, lowest cid — see functions/vectors.py).
    return vecs.crossJoin(
        F.broadcast(V.centroid_struct_array(centroids.select("cid", "c_emb")))
    ).select(
        V.argmax_cos_cid(F.col(vec_col), F.col("_cents")).alias("cid"),
        id_col,
        vec_col,
        *payload,
    )


def super_probe(
    vecs: DataFrame,
    supers: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    probes: int = 1,
    with_rank: bool = False,
) -> DataFrame:
    """(id, scid[, probe_rn]): each vector's ``probes`` nearest
    SUPER-centroids (cosine DESC, ties to the lowest scid) — the
    level-1 probe set of the two-level coarse quantizer, exposed so
    cost-accounting charts (ann_hier_assign's scored_hier column)
    attribute exactly the probe set ``assign_hier`` scores children
    for. ``with_rank=True`` keeps the 1-based probe rank so one pass
    at probes=max(p) serves every smaller rung via a rank filter
    (the chart computes the ranking once, not once per rung). Same
    ranking discipline as assign_hier's internal level-1 pass; the
    oracle pins both against one SQL chain."""
    # per-row HOF top-p over the collected super array: zero Exchange
    # (the window form shuffled n·g scored rows; guide §2.4). Ranking
    # discipline identical (cos DESC, lowest scid — see vectors.py).
    return (
        vecs.select(id_col, vec_col)
        .crossJoin(F.broadcast(V.centroid_struct_array(supers)))
        .select(
            id_col,
            F.posexplode(
                V.top_cos_structs(F.col(vec_col), F.col("_cents"), probes)
            ).alias("_p", "_t"),
        )
        .select(
            id_col,
            (-F.col("_t.nc")).alias("scid"),
            *(
                [(F.col("_p") + 1).cast("int").alias("probe_rn")]
                if with_rank
                else []
            ),
        )
    )


def super_children(centroids: DataFrame, supers: DataFrame) -> DataFrame:
    """(cid, scid): each centroid mapped to its nearest SUPER-centroid
    (cosine, ties to the lowest scid) — the child map of the two-level
    coarse quantizer. ``supers`` is a (cid, c_emb) table as produced by
    the same Lloyd trainer run over the centroid table
    (queries/similarity._train_lloyd_super)."""
    return (
        centroids.select("cid", "c_emb")
        .crossJoin(F.broadcast(V.centroid_struct_array(supers)))
        .select(
            "cid",
            V.argmax_cos_cid(F.col("c_emb"), F.col("_cents")).alias("scid"),
        )
    )


def assign_hier(
    vecs: DataFrame,
    centroids: DataFrame,
    supers: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    super_probes: int = 1,
) -> DataFrame:
    """Two-level coarse assignment — the O(n·p·√k) alternative to
    ``assign``'s flat O(n·k) scan (functions/scaling.n_super): each
    vector ranks the broadcast g-row SUPER table, keeps its top
    ``super_probes`` supers (FAISS's standard multi-probe counter for
    two-level assign), then argmaxes exactly over only those supers'
    child centroids. Same tie discipline as ``assign`` (cos DESC,
    lowest id), so where the two agree they agree bit-for-bit; the
    ``ann_hier_assign`` chart quantifies the disagreement per probe
    rung (boundary vectors landing in a neighboring cell — the
    ambiguity IVF serving absorbs via nprobe) per corpus BEFORE a
    build flips to this path. ``super_probes >= g`` probes every super
    and therefore reproduces the flat assignment exactly (every
    centroid is some super's child — pinned by
    tests/test_ivf_state.py). Cost-accounting consumers wanting the
    probed-super set use ``super_probe`` — at p>1 a single winning
    scid column would under-state the probe set."""
    payload = [c for c in vecs.columns if c not in (id_col, vec_col)]
    # Both levels are per-row HOF passes over broadcast one-row
    # artifacts (guide §2.4): level 1 ranks the g-row super array and
    # keeps the top ``super_probes`` scids; level 2 argmaxes over the
    # UNION of those supers' child-centroid arrays, looked up in a
    # scid → children map (children sets are disjoint — each centroid
    # maps to exactly ONE super). Zero Exchange; the window form
    # shuffled n·(g + p·√k) scored rows twice. A childless probed
    # super contributes no candidates (element_at → NULL, filtered) —
    # the same drop the old inner join on the child map produced,
    # which build()'s post-write count guard turns into a loud error.
    cm = super_children(centroids, supers)
    cmap = (
        cm.join(centroids.select("cid", "c_emb"), "cid")
        .groupBy("scid")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("cid"), F.col("c_emb")))
            ).alias("_ch")
        )
        .agg(
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.struct(F.col("scid"), F.col("_ch")))
                )
            ).alias("_cmap")
        )
    )
    probed = F.transform(
        V.top_cos_structs(F.col(vec_col), F.col("_cents"), super_probes),
        lambda t: -t["nc"],
    )
    kids = F.flatten(
        F.filter(
            F.transform(probed, lambda s: F.element_at(F.col("_cmap"), s)),
            lambda a: a.isNotNull(),
        )
    )
    return (
        vecs.crossJoin(F.broadcast(V.centroid_struct_array(supers)))
        .crossJoin(F.broadcast(cmap))
        .select(
            id_col,
            vec_col,
            *payload,
            kids.alias("_kids"),
        )
        .filter(F.size("_kids") > 0)
        .select(
            V.argmax_cos_cid(F.col(vec_col), F.col("_kids")).alias("cid"),
            id_col,
            vec_col,
            *payload,
        )
    )


def build(
    vecs: DataFrame,
    centroids: DataFrame,
    name: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int | None = None,
    store_vec: bool = True,
    aux_tables: dict[str, DataFrame] | None = None,
    supers: DataFrame | None = None,
    super_probes: int = 1,
    n_rows: int | None = None,
) -> None:
    """Materialize the IVF state (overwrite): the cell-assigned vector
    table bucketed on cid + the centroid table. Training the centroids
    is the CALLER's job (e.g. queries/similarity._lloyd_centroids) —
    this module is layout plumbing, not ML.

    ``store_vec=False`` drops the raw vector from the persisted cell
    table — the IVFPQ posture, where the cell rows carry only integer
    codes and the serving index never stores the corpus vectors (the
    ~50x compression that makes a 100 TB vector store fit on disk).
    ``aux_tables`` persists extra small artifacts (e.g. PQ codebooks)
    beside the state as ``{name}_{key}``; re-register them tomorrow
    with ``attach(..., aux=keys)``. ``supers`` (a (cid, c_emb) table of
    SUPER-centroids) switches the assignment pass to the two-level
    O(n·√k) ``assign_hier`` path — the knob a 10⁹-row build flips
    after reading the ann_hier_assign/ann_hier_recall charts for its
    corpus; the persisted layout is identical either way.
    ``super_probes`` (hier builds only) sets the level-1 multi-probe
    width and is persisted as ``_hier_spec.json`` beside the super
    table, so day-2 ``ingest`` replays the SAME frozen quantizer the
    build used — an ingest probing a different width would silently
    mix two cell geometries in one state. ``n_rows`` is a
    caller-known count of ``vecs`` (e.g. an already-memoized corpus
    count) that skips the internal count jobs sizing the bucket
    layout and feeding the childless-super guard — pass only a value
    counted from the same frame, or the guard lies."""
    import shutil

    spark = vecs.sparkSession
    n_vecs: int | None = n_rows
    if num_buckets is None:
        # layout sized by the data (functions/scaling.n_state_buckets:
        # ~2^20 rows per bucket, floored at 8 — every test SF resolves
        # to the floor); the persisted _bucket_spec.json remains the
        # source of truth for attach/ingest/compact afterwards
        from ..functions import scaling

        if n_vecs is None:
            n_vecs = vecs.count()
        num_buckets = scaling.n_state_buckets(n_vecs)
    t_cells, t_cent = _tables(name)
    aux_all = dict(aux_tables or {})
    if supers is not None:
        # persist the super table beside the state ("supers" is a
        # reserved aux key): a hier-built state INGESTS hier too —
        # day-2 batches assign O(√k) against the same frozen two-level
        # quantizer the build used. attach(aux=("supers",)) brings it
        # back cross-session.
        aux_all["supers"] = supers.select("cid", "c_emb")
    aux = {f"{name}_{k}": df for k, df in aux_all.items()}
    for t in (t_cells, t_cent, *aux):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(_location(spark, t), ignore_errors=True)
    assigned = (
        assign(vecs, centroids, id_col, vec_col)
        if supers is None
        else assign_hier(
            vecs, centroids, supers, id_col, vec_col,
            super_probes=super_probes,
        )
    )
    if not store_vec:
        assigned = assigned.drop(vec_col)
    sinks.write_bucketed(
        assigned, t_cells, ["cid"], num_buckets, path=_location(spark, t_cells)
    )
    if supers is not None:
        # a vector whose EVERY probed super is CHILDLESS (a super no
        # centroid mapped to) has no level-2 candidates and would
        # silently vanish from the state — fail loudly. Verified off
        # the WRITTEN table (a parquet-footer count, metadata-speed):
        # a pre-write assigned.count() would compute the whole
        # O(n·p·√k) assignment twice, once for the guard and once for
        # the write. Flat assign is total by construction and skips
        # this. On failure the partial state is torn down first.
        n_in = vecs.count() if n_vecs is None else n_vecs
        n_out = spark.read.parquet(_location(spark, t_cells)).count()
        if n_out != n_in:
            drop(spark, name, aux=tuple(aux_all))
            raise ValueError(
                f"hier assignment dropped {n_in - n_out} of {n_in} "
                "vectors — the super table has childless cells; "
                "retrain supers (or build flat)"
            )
    (
        centroids.select("cid", "c_emb")
        .write.mode("overwrite")
        .option("path", _location(spark, t_cent))
        .saveAsTable(t_cent)
    )
    for t, df in aux.items():
        df.write.mode("overwrite").option("path", _location(spark, t)).saveAsTable(t)
    if supers is not None:
        _write_hier_spec(_location(spark, f"{name}_supers"), super_probes)


def _write_hier_spec(location: str, super_probes: int) -> None:
    import json
    import os

    with open(os.path.join(location, "_hier_spec.json"), "w") as fh:
        json.dump({"super_probes": int(super_probes)}, fh)


def read_hier_spec(location: str) -> dict | None:
    """The hier-quantizer spec persisted beside a supers-built state's
    super table (the _bucket_spec.json discipline applied to the
    level-1 probe width), or None for a state built before the knob
    existed — those states were built at the then-only width 1, which
    is exactly the default the reader falls back to."""
    import json
    import os

    p = os.path.join(location, "_hier_spec.json")
    if os.path.exists(p):
        with open(p) as fh:
            return json.load(fh)
    return None


def drop(spark: SparkSession, name: str, *, aux: tuple[str, ...] = ()) -> None:
    import shutil

    for t in (*_tables(name), *(f"{name}_{k}" for k in aux)):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(_location(spark, t), ignore_errors=True)


def clone(
    spark: SparkSession, src: str, dst: str, *, aux: tuple[str, ...] = ()
) -> None:
    """File-level copy of an existing state under a new name (replacing
    any prior ``dst``), registered via ``attach``. The day-1 fan-out
    path for charts that maintain/mutate their own copy of one shared
    hermetic build: a byte-copy returns exactly the rows an identical
    rebuild would (same parquet bytes, same ``_bucket_spec.json``) with
    zero recompute and zero shuffle, and the clone is fully independent
    of its source — mutating it never touches the source dirs."""
    import shutil

    drop(spark, dst, aux=aux)
    for k in ("cells", "centroids", *aux):
        shutil.copytree(
            _location(spark, f"{src}_{k}"), _location(spark, f"{dst}_{k}")
        )
    attach(spark, dst, aux=aux)


def attach(
    spark: SparkSession,
    name: str,
    *,
    num_buckets: int | None = None,
    aux: tuple[str, ...] = (),
) -> None:
    """Re-register the on-disk state in a fresh session's catalog
    (bucket spec read back from the ``_bucket_spec.json`` the build
    wrote beside the data — restating a WRONG count would register a
    layout that lies about the files and silently corrupt the
    exchange-free joins; an explicit ``num_buckets`` that contradicts
    the spec raises). Same day-2 contract as lsh_state.attach; a
    persistent metastore makes this a no-op. ``aux`` names the extra
    artifacts persisted by build(aux_tables=…) to re-register
    alongside (e.g. ("pq",) for the PQ codebooks)."""
    t_cells, t_cent = _tables(name)
    # heal a compact() crash first: the cell dir may sit under a swap
    # side name (sinks.recover_swapped_location is a no-op otherwise)
    if not spark.catalog.tableExists(t_cells):
        loc = _location(spark, t_cells)
        sinks.recover_swapped_location(loc)
        nb = sinks.resolve_num_buckets(loc, num_buckets, STATE_BUCKETS)
        schema = spark.read.parquet(loc).schema
        cols_sql = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema
        )
        spark.sql(
            f"CREATE TABLE {t_cells} ({cols_sql}) USING parquet "
            f"CLUSTERED BY (cid) INTO {nb} BUCKETS "
            f"LOCATION '{loc}'"
        )
    for t in (t_cent, *(f"{name}_{k}" for k in aux)):
        if not spark.catalog.tableExists(t):
            # heal a crashed split_oversized centroid swap the same way
            # (no-op when the live directory exists)
            sinks.recover_swapped_location(_location(spark, t))
            spark.sql(
                f"CREATE TABLE {t} USING parquet "
                f"LOCATION '{_location(spark, t)}'"
            )


def ingest(
    spark: SparkSession,
    name: str,
    batch: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    append: bool = True,
    num_buckets: int | None = None,
) -> DataFrame:
    """Assign a batch of new vectors to the frozen centroids and
    (optionally) absorb them. Returns one (cid, id) row per NEW
    vector; already-absorbed ids are excluded, so a replayed ingest is
    exactly-once ACROSS batches. The batch itself must be unique on
    ``id_col`` — the anti-join can't see duplicates arriving together,
    and both copies would be absorbed (same contract as
    sinks.merge_upsert's check_unique; dedupe upstream).

    The absorbed rows take the CELL TABLE's schema, not the batch's:
    a state built with ``store_vec=False`` (IVFPQ) absorbs only the
    id + payload codes, and any payload column the table carries must
    arrive on the batch."""
    t_cells, t_cent = _tables(name)
    known = spark.table(t_cells).select(id_col)
    new = batch.join(known, id_col, "left_anti")
    cent = spark.table(t_cent)
    t_sup = f"{name}_supers"
    if spark.catalog.tableExists(t_sup):
        # a state built with supers ingests through the same frozen
        # two-level quantizer (O(batch·p·√k)), at the SAME level-1
        # probe width the build used (_hier_spec.json beside the super
        # table; absent for pre-knob states, which were built at the
        # default width 1). Childless-super guard as in build: a
        # dropped vector would silently never absorb (and replay
        # forever as "new")
        spec = read_hier_spec(_location(spark, t_sup))
        assigned = assign_hier(
            new, cent, spark.table(t_sup), id_col, vec_col,
            super_probes=(spec or {}).get("super_probes", 1),
        )
        n_in, n_out = new.count(), assigned.count()
        if n_out != n_in:
            raise ValueError(
                f"hier ingest dropped {n_in - n_out} of {n_in} batch "
                "vectors — the persisted super table has childless "
                "cells; rebuild the state"
            )
    else:
        assigned = assign(new, cent, id_col, vec_col)
    assigned = assigned.select(*spark.table(t_cells).columns)
    if append:
        # report computed OFF the pre-append state; sever lineage
        # before mutating the table it anti-joins (lsh_state lesson).
        # Bucket count resolves from the state's own persisted spec
        # (same contract as attach/compact — a hardcoded default would
        # break, or worse silently corrupt, a non-default-bucket state)
        nb = sinks.resolve_num_buckets(
            _location(spark, t_cells), num_buckets, STATE_BUCKETS
        )
        assigned = assigned.localCheckpoint(eager=True)
        # one file per bucket, not one per (task x bucket) — see
        # sinks.write_bucketed; day-2 appends are the file-count leak
        assigned.repartition(nb, "cid").write.mode("append").format(
            "parquet"
        ).bucketBy(nb, "cid").saveAsTable(t_cells)
    return assigned.select("cid", id_col)


def probe(
    spark: SparkSession,
    name: str,
    queries: DataFrame,
    *,
    nprobe: int,
    keep: tuple[str, ...] = ("q_emb",),
) -> DataFrame:
    """(qid, *keep, cid): each query's ``nprobe`` nearest cells by
    centroid cosine (ties to the lowest cid) — the coarse-quantizer
    step every IVF serving path (exact re-rank, ADC, filtered) starts
    from. Queries must carry (qid, q_emb); ``keep`` names the query
    columns to carry through to the cell join."""
    cent = spark.table(_tables(name)[1])
    # per-row HOF top-nprobe over the collected centroid array: zero
    # Exchange (the window form shuffled |q|·k scored rows carrying
    # q_emb; guide §2.4). Ranking identical (cos DESC, lowest cid).
    return (
        queries.crossJoin(F.broadcast(V.centroid_struct_array(cent)))
        .select(
            "qid",
            *[c for c in keep if c != "qid"],
            F.explode(
                F.transform(
                    V.top_cos_structs(F.col("q_emb"), F.col("_cents"), nprobe),
                    lambda t: -t["nc"],
                )
            ).alias("cid"),
        )
    )


def search(
    spark: SparkSession,
    name: str,
    queries: DataFrame,
    *,
    k: int,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe search: queries must carry (qid, q_emb). Returns
    (qid, rnk, neighbor_id, cos_sim) — exact cosine over the probed
    cells only, per-query top-k, self-matches excluded."""
    t_cells, _ = _tables(name)
    probes = probe(spark, name, queries, nprobe=nprobe)
    cells = spark.table(t_cells)
    cos = V.cosine(F.col("q_emb"), F.col(vec_col))
    wk = Window.partitionBy("qid").orderBy(F.col("_cos").desc(), id_col)
    return (
        probes.join(cells, "cid")
        .filter(F.col("qid") != F.col(id_col))
        .select("qid", id_col, cos.alias("_cos"))
        .withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= k)
        .select(
            "qid",
            F.col("rnk").cast("int").alias("rnk"),
            F.col(id_col).alias("neighbor_id"),
            F.round("_cos", 4).alias("cos_sim"),
        )
    )


def foreach_batch_ingest(
    stream_df: DataFrame,
    name: str,
    report_path: str,
    checkpoint: str,
    **ingest_kwargs,
):
    """Streaming day-2 vector ingestion (same contract as
    lsh_state.foreach_batch_ingest): each micro-batch of new vectors
    is assigned to the frozen centroids and absorbed; the per-batch
    assignment report lands in ``{report_path}/batch_id={id}`` BEFORE
    the state append, with the empty-replay guard protecting an
    already-committed report from a crash-replayed batch."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        dest = f"{report_path}/batch_id={batch_id}"
        report = ingest(spark, name, batch_df, append=False, **ingest_kwargs)
        report = report.localCheckpoint(eager=True)
        if report.isEmpty():
            jvm = spark._jvm
            p = jvm.org.apache.hadoop.fs.Path(f"{dest}/_SUCCESS")
            fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(p):
                return
            report.write.mode("overwrite").parquet(dest)
            return
        report.write.mode("overwrite").parquet(dest)
        # absorb AFTER the report is durable. The absorbed rows carry
        # the cell table's columns (vector and/or payload), which the
        # read-only report dropped — re-derive them by joining the
        # report ids back to the batch (cheap; the batch is the small
        # side by definition)
        id_col = ingest_kwargs.get("id_col", "vec_id")
        absorbed = report.join(batch_df, id_col).select(
            *spark.table(_tables(name)[0]).columns
        )
        nb = sinks.resolve_num_buckets(
            _location(spark, _tables(name)[0]),
            ingest_kwargs.get("num_buckets"),
            STATE_BUCKETS,
        )
        absorbed.repartition(nb, "cid").write.mode("append").format(
            "parquet"
        ).bucketBy(nb, "cid").saveAsTable(_tables(name)[0])

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
    num_buckets: int | None = None,
    reclaim: bool = False,
) -> dict[str, int]:
    """Rewrite the cell table to one file per bucket — day-N hygiene
    after streaming/batch ingests (each append writes up to
    num_buckets small files). The bucket count comes from the state's
    own ``_bucket_spec.json`` (an explicit argument that contradicts
    it raises — see sinks.resolve_num_buckets). Same bucket spec after
    the rewrite, so probe search stays exchange-free; search results
    are unchanged (both pinned in tests/test_state_compaction.py).

    ``reclaim=True`` additionally drops DEAD rows — rows whose cid is
    no longer in the centroid table, i.e. the tombstoned originals a
    ``split_oversized`` retires (probe never selects a retired cid, so
    they are invisible to serving either way; reclaim is purely a
    space/scan-cost win, folded into the compaction rewrite the state
    needs anyway — the LSM posture: logical delete now, physical
    reclaim at the next maintenance window)."""
    t_cells, t_cent = _tables(name)
    loc = _location(spark, t_cells)
    nb = sinks.resolve_num_buckets(loc, num_buckets, STATE_BUCKETS)
    transform = None
    if reclaim:
        live = spark.table(t_cent).select("cid")

        def transform(df: DataFrame) -> DataFrame:
            # centroid table is k rows — broadcast semi-join, so the
            # reclaim filter rides the compaction scan for free
            return df.join(F.broadcast(live), "cid", "left_semi")

    return sinks.compact_bucketed(
        spark, t_cells, ["cid"], nb, loc, transform=transform
    )


def split_oversized(
    spark: SparkSession,
    name: str,
    *,
    cap: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int | None = None,
) -> dict[str, int]:
    """Split every LIVE cell holding more than ``cap`` vectors into two
    — the index-maintenance verb between ``ingest`` and a full rebuild.

    Day-2 ingests follow the data, not the quantizer: a drifting
    corpus piles new vectors into a few hot cells, and an oversized
    cell is exactly an oversized probe — serving cost is O(sum of
    probed cell sizes), so one 100×-mean cell makes every query that
    probes it 100× slower (the hot-partition shape of skew). Retraining
    the whole coarse quantizer is O(n·k) and invalidates every cell;
    this localizes the fix: per oversized cell, a 2-means Lloyd over
    ONLY that cell's members (deterministic: seeds are the cell's two
    lowest ``id_col`` vectors, fixed ``iters``, DECIMAL-exact means —
    the _lloyd_centroids discipline, so a DuckDB oracle replays it),
    then the members move to two fresh cids. Cost is O(moved·2·iters):
    proportional to the hot cells, never the corpus.

    Write path is the tombstone (LSM) pattern, crash-safe by ordering:
    (1) the reassigned rows APPEND to the bucketed cell table under
    their new cids (idempotent: an anti-join on (cid, id) skips rows a
    crashed prior attempt already landed); (2) the centroid table is
    rewritten via a staged two-rename swap (split cids retired, the
    2-per-cell sub-centroids added under fresh cids) — the commit
    point. A crash before (2) leaves the new-cid rows DEAD (no live
    centroid points at them): serving still probes the old cells,
    answers unchanged; re-running split completes the job. After (2)
    the OLD rows are the dead ones — equally invisible to serving,
    since probe ranks only live centroids and the cell join is an
    equi-join on cid. ``compact(reclaim=True)`` physically drops
    dead rows at the next maintenance window.

    Fresh cids allocate from the LIVE centroid table (max cid + 1):
    allocation is monotone — every split adds cids above the max it
    retires, so a retired cid is always below every later base and
    dead rows can never silently rejoin a new cell — and REPLAY-STABLE:
    a crashed run's appended rows sit at exactly the cids its replay
    re-derives, so the vec_id anti-join against rows at/above base
    skips them and the commit revives them instead of duplicating
    them (a cell-table-max base would shift per replay and append a
    second copy under fresh cids).

    Requires a vector-bearing state (``store_vec=True``): a code-only
    IVFPQ state cannot re-cluster from codes alone — rebuild those.
    Hier-built states are fine: ``super_children`` derives the child
    map from the LIVE centroid table on every ingest, so the new cells
    route through the frozen supers automatically.

    Returns counts: cells_split / rows_moved / cells_added /
    cells_live_before / cells_live_after.
    """
    t_cells, t_cent = _tables(name)
    cells = spark.table(t_cells)
    if vec_col not in cells.columns:
        raise ValueError(
            f"state {name!r} does not store {vec_col!r} (store_vec="
            "False / code-only): cannot re-cluster a cell from codes "
            "— rebuild instead"
        )
    cent = spark.table(t_cent)
    live = cells.join(F.broadcast(cent.select("cid")), "cid", "left_semi")
    sizes = live.groupBy("cid").agg(F.count(F.lit(1)).alias("n"))
    # materialize the k-row split set once: every later consumer
    # (ranks, members, newcent) would otherwise re-execute the full
    # cell-table scan + agg hiding in its lineage — at corpus scale
    # that is a full pass per consumer (guide §5: cut lineage when
    # recomputing costs more than the k-row footprint)
    over = (
        sizes.filter(F.col("n") > cap).select("cid").localCheckpoint(eager=True)
    )
    n_live_before = cent.count()
    n_split = over.count()
    if n_split == 0:
        return {
            "cells_split": 0,
            "rows_moved": 0,
            "cells_added": 0,
            "cells_live_before": n_live_before,
            "cells_live_after": n_live_before,
        }
    # 0-based dense rank of each splitting cell by cid: the new-cid
    # allocator. The global window runs over <= k rows by construction
    # (cells, not vectors).
    ranks = over.withColumn(
        "_cr", F.row_number().over(Window.orderBy("cid")) - F.lit(1)
    )
    # fresh cids: monotone, replay-stable allocation off the LIVE
    # centroid table (see docstring)
    base = cent.agg(F.max("cid")).collect()[0][0] + 1
    # materialize the hot-cell members once (O(moved) rows, the
    # operator's stated cost scale): the 2-means loop + final argmax +
    # moved-row join all re-read this frame, and without the
    # checkpoint each materialization re-scans the full bucketed cell
    # table — 4-5 corpus passes instead of one
    members = live.join(F.broadcast(over), "cid", "left_semi").localCheckpoint(
        eager=True
    )
    mv = members.select("cid", id_col, vec_col)
    # per-cell 2-means, all splitting cells in one pass: seeds are the
    # cell's two lowest-id vectors; then the fixed-iteration broadcast
    # assign + DECIMAL-exact mean loop of _lloyd_centroids, keyed
    # (cid, sub) instead of cid
    seedw = Window.partitionBy("cid").orderBy(id_col)
    subs = (
        mv.withColumn("_rn", F.row_number().over(seedw))
        .filter(F.col("_rn") <= 2)
        .select(
            "cid",
            (F.col("_rn") - F.lit(1)).alias("sub"),
            F.transform(vec_col, lambda x: x.cast("double")).alias("s_emb"),
        )
    )
    # The assign+update round runs as ONE spark.sql statement per
    # iteration over temp views. Two independent wins, both measured:
    # (1) per-row HOF argmax over the cell's (<= 2) sub-centroids
    #     collected into a cid-keyed struct array — zero Exchange,
    #     zero Sort over the member rows (the window form shuffled +
    #     sorted members·2 scored rows carrying the vector payload;
    #     ties cos DESC, lowest sub — bit-identical, see vectors.py),
    #     with the mean update as posexplode → (cid, sub, pos) decimal
    #     sums → per-(cid, sub) collect: a dim-wide single hash agg of
    #     DECIMAL(28,9) sums was tried, but precision 28 > 18 makes
    #     every sum BigDecimal-backed and the generated aggregate pays
    #     seconds of cold JIT (the _lloyd_centroids lesson — measured
    #     ~4x cold there, bit-identical results; decimal addition is
    #     exactly associative so every component sum matches).
    # (2) one JVM-side parse/analyze per iteration instead of eager
    #     re-analysis of the growing dim-wide expression tree on every
    #     DataFrame transformation (construction cost measured 2.6 s →
    #     0.9 s for the 2-iteration loop at sf0.1).
    v_mv, v_subs = f"_split_mv_{name}", f"_split_subs_{name}"
    mv.createOrReplaceTempView(v_mv)
    # cosine with V.cosine's exact accumulation order (index-ordered
    # double adds), so the DuckDB oracle replay stays bit-identical
    cos_sql = (
        f"aggregate(zip_with(m.{vec_col}, c.c_emb, (x, y) ->"
        " cast(x as double) * cast(y as double)), cast(0.0 as double),"
        " (acc, v) -> acc + v) / "
        f"(sqrt(aggregate(m.{vec_col}, cast(0.0 as double), (acc, v) ->"
        " acc + cast(v as double) * cast(v as double))) * "
        "sqrt(aggregate(c.c_emb, cast(0.0 as double), (acc, v) ->"
        " acc + cast(v as double) * cast(v as double))))"
    )
    asg_sql = f"""
  SELECT m.cid, m.{id_col}, m.{vec_col},
         -array_max(transform(a._subs,
                              c -> struct({cos_sql} AS s, -c.cid AS nc))).nc
           AS sub
  FROM {v_mv} m JOIN (
    SELECT cid,
           sort_array(collect_list(struct(sub AS cid, s_emb AS c_emb)))
             AS _subs
    FROM {v_subs} GROUP BY cid
  ) a ON a.cid = m.cid"""
    iter_sql = f"""
WITH asg AS ({asg_sql}),
pe AS (SELECT cid, sub, posexplode({vec_col}) AS (pos, x) FROM asg),
sums AS (
  SELECT cid, sub, pos,
         sum(cast(cast(x as double) as decimal(28,9))) AS s, count(*) AS n
  FROM pe GROUP BY cid, sub, pos
),
comp AS (SELECT cid, sub, pos, cast(s as double) / n AS v FROM sums)
SELECT cid, sub, sort_array(collect_list(struct(pos, v))).v AS s_emb
FROM comp GROUP BY cid, sub
"""
    for _ in range(iters):
        subs.createOrReplaceTempView(v_subs)
        subs = spark.sql(iter_sql)
    subs = subs.localCheckpoint(eager=True)
    newmap = subs.select("cid", "sub").join(F.broadcast(ranks), "cid").select(
        "cid",
        "sub",
        (F.lit(base) + F.lit(2) * F.col("_cr") + F.col("sub")).alias("new_cid"),
    )
    subs.createOrReplaceTempView(v_subs)
    final = spark.sql(f"SELECT cid, {id_col}, sub FROM ({asg_sql})")
    # spark.sql resolves views eagerly at call time, so the plans in
    # ``subs``/``final`` survive the drop
    spark.catalog.dropTempView(v_mv)
    spark.catalog.dropTempView(v_subs)
    moved = (
        final.join(F.broadcast(newmap), ["cid", "sub"])
        .join(members.withColumnRenamed("cid", "_old_cid"), id_col)
        .select(
            F.col("new_cid").alias("cid"),
            *[c for c in cells.columns if c != "cid"],
        )
        .select(*cells.columns)
    )
    # idempotent append: a crashed prior attempt (same base, see the
    # allocation note) may already have landed rows for some of these
    # vectors — by vec_id, not (cid, vec_id): an ingest between crash
    # and replay can shift the recomputed means enough to flip a
    # member's sub, and a (cid, id) key would then append a SECOND
    # copy under the other sub while the commit revives both
    already = cells.filter(F.col("cid") >= base).select(id_col)
    moved = moved.join(already, id_col, "left_anti")
    moved = moved.localCheckpoint(eager=True)
    n_moved = moved.count()
    if n_moved:
        nb = sinks.resolve_num_buckets(
            _location(spark, t_cells), num_buckets, STATE_BUCKETS
        )
        moved.repartition(nb, "cid").write.mode("append").format(
            "parquet"
        ).bucketBy(nb, "cid").saveAsTable(t_cells)
    # commit point: retire the split cids, add the sub-centroids —
    # staged two-rename swap (the compact_bucketed pattern, so a crash
    # at any instant leaves a complete copy recoverable by name, and
    # attach()'s recover_swapped_location heals it)
    add = subs.join(F.broadcast(newmap), ["cid", "sub"]).select(
        F.col("new_cid").alias("cid"), F.col("s_emb").alias("c_emb")
    )
    n_added = add.count()
    newcent = (
        cent.join(F.broadcast(over), "cid", "left_anti")
        .select("cid", "c_emb")
        .unionByName(add)
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    _swap_table(spark, t_cent, newcent)
    return {
        "cells_split": n_split,
        "rows_moved": n_moved,
        "cells_added": n_added,
        "cells_live_before": n_live_before,
        "cells_live_after": n_live_before - n_split + n_added,
    }


def merge_undersized(
    spark: SparkSession,
    name: str,
    *,
    floor: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int | None = None,
) -> dict[str, int]:
    """Merge every LIVE cell holding fewer than ``floor`` vectors into
    its nearest surviving cell — split_oversized's symmetric verb.

    Cold cells are not free: every query ranks ALL k live centroids at
    probe time, and a near-empty cell that ranks inside a query's
    nprobe buys almost no candidates with that probe slot — recall
    paid for, nothing received. Drift leaves such husks behind (the
    data moved; the quantizer point stayed). The merge retires each
    undersized cell into its nearest (cosine, ties to the lowest cid)
    cell at-or-above the floor; the survivor keeps its centroid VECTOR
    — re-fitting geometry is a trainer's job, not maintenance's — but
    the union gets a FRESH cid, because the crash-safety invariant
    demands it: appended rows must stay DEAD until the centroid-table
    commit, and appending under the survivor's own (live) cid would
    serve a vector from two cells between append and commit. Cost is
    O(moved) where moved = members of the undersized cells PLUS their
    targets (the price of the fresh-cid posture — targets are
    re-labeled, not re-scored).

    Same write discipline as split_oversized: monotone replay-stable
    cid allocation off the live centroid table, vec_id anti-join
    against rows at/above base for idempotent crash-replay, staged
    two-rename centroid swap as the commit point, dead rows reclaimed
    by compact(reclaim=True). Raises if no cell reaches the floor
    (nothing to merge into — rebuild instead).

    Returns counts: cells_merged / merge_targets / rows_moved /
    cells_live_before / cells_live_after.
    """
    t_cells, t_cent = _tables(name)
    cells = spark.table(t_cells)
    cent = spark.table(t_cent)
    live = cells.join(F.broadcast(cent.select("cid")), "cid", "left_semi")
    # k-row cell-size table, materialized once: under, survivors and
    # the pairing all consume it, and each un-checkpointed consumer
    # would re-run the full cell-table scan + agg in its lineage
    sizes = (
        live.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    under = sizes.filter(F.col("n") < floor).select("cid")
    n_live_before = cent.count()
    n_under = under.count()
    if n_under == 0:
        return {
            "cells_merged": 0,
            "merge_targets": 0,
            "rows_moved": 0,
            "cells_live_before": n_live_before,
            "cells_live_after": n_live_before,
        }
    survivors = cent.join(
        F.broadcast(sizes.filter(F.col("n") >= floor).select("cid")),
        "cid",
        "left_semi",
    )
    if survivors.isEmpty():
        raise ValueError(
            f"every live cell of {name!r} is below floor={floor} — "
            "nothing to merge into; rebuild the state"
        )
    # nearest surviving centroid per undersized centroid: per-row HOF
    # argmax over the survivor table collected into ONE broadcast
    # struct array — zero Exchange, zero Sort, no u·t scored-row
    # intermediate (the window form materialized and window-sorted the
    # full u x t cross product, which at production k is k²-scale;
    # ties cos DESC, lowest t_cid — bit-identical, see vectors.py)
    uc = cent.join(F.broadcast(under), "cid", "left_semi").select(
        F.col("cid").alias("u_cid"), F.col("c_emb").alias("u_emb")
    )
    pairing = uc.crossJoin(
        F.broadcast(V.centroid_struct_array(survivors))
    ).select(
        "u_cid",
        V.argmax_cos_cid(F.col("u_emb"), F.col("_cents")).alias("t_cid"),
    )
    targets = pairing.select("t_cid").distinct()
    n_targets = targets.count()
    # fresh cid per TARGET (0-based rank by t_cid; the split allocator)
    ranks = targets.withColumn(
        "_cr", F.row_number().over(Window.orderBy("t_cid")) - F.lit(1)
    )
    base = cent.agg(F.max("cid")).collect()[0][0] + 1
    newmap = ranks.select(
        "t_cid", (F.lit(base) + F.col("_cr")).alias("new_cid")
    )
    # old cid -> new cid for every retiring cell (unders AND targets),
    # materialized once (k-scale): moved, retired and newcent all
    # consume it, and its lineage reaches back through the pairing to
    # the centroid scans
    relabel = (
        pairing.join(F.broadcast(newmap), "t_cid")
        .select(F.col("u_cid").alias("cid"), "new_cid")
        .unionByName(
            newmap.select(F.col("t_cid").alias("cid"), "new_cid")
        )
        .localCheckpoint(eager=True)
    )
    moved = (
        live.join(F.broadcast(relabel), "cid")
        .withColumn("cid", F.col("new_cid"))
        .select(*cells.columns)
    )
    already = cells.filter(F.col("cid") >= base).select(id_col)
    moved = moved.join(already, id_col, "left_anti")
    moved = moved.localCheckpoint(eager=True)
    n_moved = moved.count()
    if n_moved:
        nb = sinks.resolve_num_buckets(
            _location(spark, t_cells), num_buckets, STATE_BUCKETS
        )
        moved.repartition(nb, "cid").write.mode("append").format(
            "parquet"
        ).bucketBy(nb, "cid").saveAsTable(t_cells)
    # commit: retire unders and targets, add the unions (the target's
    # centroid vector under the fresh cid)
    retired = relabel.select("cid")
    add = newmap.join(
        cent.withColumnRenamed("cid", "t_cid"), "t_cid"
    ).select(F.col("new_cid").alias("cid"), "c_emb")
    newcent = (
        cent.join(F.broadcast(retired), "cid", "left_anti")
        .select("cid", "c_emb")
        .unionByName(add)
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    _swap_table(spark, t_cent, newcent)
    return {
        "cells_merged": n_under,
        "merge_targets": n_targets,
        "rows_moved": n_moved,
        "cells_live_before": n_live_before,
        # each under retires; each target retires but is replaced by
        # exactly one union cell -> net -n_under
        "cells_live_after": n_live_before - n_under,
    }


def _swap_table(spark: SparkSession, table: str, df: DataFrame) -> None:
    """Replace a small unbucketed state table's data via the staged
    two-rename swap (stage at ``__compact`` — always complete before
    the swap starts — live to ``__old``, stage to live): a crash at
    any point leaves a full copy under a name
    sinks.recover_swapped_location restores. ``df`` must be severed
    from the table it replaces (localCheckpoint) before the call."""
    import os
    import shutil

    loc = _location(spark, table)
    staging, old_dir = f"{loc}__compact", f"{loc}__old"
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(old_dir, ignore_errors=True)
    df.write.mode("overwrite").parquet(staging)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    os.rename(loc, old_dir)
    os.rename(staging, loc)
    shutil.rmtree(old_dir, ignore_errors=True)
    spark.sql(f"CREATE TABLE {table} USING parquet LOCATION '{loc}'")
    spark.catalog.refreshTable(table)
