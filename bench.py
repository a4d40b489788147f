#!/usr/bin/env python
"""Benchmark the headline query set.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

The headline set covers every operator family (scan/agg/join/window/
topk/setop/json/array/dedup/text/similarity/events) but excludes the
deliberately-quadratic correctness baselines (dedup_embedding_cosine)
at bench scale — their scale-path twins (ann_lsh_bucket,
dedup_minhash_lsh) are benched instead.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deep_field_spark.queries import load_registry
from deep_field_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q8_market_share",
    "q18_large_volume_customer",
    "q4_order_priority",
    "q14_promo_revenue",
    "q21_waiting_supplier",
    "q13_customer_distribution",
    "q7_volume_shipping",
    "q10_returned_items",
    "q17_small_quantity",
    "q19_disjunctive_predicates",
    "q15_top_supplier",
    "q22_dormant_customers",
    "join_bloom_pruned",
    "table_profile_lineitem",
    "dq_referential_audit",
    "incr_agg_refresh",
    "table_snapshot_diff",
    "dq_key_skew_profile",
    "dq_distribution_drift",
    "dq_distribution_drift_approx",
    "streaming_drift_psi",
    "scan_filter_project",
    "join_inner_dim",
    "join_semi",
    "join_anti",
    "topk_per_group",
    "window_running_total",
    "window_rank_lag",
    "rollup_flag_status",
    "unpivot_part_metrics",
    "cube_status_priority",
    "distinct_counts",
    "set_ops_customers",
    "string_funcs",
    "date_funcs",
    "json_extract_events",
    "variant_props_events",
    "array_funcs_embeddings",
    "asof_join_purchases",
    "sessionize_events",
    "events_tumbling_hourly",
    "appearance_windows_events",
    "events_funnel_steps",
    "events_cohort_retention",
    "events_anomaly_zscore",
    "events_anomaly_mad",
    "events_transition_matrix",
    "events_scd2_intervals",
    "events_resample_gapfill",
    "dedup_exact",
    "dedup_incremental_batch",
    "dedup_incremental_minhash",
    "curation_dedup_report",
    "dedup_minhash_lsh",
    "dedup_minhash_autok",
    # dedup_minhash_recall_report is EXCLUDED from the headline (r9
    # verdict hygiene): its ground-truth leg exactly enumerates every
    # pair sharing a shingle — inherently pair-bound (~46 s @ sf1, the
    # suite's biggest row) and NO candidate-generation scheme can cut
    # the truth side. The bounded calibration twin below
    # (dedup_minhash_recall_sample: fixed-size md5-selected anchor
    # sample, |anchors| probes at any corpus size) is the benched scale
    # path; the full report stays oracle-gated at sf0.01 in every
    # pytest run (same pattern as dedup_tfidf_allpairs /
    # knn_brute_force).
    "dedup_minhash_recall_sample",
    "dedup_threshold_sweep",
    "dedup_containment",
    # dedup_tfidf_allpairs is EXCLUDED: the synthetic template corpus
    # is the adversarial case for similarity pruning — nearly every
    # doc pair scores >=0.5 cosine, so the candidate set is
    # output-bound (~all pairs) and NO exact algorithm is subquadratic
    # on it. The sf0.01 oracle gate (brute-force hash-match) is the
    # completeness proof; pruning effectiveness is corpus-dependent
    # and real Zipfian corpora are the sparse case the paper targets.
    "dedup_simhash",
    "text_token_stats",
    "text_quality_score",
    "text_fingerprint",
    "text_tfidf_topk",
    "text_bm25_search",
    "retrieval_rrf_fusion",
    "retrieval_eval_ndcg",
    "text_bpe_train",
    "text_bpe_apply",
    "text_gopher_filters",
    "text_repetition_ratio",
    "text_chunk_overlap",
    "text_vocab_topk",
    "text_vocab_coverage",
    "text_heavy_hitters",
    "text_countmin_freq",
    "join_skew_salted",
    "corpus_zipf_profile",
    "curation_source_divergence",
    "curation_source_profile",
    "decontam_ngram_overlap",
    # its bloom-prefiltered scale twin (r11): same result by
    # construction, the bench prices the bitmask build + scan-side test
    "decontam_bloom",
    "corpus_split_assign",
    "corpus_split_dedup_aware",
    "pii_redact",
    "corpus_pack_sequences",
    "corpus_mixture_sample",
    "corpus_mixture_plan",
    "corpus_length_buckets",
    "corpus_group_sample",
    "corpus_weighted_sample",
    "corpus_stratified_quota",
    "corpus_shuffle_assign",
    "decontam_exact_substring",
    "curation_boilerplate_ngrams",
    "text_token_entropy",
    "text_bigram_logprob",
    "corpus_perplexity_buckets",
    "corpus_perplexity_buckets_approx",
    "curation_pipeline_e2e",
    "curation_quality_classifier",
    "curation_dsir_weights",
    "curation_quality_train",
    "decontam_embedding",
    "decontam_union_report",
    "embedding_pq_codes",
    # ann_pq_adc_search is EXCLUDED from the headline (r7 verdict
    # pattern): its query set scales with the corpus (vec_id %
    # QUERY_MOD) and it scans ALL codes per query — the declared
    # O(n^2/50) recall-ceiling baseline. The composed production form,
    # ann_ivfpq_search (probed cells only), is benched below with a
    # build/serve phase split. The baseline stays oracle-gated at
    # sf0.01 in every pytest run.
    "corpus_split_leakage",
    "corpus_novelty_profile",
    "graph_pagerank",
    "dedup_exact_substring_runs",
    "dedup_dup_span_removal",
    # knn_brute_force is EXCLUDED: the deliberately-quadratic exact-kNN
    # correctness baseline (SCALE.md declares it excluded — the bench
    # now agrees). Its scale-path twins ann_lsh_bucket /
    # ann_incremental_ivf / ann_ivfpq_search are all benched; the
    # baseline stays oracle-gated at sf0.01 in every pytest run.
    "ann_lsh_bucket",
    "ann_lsh_multiprobe",
    # MIPS via the norm-augmentation reduction: the truth leg is the
    # fixed 8-query calibration sample, so the row is bounded like
    # ann_ivf_recall (never the corpus-scaled ADC baseline's shape)
    "ann_mips_reduction",
    "ann_recall_report",
    "embedding_power_iteration",
    "ann_ivf_cells",
    "ann_ivf_kmeans",
    # the derived-parameter chart (r10): exposes n_cells/n_planes
    # resolved from the live corpus count + index occupancy — cheap
    # (one memoized-assignment groupBy) but the headline should price it
    "ann_ivf_autok",
    # r11 charts: the bounded-training-sample accounting and the
    # two-level O(n·√k) assignment vs the exact flat assign
    "ann_train_autocap",
    "ann_hier_assign",
    # r12: the hier serving-recall contract (three hermetic ivf_state
    # builds — flat/hier p=1/hier p=2 — served at the nprobe sweep
    # against one shared brute truth)
    "ann_hier_recall",
    # r12: the cell-split rebalance maintenance chart (hermetic build
    # + split_oversized + reclaim compaction; phase-split
    # csplit.build/csplit.maint)
    "ann_cell_split",
    # r12: the symmetric merge verb (undersized cells retire into
    # their nearest surviving cell; cmerge.build/cmerge.maint)
    "ann_cell_merge",
    "ann_incremental_ivf",
    "ann_ivf_recall",
    "ann_ivfpq_search",
    # day-2 lifecycle: frozen-codebook ingest + compact + serve, then the
    # streaming serving twin (single availableNow batch over the same
    # query sample; includes its own hermetic state build)
    "ann_ivfpq_incremental",
    "streaming_ann_serve",
    "ann_ivfpq_recall",
    "ann_ivfpq_residual_recall",
    "ann_ivf_filtered",
    "ann_filtered_recall",
    "dedup_semantic",
    "embedding_quantize_int8",
    "embedding_hard_negatives",
    "multimodal_frame_sample",
    "multimodal_arrow_meta",
    "multimodal_decode_real",
    "multimodal_audio_rms",
    "multimodal_video_luma",
    "udaf_grouped_pandas",
    "cogrouped_map_asof",
    "map_funcs_events",
    # third streaming driver row: day-2 LSH crawl ingestion through
    # foreach_batch_ingest (hermetic build + staged single-batch
    # stream, the streaming_drift_psi convention)
    "streaming_dedup_ingest",
    "scrape_core_resolved_plays",
    # runs LAST: its parse-UDF + many-small-stage profile floods the
    # JVM code cache and makes the next heavy-codegen query pay ~3x
    # one-time JIT cost (measured); keeping it at the end isolates that
    "scrape_star_plays",
]


def _bench_lsh_split(spark, sf_dir: str) -> tuple[float, float, int]:
    """Time dedup_incremental_minhash's two phases separately (same
    parameters and filters as the registered query, queries/dedup.py):
    corpus state build vs batch ingest."""
    import pyspark.sql.functions as F

    from deep_field_spark.catalog import table
    from deep_field_spark.operators import lsh_state
    from deep_field_spark.queries.dedup import (
        BANDS,
        INCR_BATCH_MIN_ID,
        MINHASH_THRESHOLD,
        NGRAM,
        NUM_HASHES,
        _memo_lsh_base,
    )

    docs = table(spark, sf_dir, "documents")
    name = "bench_lsh_split"
    t0 = time.perf_counter()
    # the memoized clone-or-build path the registered query itself
    # takes (queries/dedup._memo_lsh_base): the FIRST consumer in the
    # session pays the real build here; streaming_dedup_ingest's
    # lshing.build row later clones the same bytes
    _memo_lsh_base(spark, sf_dir, name)
    build_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    report = lsh_state.ingest(
        spark,
        name,
        docs.filter(F.col("doc_id") >= INCR_BATCH_MIN_ID),
        ngram=NGRAM,
        num_hashes=NUM_HASHES,
        bands=BANDS,
        threshold=MINHASH_THRESHOLD,
        append=False,
    )
    n = report.filter(F.col("dup_of").isNotNull()).count()
    ingest_dt = time.perf_counter() - t0
    lsh_state.drop(spark, name)
    return build_dt, ingest_dt, n


def _bench_streaming_ingest_split(
    spark, sf_dir: str
) -> tuple[float, float, int]:
    """Time streaming_dedup_ingest's two phases separately: the
    hermetic day-1 LSH state build vs the recurring day-2 stream
    (stage + foreachBatch dedup-and-absorb + durable reports) — same
    convention as lsh_state.build/.ingest, so round-over-round reads
    don't mistake build cost for serving drift (r10 verdict #3)."""
    from deep_field_spark.queries.dedup import _sdi_build, _sdi_stream

    t0 = time.perf_counter()
    name = _sdi_build(spark, sf_dir)
    build_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = _sdi_stream(spark, sf_dir, name).count()
    stream_dt = time.perf_counter() - t0
    return build_dt, stream_dt, n


def _split_row(
    name: str,
    keys: tuple[str, str],
    labels: tuple[str, str],
    fn,
    spark,
    sf_dir: str,
    timings: dict[str, float],
) -> float:
    """Run a two-phase split benchmark with the SAME error containment
    as the generic query path: a failure records the elapsed time as
    the query's row (no phase rows), prints the error, and the suite
    continues — one bad split must not sink the whole artifact (the
    pre-split behavior these queries had on the generic path)."""
    t0 = time.perf_counter()
    try:
        a, b, n = fn(spark, sf_dir)
    except Exception as e:  # noqa: BLE001 — containment, see docstring
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        print(f"# {name}: ERROR after {dt:.2f}s: {e!r}", file=sys.stderr)
        return dt
    timings[keys[0]] = round(a, 3)
    timings[keys[1]] = round(b, 3)
    timings[name] = round(a + b, 3)
    print(
        f"# {name}: {a + b:.2f}s ({n} rows) "
        f"[{labels[0]} {a:.2f}s + {labels[1]} {b:.2f}s]",
        file=sys.stderr,
    )
    return a + b


def _bench_minhash_calib_split(
    spark, sf_dir: str
) -> tuple[float, float, int]:
    """Time dedup_minhash_recall_sample's two phases separately: the
    calibration BUILD (anchor truth + banded-LSH candidate set, both
    persisted — forced here with a count per frame) vs the VERIFY
    (hit/tp semi-joins + summary off the cached frames). The suite's
    largest row conflated the two (r11 verdict #3); the query's own
    entry stays their sum for comparability."""
    from deep_field_spark.queries.dedup import _mrs_frames, _mrs_summary

    t0 = time.perf_counter()
    anchors, truth, cda = _mrs_frames(spark, sf_dir)
    truth.count()
    cda.count()
    build_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = _mrs_summary(anchors, truth, cda).count()
    verify_dt = time.perf_counter() - t0
    truth.unpersist()
    cda.unpersist()
    return build_dt, verify_dt, n


def _bench_hrec_split(spark, sf_dir: str) -> tuple[float, float, int]:
    """Time ann_hier_recall's two phases separately: the three
    hermetic state builds (flat / hier p=1 / hier p=2 — the one-time
    cost a production comparison pays once) vs the recurring serve
    (nprobe-sweep probes from all three persisted states + the shared
    brute truth + the recall pivot)."""
    from deep_field_spark.queries.similarity import (
        _hrec_builds,
        _hrec_serve,
    )

    t0 = time.perf_counter()
    states = _hrec_builds(spark, sf_dir)
    build_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = _hrec_serve(spark, sf_dir, states).count()
    serve_dt = time.perf_counter() - t0
    return build_dt, serve_dt, n


def _bench_csplit_split(spark, sf_dir: str) -> tuple[float, float, int]:
    """Time ann_cell_split's two phases separately: the hermetic day-1
    state build vs the recurring MAINTENANCE leg (cap derivation +
    split_oversized + before/after geometry + reclaim compaction) —
    production pays the build once and the maintenance leg at every
    quiet window, so the second number is the one an operator reads."""
    from deep_field_spark.queries.similarity import (
        _csplit_build,
        _csplit_maint,
    )

    t0 = time.perf_counter()
    name = _csplit_build(spark, sf_dir)
    build_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = _csplit_maint(spark, sf_dir, name).count()
    maint_dt = time.perf_counter() - t0
    return build_dt, maint_dt, n


def _bench_cmerge_split(spark, sf_dir: str) -> tuple[float, float, int]:
    """Time ann_cell_merge's two phases separately (the csplit.*
    twin): hermetic day-1 build vs the recurring maintenance leg
    (floor derivation + merge_undersized + geometry metrics + reclaim
    compaction)."""
    from deep_field_spark.queries.similarity import (
        _cmerge_build,
        _cmerge_maint,
    )

    t0 = time.perf_counter()
    name = _cmerge_build(spark, sf_dir)
    build_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = _cmerge_maint(spark, sf_dir, name).count()
    maint_dt = time.perf_counter() - t0
    return build_dt, maint_dt, n


def _bench_ivfpq_split(spark, sf_dir: str) -> tuple[float, float, int]:
    """Time ann_ivfpq_search's two phases separately: the one-time
    index build (coarse k-means + PQ codebooks + persisted code-only
    cell table) vs the recurring serve path (probe + ADC + top-k).
    Production amortizes the build across days; serve is the day-2
    number."""
    from deep_field_spark.queries.similarity import (
        _ivfpq_build,
        _ivfpq_serve,
    )

    t0 = time.perf_counter()
    name = _ivfpq_build(spark, sf_dir)
    build_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = _ivfpq_serve(spark, sf_dir, name).count()
    serve_dt = time.perf_counter() - t0
    return build_dt, serve_dt, n


def _bench_scrape_star_split(
    spark, sf_dir: str
) -> tuple[float, float, int]:
    """Time scrape_star_plays's two phases separately: the page-scan +
    parse-UDF + player-dim materialization (scrape.parse) vs the star
    build + FK-resolution joins (scrape.star) — r12 verdict #3's
    phase-row ask, so round-over-round reads can attribute parse-cost
    vs star-build drift."""
    from deep_field_spark.queries.scrape import _ssp_parse, _ssp_star

    t0 = time.perf_counter()
    parsed, players = _ssp_parse(spark)
    parse_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = _ssp_star(spark, parsed, players)
    n = out.count()
    star_dt = time.perf_counter() - t0
    parsed.unpersist()
    players.unpersist()
    out.unpersist()
    return parse_dt, star_dt, n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    reg = load_registry()
    spark = get_spark("deep_field_spark_bench")

    # warm the JVM + parquet footers once so timings measure the queries
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # warm the Python worker pool + Arrow serializers: the first pandas
    # UDF in a session pays worker fork + pandas/pyarrow import on every
    # core (~2-10 s) — a per-session constant, not a per-query cost
    from pyspark.sql.functions import col, pandas_udf  # noqa: PLC0415

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(256, numPartitions=32).select(_warm(col("id"))).count()
    # mapInPandas warms a DIFFERENT worker/serializer path than a
    # scalar pandas UDF (~2.5 s cold at 32 cores, measured): without
    # this, whichever mapInPandas query runs FIRST absorbs the cost —
    # the r7 bench showed multimodal_frame_sample 0.54→1.11 s with no
    # code change purely from ordering. Warm both so per-query timings
    # are order-independent.
    spark.range(256, numPartitions=32).selectExpr(
        "id", "cast(string(id) as binary) as payload"
    ).mapInPandas(lambda it: it, "id long, payload binary").count()

    # Train the memoized deterministic artifacts (coarse centroids, PQ
    # codebooks) ONCE up front, timed per family as train.* tail rows
    # that COUNT toward the headline total: production builds an index
    # once and serves it for days, and the session memo
    # (queries/similarity._memo_train) is that amortization — without
    # this explicit warm, whichever query first needed a family would
    # absorb its training cost, making per-query timings depend on
    # suite order (and flicker across the min-of-2 threshold).
    from deep_field_spark.queries.similarity import warm_training_memo

    train_rows = warm_training_memo(spark, sf_dir)
    print(
        "# training memo: "
        + ", ".join(f"{k} {v:.2f}s" for k, v in train_rows.items()),
        file=sys.stderr,
    )

    # The two remaining session-memoized artifacts, priced the same way
    # (r12 verdict wart #5: without up-front rows, WHICH query's row
    # paid the BPE merge loop / the rrf semantic pool depended on suite
    # order and intervening clearCache calls). Separate rows, NOT folded
    # into train.total, so that number stays comparable to r11/r12.
    from deep_field_spark.queries.similarity import _rrf_sem_pool
    from deep_field_spark.queries.text import _bpe_merges

    t0 = time.perf_counter()
    _rrf_sem_pool(spark, sf_dir).count()
    sem_pool_dt = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _bpe_merges(spark, sf_dir)
    bpe_dt = round(time.perf_counter() - t0, 3)
    print(
        f"# memo warm: sem_pool.build {sem_pool_dt:.2f}s, "
        f"bpe.train {bpe_dt:.2f}s",
        file=sys.stderr,
    )

    # Host-calibration pair (r8 verdict: the driver host ran the SAME
    # SHA 22% slower than the builder's run, and without a speed
    # anchor that read as a fake regression on byte-unchanged
    # queries). Two FIXED workloads timed after warm-up: a pure-CPU
    # hash pass (C-speed, no Spark) and a tiny fixed Spark job with
    # one shuffle (JVM + scheduler + exchange path). They ride in the
    # timings map under dotted keys — the phase-row convention, so
    # tools/bench_compare.py keeps them out of totals — and
    # bench_compare uses them to separate host drift from code drift.
    import hashlib

    buf = bytes(64 * 1024 * 1024)
    t0 = time.perf_counter()
    for _ in range(4):
        hashlib.sha256(buf).digest()
    cal_cpu = time.perf_counter() - t0
    cal_spark = float("inf")
    for _ in range(3):  # min-of-3: residual JIT + GC noise (~15%
        # spread was measured on min-of-2 with an 8M-row job; the
        # bigger job + extra rep tighten the anchor that cross-host
        # normalization divides by)
        t0 = time.perf_counter()
        spark.range(0, 16_000_000, 1, 32).selectExpr(
            "id % 97 AS k", "id AS v"
        ).groupBy("k").sum("v").count()
        cal_spark = min(cal_spark, time.perf_counter() - t0)

    timings: dict[str, float] = {
        "cal.cpu": round(cal_cpu, 3),
        "cal.spark": round(cal_spark, 3),
        **train_rows,
        "sem_pool.build": sem_pool_dt,
        "bpe.train": bpe_dt,
    }
    # one-time training IS suite wall (incl. the two memo-warm rows)
    total = sum(train_rows.values()) + sem_pool_dt + bpe_dt
    # phase-split rows: the hermetic registry queries rebuild their
    # persisted state per run, but at 100 TB the build is a one-time
    # (or re-sharding-time) cost amortized across days while the
    # second phase is the recurring day-2 number. Report both so the
    # bench is interpretable round-over-round; each query's own entry
    # stays their sum for comparability, and _split_row keeps the
    # generic path's error containment.
    _SPLITS = {
        "dedup_incremental_minhash": (
            ("lsh_state.build", "lsh_state.ingest"),
            ("build", "ingest"),
            _bench_lsh_split,
        ),
        "streaming_dedup_ingest": (
            ("lshing.build", "lshing.stream"),
            ("build", "stream"),
            _bench_streaming_ingest_split,
        ),
        "ann_hier_recall": (
            ("hrec.build", "hrec.serve"),
            ("build", "serve"),
            _bench_hrec_split,
        ),
        "ann_cell_split": (
            ("csplit.build", "csplit.maint"),
            ("build", "maint"),
            _bench_csplit_split,
        ),
        "ann_cell_merge": (
            ("cmerge.build", "cmerge.maint"),
            ("build", "maint"),
            _bench_cmerge_split,
        ),
        "dedup_minhash_recall_sample": (
            ("calib.build", "calib.verify"),
            ("build", "verify"),
            _bench_minhash_calib_split,
        ),
        "ann_ivfpq_search": (
            ("ivfpq.build", "ivfpq.serve"),
            ("build", "serve"),
            _bench_ivfpq_split,
        ),
        "scrape_star_plays": (
            ("scrape.parse", "scrape.star"),
            ("parse", "star"),
            _bench_scrape_star_split,
        ),
    }
    for name in HEADLINE:
        if name in _SPLITS:
            keys, labels, fn = _SPLITS[name]
            total += _split_row(name, keys, labels, fn, spark, sf_dir, timings)
            continue
        q = reg[name]
        t0 = time.perf_counter()
        try:
            n = q.fn(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001 — one bad query must not
            # sink the whole artifact; time still counts, error visible
            dt = time.perf_counter() - t0
            timings[name] = round(dt, 3)
            total += dt
            print(f"# {name}: ERROR after {dt:.2f}s: {e!r}", file=sys.stderr)
            continue
        dt = time.perf_counter() - t0
        if dt < 2.0:
            # min-of-2 for short queries (r8 verdict): sub-2 s timings
            # are scheduler/GC-noise-dominated and drove phantom 22-47%
            # "regressions" on byte-unchanged code; the rerun is cheap
            # by definition (< 2 s each) and min is the code cost.
            # clearCache first: queries that persist() intermediates
            # would otherwise rerun warm off the CacheManager's
            # logical-plan matching (text_bpe_train measured 0.35 s on
            # a 2 s query) — the rerun must repeat the same cold work.
            # The training memo survives (localCheckpoint is RDD-level
            # storage, not a CacheManager entry): its amortization is
            # the deliberate production analogy, a leaked persist isn't.
            spark.catalog.clearCache()
            t1 = time.perf_counter()
            try:
                n2 = q.fn(spark, sf_dir).count()
            except Exception as e:  # noqa: BLE001 — same containment
                # as the first run: a flaky rerun must not sink the
                # whole artifact; keep the successful first timing
                print(f"# {name}: rerun ERROR, keeping first timing: "
                      f"{e!r}", file=sys.stderr)
            else:
                if n2 != n:
                    # a non-idempotent query (e.g. append-mode state
                    # without anti-join replay) ran two DIFFERENT
                    # workloads — folding a min over them would record
                    # neither (advisor r9). Flag loudly, keep run 1.
                    print(f"# {name}: rerun row count {n2} != first "
                          f"run {n} — non-idempotent query? keeping "
                          "first timing", file=sys.stderr)
                else:
                    dt = min(dt, time.perf_counter() - t1)
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # One compact JSON line per row (r12 verdict #1, option B): a
    # full-stdout scraper gets every per-query timing even though the
    # driver's bounded tail cannot hold them all. Printed as a block
    # right before the contract line so the per-run stdout ordering is
    # deterministic; these lines sit ABOVE the tail window and never
    # displace the parseable lines below.
    for k, v in timings.items():
        print(json.dumps({"q": k, "s": v}, separators=(",", ":")))
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    # Per-query values INSIDE the driver's 2000-char stdout tail (r12
    # verdict #1): the full named map is ~4.7 KB and can never fit, so
    # the values ride positionally — the order is the `queries` key
    # order of the full line above (dict insertion order: cal.*,
    # train.*, then HEADLINE with each split query's phase rows
    # immediately before its own entry), which is deterministic per
    # code version and recoverable from any committed full-line
    # artifact (plans/r13/bench_*.json) or from bench.py itself. At
    # ~6 chars/value this line is ~1.2 KB: it and the final line below
    # both survive the tail intact.
    print(
        json.dumps(
            {
                "metric": "headline_per_query_sec",
                "n": len(timings),
                "order": "queries key order of the full line",
                "values": list(timings.values()),
            },
            separators=(",", ":"),
        )
    )
    # Tail-proof headline: the full per-query line above exceeds the
    # driver's bounded tail capture at 80+ queries (BENCH_r05 parsed
    # null). Print a compact machine-readable line LAST so the tail
    # always retains the headline number — AND the host-calibration
    # anchors (r10 verdict #1: the driver tail truncates the big line
    # from the FRONT, so cal.cpu/cal.spark riding only in the timings
    # dict never survived into BENCH_r{N}.parsed, and the r8 "fake
    # regression on byte-unchanged code" failure mode was back; the
    # compact line is the one artifact designed to survive, so the
    # anchors that separate host drift from code drift live here too).
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                # len(HEADLINE), not len(timings): the lsh_state.build /
                # .ingest phase-split rows are informational, not queries
                "n_queries": len(HEADLINE),
                "sf": sf_val,
                # scaling input (r12 verdict #1): each artifact
                # self-describes the core count it ran at, so the
                # driver's 8-core run is attributable from the tail
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
                "cal.cpu": round(cal_cpu, 3),
                "cal.spark": round(cal_spark, 3),
                # one-time training block (counts toward the headline
                # total but amortizes in production via the session
                # memo) — split out so round-over-round reads can
                # attribute build-cost vs serve-cost drift from the
                # compact line alone
                "train.total": round(sum(train_rows.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
