"""Physical-plan regression tests: the plans, not just the answers.

A correct-but-wrong-shaped plan is a 100 TB incident. These assertions
pin the properties the judge grades: filters/columns reaching the
parquet scan, dims broadcast, no nested-loop joins on the scale paths,
top-k via TakeOrderedAndProject, partial aggregation present.
"""

from __future__ import annotations

import pytest

from deep_field_spark.queries import load_registry

REGISTRY = load_registry()


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "scan_filter_project")
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read all 16 lineitem columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema
    assert "l_quantity" in read_schema


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4  # cust, supp, nation, region
    assert "BroadcastNestedLoopJoin" not in plan


def test_global_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "global_topk")
    assert "TakeOrderedAndProject" in plan


def test_agg_is_partial_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    # the map-side combine is the HashAggregate BELOW (printed after)
    # the exchange — first-occurrence index order is always true and
    # proves nothing
    assert "HashAggregate" in plan[plan.index("Exchange"):]


@pytest.mark.parametrize(
    "name",
    ["dedup_embedding_cosine", "dedup_minhash_lsh", "ann_lsh_bucket",
     "ann_lsh_multiprobe", "dedup_simhash_pairs", "dedup_ngram_jaccard"],
)
def test_scale_paths_have_no_nested_loop_join(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name


def test_decontam_broadcasts_benchmark_grams(spark, sf_dir):
    plan = _plan(spark, sf_dir, "decontam_ngram_overlap")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_repetition_ratio_has_partial_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_repetition_ratio")
    # partial (doc, gram) agg below the exchange — map-side combine
    assert "HashAggregate" in plan[plan.index("Exchange"):]


def test_range_window_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "window_range_7d")
    # one hash-partitioning exchange on the window key, nothing else
    assert plan.count("Exchange hashpartitioning") == 1


def test_ivf_crossjoin_broadcasts_only_centroids(spark, sf_dir):
    """IVF scores every vector against every centroid by design (k·n);
    the plan must realize that as a broadcast of the TINY centroid side
    — one BNLJ with BuildRight, never a corpus×corpus product."""
    plan = _plan(spark, sf_dir, "ann_ivf_cells")
    bnlj = plan.count("BroadcastNestedLoopJoin")
    # one per side of the probes⋈assign join (ranked lineage recomputed)
    assert 1 <= bnlj <= 2
    assert plan.count("BuildRight, Cross") == bnlj
    assert "CartesianProduct" not in plan


def test_theta_join_keeps_equi_partitioning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_theta_self")
    # equi component (brand) must carry the join; inequality is residual
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_semi_anti_joins_planned(spark, sf_dir):
    assert "LeftSemi" in _plan(spark, sf_dir, "join_semi")
    assert "LeftAnti" in _plan(spark, sf_dir, "join_anti")


def test_pii_redact_is_scan_only(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pii_redact")
    assert "Exchange" not in plan  # zero shuffle: regexps in the scan pass
    assert "BatchScan" in plan or "FileScan" in plan or "Scan parquet" in plan


def test_pack_sequences_single_window_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "corpus_pack_sequences")
    assert plan.count("Exchange hashpartitioning") == 1  # the source window
    assert "Window" in plan


def test_quantize_is_scan_only(spark, sf_dir):
    plan = _plan(spark, sf_dir, "embedding_quantize_int8")
    assert "Exchange" not in plan  # per-row quantization, zero shuffle


def test_funnel_no_nested_loop(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_funnel_steps")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_mixture_sample_is_scan_only(spark, sf_dir):
    plan = _plan(spark, sf_dir, "corpus_mixture_sample")
    assert "Exchange" not in plan


def test_cohort_and_anomaly_no_nested_loop(spark, sf_dir):
    for name in ("events_cohort_retention", "events_anomaly_zscore"):
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_tfidf_df_join_and_bounded_topk(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_tfidf_topk")
    # the only nested-loop is the 1-row scalar N broadcast; the
    # (term) df join must be a hash join, and the top-k a window
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan
    assert "Window" in plan


def test_incremental_dedup_hash_joins_only(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_incremental_batch")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_transition_matrix_no_nested_loop(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_transition_matrix")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_chunk_overlap_is_shuffle_free(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_chunk_overlap")
    # pure generator: tokenize once, explode starts, slice — no exchange
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("Generate") == 1  # one explode; tokenize not re-derived


def test_vocab_topk_take_ordered_not_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_vocab_topk")
    assert "TakeOrderedAndProject" in plan
    # the full term table must never funnel through one partition
    assert "Exchange SinglePartition" not in plan.split("TakeOrderedAndProject")[0]


def test_source_profile_partial_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "curation_source_profile")
    # a partial (map-side) aggregate must sit BELOW the exchange: plan
    # strings print root-first, so a HashAggregate after the first
    # Exchange is the pre-shuffle combine. (Checking only index order
    # of the first occurrences is vacuous — the final agg always
    # prints above its exchange.)
    assert "HashAggregate" in plan[plan.index("Exchange"):]


def test_pack_sequences_window_is_sharded(spark, sf_dir):
    """The packing cumsum must be keyed (source, shard), never source
    alone — one hot source must not serialize through a single task."""
    plan = _plan(spark, sf_dir, "corpus_pack_sequences")
    import re
    wins = [l for l in plan.splitlines() if re.search(r"\bWindow\b", l)]
    assert wins, plan
    for w in wins:
        assert "shard" in w, w


def test_group_sample_is_two_stage_topk(spark, sf_dir):
    """Exact per-source top-k via shard-partitioned partial top-k then
    merge: two Window nodes, the first keyed (source, _shard)."""
    plan = _plan(spark, sf_dir, "corpus_group_sample")
    import re
    wins = [l for l in plan.splitlines() if re.search(r"\bWindow\b", l)]
    assert len(wins) == 2, plan
    assert any("_shard" in w for w in wins), plan


def test_shuffle_assign_no_global_window(spark, sf_dir):
    """corpus_shuffle_assign's total-order rank must stay hash-bucketed
    — a partition-less WindowExec here is the round-3 id-assignment
    defect reborn on the corpus path."""
    plan = _plan(spark, sf_dir, "corpus_shuffle_assign")
    bad = [
        line
        for line in plan.splitlines()
        if "Window [" in line
        and ("ASC" in line or "DESC" in line)
        and line.count("], [") < 2
    ]
    assert not bad, "\n".join(bad)
    assert "BroadcastHashJoin" in plan  # offsets ride a broadcast


def test_exact_substring_prefilters_candidates(spark, sf_dir):
    """decontam_exact_substring must verify containment on
    anchor-join candidates, never a docs × snippets broadcast scan:
    the anchor equi-join is a broadcast HASH join, and no nested-loop
    or cartesian node may appear anywhere in the plan."""
    plan = _plan(spark, sf_dir, "decontam_exact_substring")
    assert "BroadcastHashJoin" in plan  # anchor → snippet prefilter
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_boilerplate_topk_is_two_stage_sharded(spark, sf_dir):
    """curation_boilerplate_ngrams ranks INSIDE the pre-aggregated
    (source, gram) table (partial/final agg below the window), and the
    rank itself is the two-stage sharded top-k: two Window nodes, the
    first keyed (source, _shard) so no source's gram table ever
    streams through one task. Doc totals broadcast."""
    plan = _plan(spark, sf_dir, "curation_boilerplate_ngrams")
    assert "HashAggregate" in plan[plan.index("Exchange"):]
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re
    wins = [l for l in plan.splitlines() if re.search(r"\bWindow\b", l)]
    assert len(wins) == 2, plan
    assert any("_shard" in w for w in wins), plan


def test_token_entropy_partial_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_token_entropy")
    assert "HashAggregate" in plan[plan.index("Exchange"):]
    assert "BroadcastNestedLoopJoin" not in plan


def test_approx_percentiles_single_agg_pass(spark, sf_dir):
    """Sketch and exact percentiles compute in ONE grouped aggregation
    (no extra job or join per estimator)."""
    plan = _plan(spark, sf_dir, "approx_percentiles")
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange") <= 2  # one shuffle for the groupBy (+AQE read)


def test_drift_approx_no_sort_no_window(spark, sf_dir):
    """dq_distribution_drift_approx: the whole audit — approx cuts,
    exact flank, binning, PSI folds — is hash aggregations and
    broadcast joins; no Sort, no Window, no nested-loop join anywhere
    (the 100 TB property the approx swap buys)."""
    plan = _plan(spark, sf_dir, "dq_distribution_drift_approx")
    assert "percentile_approx" in plan, plan
    assert "Sort " not in plan and "Sort\n" not in plan, plan
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_full_outer_preaggregates_both_sides(spark, sf_dir):
    """join_full_outer: both sides reach the join pre-aggregated (the
    map-side combine bounds the exchange; full outer cannot
    broadcast) and the join is a hash/merge join, never nested-loop."""
    plan = _plan(spark, sf_dir, "join_full_outer")
    assert "FullOuter" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivf_kmeans_broadcasts_centroids_every_iteration(spark, sf_dir):
    """Every Lloyd iteration scores against a BROADCAST centroid table
    (BNLJ BuildRight Cross, one per crossJoin — the corpus never
    shuffles for assignment), and the centroid update is a partial/
    final hash agg (map-side combine below the exchange). Never a
    corpus×corpus product. Pinned on the raw trainer: the registered
    queries consume it through the session-scoped training memo, whose
    checkpoint truncates the training subtree out of THEIR plans."""
    from deep_field_spark.catalog import spread, table
    from deep_field_spark.queries.similarity import _lloyd_centroids

    emb = spread(table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    plan = (
        _lloyd_centroids(emb, k=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    bnlj = plan.count("BroadcastNestedLoopJoin")
    assert bnlj >= 2, plan  # one broadcast scoring per iteration
    assert plan.count("BuildRight, Cross") == bnlj
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan[plan.index("Exchange"):]


def test_ivf_kmeans_query_serves_from_memoized_centroids(spark, sf_dir):
    """ann_ivf_kmeans (the registered query): the final assignment is
    ONE broadcast scoring pass over the corpus — the training subtree
    sits behind the memo's checkpoint leaf, so the query plan carries
    exactly one BNLJ and no cartesian."""
    plan = _plan(spark, sf_dir, "ann_ivf_kmeans")
    bnlj = plan.count("BroadcastNestedLoopJoin")
    assert bnlj == 1, plan
    assert plan.count("BuildRight, Cross") == bnlj
    assert "CartesianProduct" not in plan


def test_semantic_dedup_pairs_are_cell_equijoin(spark, sf_dir):
    """dedup_semantic: the pairwise cosine stage must be an EQUI-join
    on the cell id (SortMerge/ShuffledHash on cid) — the only
    nested-loop joins are the broadcast centroid scorings."""
    plan = _plan(spark, sf_dir, "dedup_semantic")
    assert "CartesianProduct" not in plan
    bnlj = plan.count("BroadcastNestedLoopJoin")
    assert plan.count("BuildRight, Cross") == bnlj  # all BNLJ = centroids
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_substring_runs_hash_joins_and_bounded_window(spark, sf_dir):
    """dedup_exact_substring_runs: anchor match is an equi-join (hash/
    merge, never nested-loop), the DF cap and island counts are
    partial/final aggs, and the island window is keyed (pair, diag) —
    no partition-less window anywhere."""
    plan = _plan(spark, sf_dir, "dedup_exact_substring_runs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan[plan.index("Exchange"):]
    bad = [
        line
        for line in plan.splitlines()
        if "Window [" in line
        and ("ASC" in line or "DESC" in line)
        and line.count("], [") < 2
    ]
    assert not bad, "\n".join(bad)


def test_span_removal_per_doc_windows_only(spark, sf_dir):
    """dedup_dup_span_removal: the interval-merge windows are keyed by
    doc — no partition-less window, no nested-loop joins, island
    counts partial/final aggregated."""
    plan = _plan(spark, sf_dir, "dedup_dup_span_removal")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan[plan.index("Exchange"):]
    bad = [
        line
        for line in plan.splitlines()
        if "Window [" in line
        and ("ASC" in line or "DESC" in line)
        and line.count("], [") < 2
    ]
    assert not bad, "\n".join(bad)


def test_bm25_broadcast_postings_and_sharded_topk(spark, sf_dir):
    """text_bm25_search: the query-term set, the df table and the
    1-row corpus stats all broadcast onto the postings stream (the
    only BroadcastNestedLoopJoin allowed is the declared 1-row stats
    cross join), and the per-query top-k is the two-stage sharded
    rank — first window keyed (qid, _shard)."""
    import re
    plan = _plan(spark, sf_dir, "text_bm25_search")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "CartesianProduct" not in plan
    wins = [l for l in plan.splitlines() if re.search(r"\bWindow\b", l)]
    assert len(wins) == 2, plan
    assert any("_shard" in w for w in wins), plan


def test_dsir_models_broadcast_back_no_window(spark, sf_dir):
    """curation_dsir_weights: per-(doc,bucket) counts partial-agg
    (HashAggregate below and above the Exchange), the 256-row
    log-ratio model broadcasts back onto the doc stream, and no
    window appears anywhere — the whole op is aggs + broadcast
    joins. The only BroadcastNestedLoopJoin is the 1-row totals
    cross join."""
    import re
    plan = _plan(spark, sf_dir, "curation_dsir_weights")
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "CartesianProduct" not in plan
    assert not re.search(r"\bWindow\b", plan), plan
    assert "HashAggregate" in plan[plan.index("Exchange"):]


def test_scd2_windows_all_keyed_by_user(spark, sf_dir):
    """events_scd2_intervals: every window is keyed by user_id (one
    entity's bounded history per task — never a global or empty
    partitioning), and there are no joins at all: the SCD2 build is
    windows + one grouped agg."""
    import re
    plan = _plan(spark, sf_dir, "events_scd2_intervals")
    wins = [l for l in plan.splitlines() if re.search(r"\bWindow\b", l)]
    assert wins, plan
    assert all("user_id" in w for w in wins), plan
    assert "Join" not in plan, plan


def test_split_leakage_equijoins_and_single_gram_pass(spark, sf_dir):
    """corpus_split_leakage: every join is a hash equi-join on the
    gram/doc_id keys — never a nested loop, never a cartesian (the
    planner picks broadcast vs shuffle from size statistics: the
    fixture-scale test gram set broadcasts, a corpus-scale one flips
    the same plan to SortMergeJoin with no code change) — and the
    gram table is persisted so its three consumers share ONE
    tokenize+explode pass (InMemoryTableScan, not three FileScans of
    documents through the ngram projection)."""
    plan = _plan(spark, sf_dir, "corpus_split_leakage")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("InMemoryTableScan") >= 3, plan


def test_mixture_plan_is_one_agg_plus_broadcast_total(spark, sf_dir):
    """corpus_mixture_plan: token counting rides the scan into one
    partial/final agg (#sources rows); the only other wide node is
    the 1-row total broadcast — no window, no cartesian beyond the
    declared 1-row cross join."""
    import re
    plan = _plan(spark, sf_dir, "corpus_mixture_plan")
    assert not re.search(r"\bWindow\b", plan), plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashAggregate" in plan[plan.index("Exchange"):]


def test_length_buckets_two_aggs_one_broadcast(spark, sf_dir):
    """corpus_length_buckets: the quartile pass and the bucket-stats
    pass are both partial/final aggs; the quartile row broadcasts
    (the only nested-loop allowed); no window anywhere."""
    import re
    plan = _plan(spark, sf_dir, "corpus_length_buckets")
    assert not re.search(r"\bWindow\b", plan), plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashAggregate" in plan[plan.index("Exchange"):]


def test_incremental_minhash_id_only_candidates(spark, sf_dir):
    """dedup_incremental_minhash: the batch⋈corpus-state join is a
    hash equi-join on (band, key) with id-only payload; shingle
    arrays re-join only on candidates; per-batch-doc best-match is a
    doc_id-keyed min(struct) AGGREGATION with map-side partial combine
    (the row_number Window it replaced shipped every candidate pair to
    one task per doc — Exchange+Sort+Window, zero partial reduction);
    no window, no nested loop, no cartesian."""
    import re
    plan = _plan(spark, sf_dir, "dedup_incremental_minhash")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert not re.search(r"\bWindow\b", plan), plan
    best = [
        l
        for l in plan.splitlines()
        if "Aggregate" in l and "min(" in l and "doc_id" in l
    ]
    assert best, plan
    # partial (map-side) half of the best-match agg must exist too
    assert any("partial_min" in l or "partial min" in l for l in plan.splitlines()), plan


def test_bpe_train_rounds_are_aggs_plus_broadcast(spark, sf_dir):
    """text_bpe_train: the merge rounds checkpoint per round (severed
    loop — the final plan is a union of winner checkpoint scans, no
    nested round subtrees). Each ROUND is a pair-count partial/final
    agg feeding a 1-row TakeOrdered winner broadcast back onto the
    corpus recode — pinned by rebuilding one round (the pagerank-test
    convention for severed loops)."""
    import re

    from pyspark.sql import functions as F

    from deep_field_spark.queries.text import (
        _bpe_corpus_strings,
        _bpe_recode,
    )

    plan = _plan(spark, sf_dir, "text_bpe_train")
    assert not re.search(r"\bWindow\b", plan), plan
    assert "CartesianProduct" not in plan, plan
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan, plan

    s = _bpe_corpus_strings(spark, sf_dir).select("s")
    w = F.split(F.trim("s"), " ")
    pairs = s.select(
        F.explode(
            F.when(
                F.size(w) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - 1),
                    lambda j: F.concat(
                        F.element_at(w, j), F.lit(" "), F.element_at(w, j + 1)
                    ),
                ),
            )
        ).alias("pair")
    )
    m = (
        pairs.groupBy("pair").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair")).limit(1)
    )
    rec = s.crossJoin(F.broadcast(m)).select(_bpe_recode(F.col("s")).alias("s"))
    round_plan = rec._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in round_plan, round_plan
    bnlj = [l for l in round_plan.splitlines() if "BroadcastNestedLoopJoin" in l]
    assert bnlj and all("BuildRight" in l for l in bnlj), round_plan
    assert "HashAggregate" in round_plan and "partial" in round_plan, round_plan


def test_bpe_apply_is_broadcast_recode_no_shuffle_on_apply(spark, sf_dir):
    """text_bpe_apply: the apply side is a chain of 1-row broadcast
    literal replaces over the per-doc strings — the only wide stages
    are the tiny training aggs and the final doc_id join; no window,
    no cartesian, every nested-loop a BuildRight 1-row broadcast."""
    import re
    plan = _plan(spark, sf_dir, "text_bpe_apply")
    assert not re.search(r"\bWindow\b", plan), plan
    assert "CartesianProduct" not in plan, plan
    bnlj = [l for l in plan.splitlines() if "BroadcastNestedLoopJoin" in l]
    assert bnlj and all("BuildRight" in l for l in bnlj), plan


def test_dedup_report_hash_joins_and_source_rollup(spark, sf_dir):
    """curation_dedup_report: digest/keeper/flag joins are hash
    equi-joins, the near-dup side rides the components loop (already
    pinned), and the rollup is a partial/final agg to #sources rows.
    No cartesian, no nested loop."""
    plan = _plan(spark, sf_dir, "curation_dedup_report")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashAggregate" in plan[plan.index("Exchange"):]


def test_resolve_plays_never_forces_pergame_broadcast(spark):
    """resolve_plays (scraping/pipeline.py): the effective-name probe
    `k` and the name->ids multimap `m` are keyed by game_name_id and
    grow linearly with games scraped (~40 rows/game; a full-history
    backfill is ~10M rows) — they must NOT carry a forced broadcast
    hint. With autoBroadcastJoinThreshold=-1 every size-based
    broadcast disappears and only hints survive, so the plan may
    contain at most the one deliberate hint: the bounded players_dim
    dimension join. The four k/m joins must plan as shuffle joins."""
    import deep_field_spark.scraping.pipeline as P

    game = {
        "rosters": [
            {"side": s, "pos": i, "name_raw": f"P{i}{s}", "name_id": f"id{i}{s}"}
            for s in ("home", "away") for i in range(3)
        ],
        "plays": [
            {"play_num": i, "inning": "t1", "outs": "0", "pitches": "",
             "desc": "d", "runners": "---", "batter": "P0away",
             "pitcher": "P0home"}
            for i in range(4)
        ],
    }
    parsed = spark.createDataFrame(
        [("G000000000", None, game["rosters"], game["plays"], None)],
        P.GAME_PARSED_SCHEMA,
    )
    players = P.mock_players_from_games(parsed)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            P.resolve_plays(parsed, players)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # the 4 per-game-keyed k/m probe joins must be shuffle equi-joins
    # at -1 threshold; any BroadcastHashJoin on the (game, side, name)
    # composite keys means a forced hint crept back in. Remaining
    # broadcasts are the bounded players_dim / dense_ids dims only.
    n_shuffle_joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert n_shuffle_joins >= 4, plan
    for line in plan.splitlines():
        if "BroadcastHashJoin" in line:
            assert "_k_game" not in line and "_m_game" not in line, line
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pagerank_rounds_are_hash_aggs_no_cartesian(spark, sf_dir):
    """graph_pagerank: each round is a message-passing hash agg over
    equi-joins; the only nested-loops are the declared 1-row N
    broadcasts (teleport term). The query checkpoints per round (flat
    lineage), so the final plan shows checkpoint scans — the ROUND
    shape is pinned by rebuilding one round over the same edge list."""
    from pyspark.sql import functions as F

    from deep_field_spark.catalog import table as T
    from deep_field_spark.queries.graph import SUPP_OFFSET

    plan = _plan(spark, sf_dir, "graph_pagerank")
    assert "CartesianProduct" not in plan, plan
    bnlj = [l for l in plan.splitlines() if "BroadcastNestedLoopJoin" in l]
    assert all("BuildRight" in l for l in bnlj), plan

    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = e0.select(
        F.col("c").alias("src"), (F.lit(SUPP_OFFSET) + F.col("s")).alias("dst")
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = deg.select(F.col("src").alias("node"), F.lit(0.001).alias("rank"))
    msg = (
        edges.join(ranks, edges.src == F.col("node"))
        .join(deg, "src")
        .select("dst", (F.col("rank") / F.col("deg")).alias("contrib"))
    )
    round_plan = (
        msg.groupBy("dst")
        .agg(F.sum(F.col("contrib").cast("decimal(38,18)")).alias("s"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in round_plan, round_plan
    assert "HashAggregate" in round_plan[round_plan.index("Exchange"):]


def test_quality_train_rounds_broadcast_weights(spark, sf_dir):
    """curation_quality_train: the weight state checkpoints per round
    (flat lineage — the final plan shows a checkpoint scan, not nested
    round subtrees), and each ROUND broadcasts the 1-row weight vector
    onto the feature scan with a partial/final gradient agg — pinned by
    rebuilding one round over a feature-shaped frame (the pagerank-test
    convention for severed loops)."""
    import re

    from pyspark.sql import functions as F

    plan = _plan(spark, sf_dir, "curation_quality_train")
    assert not re.search(r"\bWindow\b", plan), plan
    assert "CartesianProduct" not in plan, plan
    # severed loop: no per-round gradient aggregates survive in the
    # final plan (they ran eagerly at checkpoint time)
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan, plan

    f = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("double").alias("y"),
        F.lit(1.0).alias("x0"),
        (F.col("id") * 0.01).alias("x1"),
    )
    w = spark.range(1).select(F.lit(0.0).alias("w0"), F.lit(0.0).alias("w1"))
    scored = f.crossJoin(F.broadcast(w))
    z = F.col("w0") * F.col("x0") + F.col("w1") * F.col("x1")
    e = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("y")
    g = scored.agg(
        *[
            (F.sum((e * F.col(f"x{j}")).cast("decimal(28,9)")).cast("double")
             / F.count("*")).alias(f"g{j}")
            for j in range(2)
        ]
    )
    round_plan = g._jdf.queryExecution().executedPlan().toString()
    bnlj = [l for l in round_plan.splitlines() if "BroadcastNestedLoopJoin" in l]
    assert bnlj and all("BuildRight" in l for l in bnlj), round_plan
    assert "HashAggregate" in round_plan and "partial" in round_plan, round_plan


def test_pq_codes_codebook_broadcast_no_cartesian(spark, sf_dir):
    """embedding_pq_codes: the per-subspace codebook (M*K rows) joins
    as a broadcast equi-join on sub; assignment windows are keyed by
    (vec_id, sub); no cartesian, no nested loop."""
    plan = _plan(spark, sf_dir, "embedding_pq_codes")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_decontam_embedding_no_cross_product(spark, sf_dir):
    """decontam_embedding: the train-test comparison rides LSH bucket
    equi-joins + candidate verify — never a train x test product."""
    plan = _plan(spark, sf_dir, "decontam_embedding")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_containment_no_cross_product(spark, sf_dir):
    """dedup_containment: candidates via band-key equi-joins, verify
    joins on ids; never a doc x doc product. Anchor selection is a
    per-row HOF over the persisted shingle arrays (no Window — it
    replaced an Exchange+Sort over corpus-scale exploded rows); the
    best-container pick is the ONLY window, keyed by doc_id
    (candidate-bounded partitions; the min(struct) aggregation
    alternative compiles to SortAggregate whose codegen pays seconds
    of cold JIT, measured — see the query's tail comment)."""
    import re
    plan = _plan(spark, sf_dir, "dedup_containment")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    wins = [l for l in plan.splitlines() if re.search(r"\bWindow\b", l)]
    assert wins, plan
    for w in wins:
        assert "doc_id" in w, plan


def test_gapfill_window_is_user_keyed(spark, sf_dir):
    """events_resample_gapfill: the forward-fill window must be keyed
    by user_id (bounded per-task state), and the grid join an
    equi-join."""
    import re
    plan = _plan(spark, sf_dir, "events_resample_gapfill")
    assert "CartesianProduct" not in plan, plan
    wins = [l for l in plan.splitlines() if re.search(r"\bWindow\b", l)]
    assert wins, plan
    for w in wins:
        assert "user_id" in w, w


def test_countmin_sketch_is_partial_final_agg(spark, sf_dir):
    """text_countmin_freq: the sketch build must map-side combine (the
    whole point of a mergeable sketch) and the top-N candidates come
    from TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, sf_dir, "text_countmin_freq")
    assert "HashAggregate" in plan[plan.index("Exchange"):]
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q18_semi_join_and_take_ordered(spark, sf_dir):
    """q18: the qualifying-key set semi-joins orders, and the global
    top-100 is TakeOrderedAndProject, never a full sort."""
    plan = _plan(spark, sf_dir, "q18_large_volume_customer")
    assert "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan
    assert "HashAggregate" in plan[plan.index("Exchange"):]


def test_q21_self_joins_are_semi_anti_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q21_waiting_supplier")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q4_exists_is_semi_join_with_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q4_order_priority")
    assert "LeftSemi" in plan
    assert "PushedFilters: [" in plan
    assert "CartesianProduct" not in plan


def test_profile_is_one_scan_one_agg(spark, sf_dir):
    """table_profile_lineitem: all per-column stats fold into a single
    partial/final agg over ONE scan — never a scan per column."""
    plan = _plan(spark, sf_dir, "table_profile_lineitem")
    assert plan.count("Scan parquet") + plan.count("FileScan") <= 2, plan
    assert "HashAggregate" in plan[plan.index("Exchange"):]


def test_dq_audit_legs_are_anti_joins(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dq_referential_audit")
    assert plan.count("LeftAnti") >= 4, plan
    assert "CartesianProduct" not in plan


def test_bloom_prune_filters_fact_before_equi_join(spark, sf_dir):
    """join_bloom_pruned: the packed bitset rides a broadcast (one
    aggregated row — BroadcastNestedLoopJoin is the correct physical
    op for a join with no keys), the O(1) word-lookup prune
    (element_at + shiftleft mask — NOT the old array_contains linear
    scan, whose per-row cost grew with dim NDV) sits between the fact
    scan and the exact equi-join, and the repair join itself
    broadcasts the dim (never the fact)."""
    plan = _plan(spark, sf_dir, "join_bloom_pruned")
    assert "element_at" in plan and "shiftleft" in plan
    assert "array_contains" not in plan  # the linear-scan form is gone
    assert "BroadcastHashJoin" in plan  # the exact repair join
    assert "CartesianProduct" not in plan
    # the prune (bitset filter) must appear BELOW the repair join in
    # the tree — i.e. after its first mention in printed order
    assert "element_at" in plan[plan.index("BroadcastHashJoin"):]


def test_q13_outer_join_keeps_zero_count_customers(spark, sf_dir):
    """Q13: filter must live in the join condition, not a post-filter —
    the plan shows a left-outer (or shuffled equivalent) join and two
    separate aggregates (per-customer count, then histogram)."""
    plan = _plan(spark, sf_dir, "q13_customer_distribution")
    assert "LeftOuter" in plan
    assert plan.count("HashAggregate") >= 4  # 2 aggs x partial/final
    assert "CartesianProduct" not in plan


def test_perplexity_buckets_windows_are_source_keyed(spark, sf_dir):
    """corpus_perplexity_buckets: every ordered window is partitioned
    by source — no global sort of the document stream."""
    plan = _plan(spark, sf_dir, "corpus_perplexity_buckets")
    for line in plan.splitlines():
        if "Window [" in line and ("ASC" in line or "DESC" in line):
            assert "source" in line, line


def test_stratified_quota_selection_window_is_source_keyed(spark, sf_dir):
    """corpus_stratified_quota: the per-document selection window is
    partitioned by source; the only unpartitioned ordered window ranks
    the |sources|-row quota aggregate (declared lint exception); the
    quota table is broadcast back onto the stream."""
    plan = _plan(spark, sf_dir, "corpus_stratified_quota")
    unpartitioned = [
        line
        for line in plan.splitlines()
        if "Window [" in line
        and ("ASC" in line or "DESC" in line)
        and "source" not in line
    ]
    # the seat-assignment window ranks rem/source — both appear in the
    # spec, so lines without 'source' must be none
    assert not unpartitioned, unpartitioned
    assert "BroadcastHashJoin" in plan


def test_rrf_fusion_windows_are_query_keyed(spark, sf_dir):
    """retrieval_rrf_fusion: every ordered window partitions by qid;
    the only nested-loop join is the query-bounded broadcast of the
    semantic leg's query set (declared: |Q| rows)."""
    plan = _plan(spark, sf_dir, "retrieval_rrf_fusion")
    for line in plan.splitlines():
        if "Window [" in line and ("ASC" in line or "DESC" in line):
            assert "qid" in line, line
    assert "CartesianProduct" not in plan


def test_tfidf_allpairs_prunes_before_verify(spark, sf_dir):
    """dedup_tfidf_allpairs: hash joins only (no cartesian / nested
    loop on the pair path), and the suffix-bound window is doc-keyed."""
    plan = _plan(spark, sf_dir, "dedup_tfidf_allpairs")
    assert "CartesianProduct" not in plan
    # nested-loop joins may appear only as the 1-row corpus-count
    # scalar riding a broadcast Cross into the idf expression (the
    # cached wn subtree is printed once per reference, so the line
    # repeats) — never as a conditional join on the pair path
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert ", Cross" in line, line
    for line in plan.splitlines():
        if "Window [" in line and ("ASC" in line or "DESC" in line):
            assert "doc_id" in line, line


def test_q7_broadcast_dims_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q7_volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q10_top20_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q10_returned_items")
    assert "TakeOrderedAndProject" in plan
    # selective scans: returnflag reaches the lineitem scan
    assert "EqualTo(l_returnflag,R)" in plan


def test_q17_decorrelates_to_agg_join(spark, sf_dir):
    """The per-part average is ONE aggregate joined back on the part
    key — not a per-row subquery (no nested-loop anywhere)."""
    plan = _plan(spark, sf_dir, "q17_small_quantity")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # per-part avg + final sum


def test_q19_or_clauses_push_implied_filters(spark, sf_dir):
    """Constraint propagation over OR: the per-side implications
    (p_brand IN ..., quantity bound) must reach the scans as
    PushedFilters, not evaluate only post-join."""
    plan = _plan(spark, sf_dir, "q19_disjunctive_predicates")
    scan = plan[plan.index("PushedFilters"):]
    assert "Brand#12" in scan  # the brand disjunction reached a scan
    li_scans = [s for s in plan.split("PushedFilters: ")[1:] if "l_quantity" in s.split("]")[0]]
    assert li_scans, "quantity bound did not reach the lineitem scan"


def test_q15_argmax_join_is_exact_decimal(spark, sf_dir):
    """Q15: the max-revenue equality join must be on the DECIMAL
    aggregate (float noise would split argmax ties); supplier side
    broadcasts; no nested loop beyond the 1-row max broadcast."""
    plan = _plan(spark, sf_dir, "q15_top_supplier")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_q22_anti_join_and_scalar_threshold(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q22_dormant_customers")
    assert "LeftAnti" in plan
    # the avg threshold is a 1-row broadcast Cross, never per-row
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert ", Cross" in line, line

def test_q6_pure_pushdown_scan_agg(spark, sf_dir):
    """Q6 is the canonical pushdown probe: every predicate reaches the
    parquet scan, the plan has no join, and the only exchange is the
    1-row partial->final aggregate."""
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    assert "Join" not in plan and "CartesianProduct" not in plan
    scans = plan.split("PushedFilters: ")[1:]
    assert scans, "no pushed filters at all"
    # executedPlan().toString() truncates long filter lists — assert on
    # the prefix that survives truncation (all three columns appear in
    # the leading IsNotNull trio, proving they reached the scan).
    pushed = scans[0].split("]")[0]
    assert "IsNotNull(l_shipdate)" in pushed
    assert "IsNotNull(l_discount)" in pushed
    assert "IsNotNull(l_quantity)" in pushed
    assert plan.count("Exchange") == 1  # single-partition final agg only


def test_q8_widest_join_all_dims_broadcast(spark, sf_dir):
    """Q8's 7-table join: the one-type part probe, supplier, customer
    and both nation roles all broadcast — only the lineitem<->orders
    fact-fact join may shuffle; no cartesian anywhere; the type filter
    reaches the part scan."""
    plan = _plan(spark, sf_dir, "q8_market_share")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 5
    assert "EqualTo(p_type,ECONOMY)" in plan


def test_perplexity_approx_has_no_sort_anywhere(spark, sf_dir):
    """corpus_perplexity_buckets_approx is the declared 100 TB swap for
    the rank-window twin: cutpoints come from the GK sketch, so the
    plan must contain NO Sort and NO Window at all — hash/object
    aggregations and broadcast joins only."""
    plan = _plan(spark, sf_dir, "corpus_perplexity_buckets_approx")
    assert "Sort " not in plan and "Sort[" not in plan, plan
    assert "Window" not in plan, plan
    assert "ObjectHashAggregate" in plan  # the percentile_approx sketch
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize(
    "name", ["multimodal_audio_rms", "multimodal_video_luma"]
)
def test_real_decode_rows_are_arrow_batched_map_in_pandas(spark, sf_dir, name):
    """The codec-free decode trio runs inside ONE Arrow-batched
    MapInPandas stage — never row-at-a-time Python — and the feature
    math after it is plain column algebra (no second Python stage)."""
    plan = _plan(spark, sf_dir, name)
    assert plan.count("MapInPandas") == 1, plan
    assert "BatchEvalPython" not in plan  # row-at-a-time worker


def test_weighted_sample_is_two_stage_sharded_topk(spark, sf_dir):
    """corpus_weighted_sample must keep the sharded top-k shape: a
    per-(source, shard) pre-rank window plus the per-source merge
    window — exactly two Windows, both partitioned — so no source ever
    streams through one task at full width."""
    plan = _plan(spark, sf_dir, "corpus_weighted_sample")
    assert plan.count("Window [") == 2, plan
    assert "CartesianProduct" not in plan


def test_hard_negatives_candidates_are_bucket_equijoin(spark, sf_dir):
    """embedding_hard_negatives: candidates come from the LSH bucket
    equi-join — no cartesian, no nested-loop; one (anchor, role)
    window ranks both lists."""
    plan = _plan(spark, sf_dir, "embedding_hard_negatives")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window [") == 1, plan


def test_perplexity_twins_agree_on_thirds_counts(spark, sf_dir):
    """Cross-check the approx bucketing against its exact rank twin:
    per (source, bucket) doc counts must match EXACTLY — the approx
    query's n_docs is integer thirds arithmetic, and the exact twin's
    rank split realizes the same thirds."""
    exact = {
        (r.source, r.bucket): r.n_docs
        for r in REGISTRY["corpus_perplexity_buckets"].fn(spark, sf_dir).collect()
    }
    approx = {
        (r.source, r.bucket): r.n_docs
        for r in REGISTRY["corpus_perplexity_buckets_approx"].fn(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    assert exact == approx


def test_ivfpq_serves_from_bucketed_codes_no_full_scan(spark, sf_dir):
    """ann_ivfpq_search: the persisted serving table is read ONCE, the
    probe join on cid is served by the bucket layout (no Exchange
    directly above the cells scan), and the scan carries integer codes
    — never a vector column. With the single probe-joined scan the ADC
    aggregate can only see probed-cell rows: the full-code-scan path
    of ann_pq_adc_search structurally cannot exist in this plan.
    autoBroadcastJoinThreshold is disabled so the pin sees the
    at-scale join strategy — at test SF, AQE (correctly) broadcasts
    the small cells side instead, which a 100 TB cell table never is."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(spark, sf_dir, "ann_ivfpq_search")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    lines = plan.splitlines()
    scans = [
        i for i, l in enumerate(lines)
        if "FileScan" in l and "ivfpq_" in l and "_cells" in l
    ]
    assert len(scans) == 1, plan
    above = "\n".join(lines[max(0, scans[0] - 2): scans[0]])
    assert "Exchange" not in above, plan
    assert "Bucketed: true" in lines[scans[0]] or "SelectedBucketsCount" in plan
    assert "codes" in lines[scans[0]], plan
    assert "embedding" not in lines[scans[0]], plan


def test_ivfpq_incremental_serves_post_compaction_exchange_free(
    spark, sf_dir
):
    """ann_ivfpq_incremental: after build + frozen-codebook ingest +
    compact(), the serve leg still reads the cell table ONCE with the
    cid probe join served by the (rewritten) bucket layout — the
    compaction preserved the exchange-free contract on the exact table
    the driver-evidenced query serves from."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(spark, sf_dir, "ann_ivfpq_incremental")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    lines = plan.splitlines()
    scans = [
        i for i, l in enumerate(lines)
        if "FileScan" in l and "ivfpqi_" in l and "_cells" in l
    ]
    assert len(scans) == 1, plan
    above = "\n".join(lines[max(0, scans[0] - 2): scans[0]])
    assert "Exchange" not in above, plan
    assert "Bucketed: true" in lines[scans[0]] or "SelectedBucketsCount" in plan
    assert "codes" in lines[scans[0]], plan
    assert "embedding" not in lines[scans[0]], plan


def test_filtered_ann_pushes_predicate_into_cell_scan(spark, sf_dir):
    """ann_ivf_filtered: the metadata predicate must reach the parquet
    scan of the probed cell table (PushedFilters EqualTo on label) —
    candidates are pruned by the storage layer, not post-filtered —
    and the cid probe join stays exchange-free on the corpus side."""
    from deep_field_spark.queries.similarity import IVF_FILT_LABEL

    plan = _plan(spark, sf_dir, "ann_ivf_filtered")
    lines = plan.splitlines()
    scans = [
        i for i, l in enumerate(lines)
        if "FileScan" in l and "ivff_" in l and "_cells" in l
    ]
    assert len(scans) == 1, plan
    assert f"EqualTo(label,{IVF_FILT_LABEL})" in lines[scans[0]], plan
    above = "\n".join(lines[max(0, scans[0] - 2): scans[0]])
    assert "Exchange" not in above, plan


@pytest.mark.parametrize(
    "name", ["ann_ivf_recall", "ann_filtered_recall", "ann_ivfpq_recall"]
)
def test_calibration_query_sample_is_take_ordered(spark, sf_dir, name):
    """Every calibration chart's md5 query sample must plan as
    TakeOrderedAndProject (per-partition heap), never a global Sort —
    the in-code bound that keeps the brute-truth legs at IVF_CAL_Q
    linear scans at any corpus size."""
    plan = _plan(spark, sf_dir, name)
    assert "TakeOrderedAndProject" in plan, plan
