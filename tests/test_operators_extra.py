"""Targeted operator tests: DF-capped inverted index, fetch rate
limiter timing, streaming file-sink (production topology)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from deep_field_spark.catalog import table
from deep_field_spark.operators import dedup as D
from deep_field_spark.scraping import cache as C


def test_ngram_jaccard_df_cap_recall(spark, sf_dir):
    """With a generous cap the capped path returns exactly the exact
    path's pairs (the cap only prunes corpus-hot shingles)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        (r.id_a, r.id_b, r.jaccard)
        for r in D.ngram_jaccard_pairs(docs, "text", "doc_id", 3, 0.3).collect()
    }
    capped = {
        (r.id_a, r.id_b, r.jaccard)
        for r in D.ngram_jaccard_pairs(
            docs, "text", "doc_id", 3, 0.3, max_df=1000
        ).collect()
    }
    assert capped == exact
    # an aggressive cap may only lose pairs, never invent or mis-score
    tight = {
        (r.id_a, r.id_b, r.jaccard)
        for r in D.ngram_jaccard_pairs(
            docs, "text", "doc_id", 3, 0.3, max_df=2
        ).collect()
    }
    assert tight <= exact


def test_fetch_rate_limiter_enforces_delay(spark):
    frontier = spark.createDataFrame(
        [(f"https://x/p{i:011d}.shtml", f"p{i:011d}ab", "PlayerPage", True)
         for i in range(4)],
        "url string, name_id string, page_type string, is_cachable boolean",
    )
    t0 = time.monotonic()
    out = C.fetch_pages(frontier, lambda url: "<html/>", delay=0.3)
    rows = out.collect()
    elapsed = time.monotonic() - t0
    assert len(rows) == 4 and all(r.error is None for r in rows)
    # 4 fetches, 3 enforced gaps of 0.3 s (global: single partition)
    assert elapsed >= 0.9, elapsed


def test_streaming_file_sink_append(spark, sf_dir, tmp_path):
    """The production streaming topology: watermark + append mode into
    a parquet file sink with a checkpoint — not the memory harness.
    Append mode only emits windows the watermark has closed, so the
    tail windows of the bounded input are withheld (correct streaming
    semantics, asserted as a subset of the batch result)."""
    from deep_field_spark.streaming.windows import events_stream

    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("wstart"), "event_type", "n")
    )
    out_dir = str(tmp_path / "out")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.wstart, r.event_type, r.n)
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        (r.wstart, r.event_type, r.n)
        for r in (
            table(spark, sf_dir, "events")
            .select(F.col("ts").cast("timestamp_ltz").alias("ts"), "event_type")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(F.col("window.start").alias("wstart"), "event_type", "n")
            .collect()
        )
    }
    assert got, "file sink produced no closed windows"
    assert got <= batch
    # everything strictly before the final watermark must have emitted
    assert len(got) >= len(batch) - 10 * 2  # last hour windows x types margin
    assert os.path.isdir(out_dir)


class TestConnectedComponents:
    def test_chain_and_islands(self, spark):
        from deep_field_spark.operators.components import connected_components

        # chain 1-2-3-4 (diameter 3, needs >1 round), island {10,11},
        # and a triangle {20,21,22} with a redundant edge
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
            "id_a long, id_b long",
        )
        got = {(r.v, r.comp) for r in connected_components(pairs).collect()}
        assert got == {
            (1, 1), (2, 1), (3, 1), (4, 1),
            (10, 10), (11, 10),
            (20, 20), (21, 20), (22, 20),
        }

    def test_long_path_converges(self, spark):
        from deep_field_spark.operators.components import connected_components

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(30)], "id_a long, id_b long"
        )
        comp = connected_components(pairs)
        assert comp.select("comp").distinct().count() == 1
        assert comp.count() == 31


class TestDenseIds:
    """operators/ids.py — the hash-bucketed surrogate-id assigner that
    replaced every global Window.orderBy in the star build."""

    def _ids(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "k string, v int")
        from deep_field_spark.operators.ids import dense_ids

        return dense_ids(df, ["k"], **kw)

    def test_dense_and_unique_above_base(self, spark):
        rows = [(f"k{i:03d}", i) for i in range(257)]  # > default bucket fill
        out = self._ids(spark, rows, base=100).collect()
        ids = sorted(r.id for r in out)
        assert ids == list(range(101, 101 + 257))

    def test_deterministic_across_partitionings(self, spark):
        """Same input in any partitioning → identical id per key (the
        idempotent-resume contract)."""
        rows = [(f"k{i:03d}", i) for i in range(100)]
        import random

        shuffled = rows[:]
        random.Random(7).shuffle(shuffled)
        from deep_field_spark.operators.ids import dense_ids

        a = {
            r.k: r.id
            for r in dense_ids(
                spark.createDataFrame(rows, "k string, v int").repartition(1), ["k"]
            ).collect()
        }
        b = {
            r.k: r.id
            for r in dense_ids(
                spark.createDataFrame(shuffled, "k string, v int").repartition(13),
                ["k"],
            ).collect()
        }
        assert a == b

    def test_bucket_cols_keep_groups_contiguous(self, spark):
        """bucket_cols=[group] + order (group, seq): each group's ids
        are consecutive (the play-fact id contiguity property)."""
        rows = [(g, s) for g in ("g1", "g2", "g3") for s in range(10)]
        df = spark.createDataFrame(rows, "g string, s int")
        from deep_field_spark.operators.ids import dense_ids

        out = dense_ids(df, ["g", "s"], bucket_cols=["g"]).collect()
        ids = sorted(r.id for r in out)
        assert ids == list(range(1, 31))
        by_g = {}
        for r in out:
            by_g.setdefault(r.g, []).append(r.id)
        for g, gids in by_g.items():
            gids.sort()
            assert gids == list(range(gids[0], gids[0] + 10)), g

    def test_in_plan_base_dataframe(self, spark):
        from deep_field_spark.operators.ids import dense_ids, max_id_base

        existing = spark.createDataFrame([(5,), (42,)], "id long")
        df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
        out = dense_ids(df, ["k"], base=max_id_base(existing)).collect()
        assert sorted(r.id for r in out) == [43, 44]

    def test_bucket_expr_total_order(self, spark):
        """bucket_expr = monotone prefix of the order key → ids are the
        GLOBAL key order (the corpus_shuffle_assign contract), with no
        partition-less window in the plan."""
        import hashlib

        from pyspark.sql import functions as F

        from deep_field_spark.operators.ids import dense_ids

        rows = [(i,) for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long").withColumn(
            "h", F.md5(F.col("doc_id").cast("string"))
        )
        hexb = F.conv(F.substring("h", 1, 2), 16, 10).cast("int")
        out = dense_ids(df, ["h"], bucket_expr=hexb).collect()
        got = [r.doc_id for r in sorted(out, key=lambda r: r.id)]
        want = sorted(
            range(300), key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
        )
        assert got == want
        plan = (
            dense_ids(df, ["h"], bucket_expr=hexb)
            ._jdf.queryExecution().executedPlan().toString()
        )
        bad = [
            line
            for line in plan.splitlines()
            if "Window [" in line
            and ("ASC" in line or "DESC" in line)
            and line.count("], [") < 2
        ]
        assert not bad, "\n".join(bad)

    def test_property_dense_unique_any_input(self, spark):
        """Property: for arbitrary unique key sets and bucket counts
        (including the degenerate n_buckets=1), ids are exactly
        1..N in some order and stable across a re-run."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from deep_field_spark.operators.ids import dense_ids

        @settings(
            max_examples=8,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(
            keys=st.lists(
                st.text(
                    alphabet="abcdefghij0123456789", min_size=1, max_size=8
                ),
                min_size=1,
                max_size=40,
                unique=True,
            ),
            n_buckets=st.sampled_from([1, 2, 7, 1024]),
        )
        def prop(keys, n_buckets):
            df = spark.createDataFrame([(k,) for k in keys], "k string")
            out = {
                r.k: r.id
                for r in dense_ids(df, ["k"], n_buckets=n_buckets).collect()
            }
            assert sorted(out.values()) == list(range(1, len(keys) + 1))
            again = {
                r.k: r.id
                for r in dense_ids(
                    df.repartition(3), ["k"], n_buckets=n_buckets
                ).collect()
            }
            assert out == again

        prop()


class TestTopKSharded:
    """operators/topk.py — the two-stage sharded per-group top-k that
    replaced every one-window per-group rank on an unbounded group
    (curation_boilerplate_ngrams, corpus_group_sample)."""

    def test_property_matches_one_window_form(self, spark):
        """Property: for arbitrary group layouts, heavy ties in the
        order column, any k and any shard count (incl. the degenerate
        shards=1), the sharded result is IDENTICAL to the plain
        one-window top_k_per_group — same rows, same ranks — and
        stable under repartitioning."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from deep_field_spark.operators.topk import (
            top_k_per_group,
            top_k_per_group_sharded,
        )

        @settings(
            max_examples=8,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(
            rows=st.lists(
                st.tuples(
                    st.sampled_from(["g1", "g2", "g3", "hot"]),
                    st.integers(min_value=0, max_value=3),  # heavy ties
                ),
                min_size=1,
                max_size=60,
            ),
            k=st.sampled_from([1, 2, 5]),
            shards=st.sampled_from([1, 2, 16]),
        )
        def prop(rows, k, shards):
            data = [(g, v, i) for i, (g, v) in enumerate(rows)]
            df = spark.createDataFrame(data, "g string, v int, id int")
            order = [F.desc("v"), F.asc("id")]
            want = {
                (r.g, r.v, r.id, r.rn)
                for r in top_k_per_group(df, ["g"], order, k).collect()
            }
            got = {
                (r.g, r.v, r.id, r.rn)
                for r in top_k_per_group_sharded(
                    df, ["g"], order, k, shard_of="id", shards=shards
                ).collect()
            }
            assert got == want
            again = {
                (r.g, r.v, r.id, r.rn)
                for r in top_k_per_group_sharded(
                    df.repartition(5), ["g"], order, k,
                    shard_of="id", shards=shards,
                ).collect()
            }
            assert again == want

        prop()


class TestLloydCentroids:
    """queries/similarity.py:_lloyd_centroids — the distributed k-means
    trainer behind ann_ivf_kmeans / dedup_semantic."""

    def test_deterministic_across_partitionings(self, spark, sf_dir):
        """Same corpus in any partitioning → bit-identical centroids
        (the DECIMAL-exact component sums make partial-agg order
        irrelevant — the property the oracle replay depends on)."""
        from deep_field_spark.queries.similarity import (
            N_CELLS,
            _lloyd_centroids,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        a = {
            r.cid: tuple(r.c_emb)
            for r in _lloyd_centroids(emb.repartition(1), k=N_CELLS).collect()
        }
        b = {
            r.cid: tuple(r.c_emb)
            for r in _lloyd_centroids(emb.repartition(13), k=N_CELLS).collect()
        }
        assert a == b
        assert len(a) > 0

    def test_one_iteration_moves_centroids(self, spark, sf_dir):
        """Lloyd's must actually update: iteration-1 centroids differ
        from the init vectors (else the 'training' is a no-op and
        ann_ivf_kmeans degenerates to ann_ivf_cells)."""
        from deep_field_spark.queries.similarity import (
            N_CELLS,
            _lloyd_centroids,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        init = {
            r.vec_id: tuple(float(x) for x in r.embedding)
            for r in emb.filter(f"vec_id < {N_CELLS}").collect()
        }
        trained = {
            r.cid: tuple(r.c_emb)
            for r in _lloyd_centroids(emb, iters=1, k=N_CELLS).collect()
        }
        moved = [cid for cid in trained if trained[cid] != init[cid]]
        assert moved, "no centroid moved after one Lloyd iteration"


class TestAnchorRuns:
    """queries/dedup.py:anchor_islands_of — the diagonal-run primitive
    behind dedup_exact_substring_runs / dedup_dup_span_removal."""

    def test_property_longest_run_equals_brute_force(self, spark):
        """Property: with the DF cap disabled, max island run + k - 1
        per pair equals the brute-force longest common token substring
        (when ≥ k) over adversarial small-alphabet docs."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from deep_field_spark.queries.dedup import anchor_islands_of

        K = 3

        def lcs_tokens(a, b):
            best = 0
            for i in range(len(a)):
                for j in range(len(b)):
                    n = 0
                    while i + n < len(a) and j + n < len(b) and a[i + n] == b[j + n]:
                        n += 1
                    best = max(best, n)
            return best

        @settings(
            max_examples=6,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(
            docs=st.lists(
                st.lists(
                    st.sampled_from(["a", "b", "c"]),  # tiny alphabet →
                    min_size=K, max_size=25,           # collisions galore
                ),
                min_size=2,
                max_size=4,
            )
        )
        def prop(docs):
            df = spark.createDataFrame(
                [(i, " ".join(toks)) for i, toks in enumerate(docs)],
                "doc_id long, text string",
            )
            got = {
                (r.id_a, r.id_b): r.n + K - 1
                for r in (
                    anchor_islands_of(df, k=K, max_df=10**9)
                    .groupBy("id_a", "id_b")
                    .agg(F.max("n").alias("n"))
                    .collect()
                )
            }
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    want = lcs_tokens(docs[i], docs[j])
                    if want >= K:
                        assert got.get((i, j)) == want, (i, j, want, got)
                    else:
                        assert (i, j) not in got

        prop()


class TestMisraGries:
    """queries/text.py:_mg_candidates — the per-partition mergeable MG
    sketch behind text_heavy_hitters. Pure-pandas test (no Spark): the
    candidate set must be a SUPERSET of every true heavy hitter for
    arbitrary streams and arbitrary batch splits — the guarantee the
    2-pass exactness proof rests on."""

    def test_property_candidates_superset_of_heavy_hitters(self):
        from collections import Counter

        import pandas as pd
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from deep_field_spark.queries.text import HH_CAPACITY, _mg_candidates

        @settings(max_examples=200, deadline=None)
        @given(
            stream=st.lists(
                # zipf-ish: small alphabet ids drawn with heavy repeats
                st.integers(min_value=0, max_value=40).map(lambda i: f"t{i}"),
                min_size=1,
                max_size=400,
            ),
            n_batches=st.integers(min_value=1, max_value=7),
        )
        def prop(stream, n_batches):
            size = max(1, len(stream) // n_batches)
            batches = [
                pd.DataFrame({"term": stream[i:i + size]})
                for i in range(0, len(stream), size)
            ]
            (out,) = _mg_candidates(iter(batches))
            cands = set(out["term"])
            counts = Counter(stream)
            heavy = {t for t, c in counts.items() if c * HH_CAPACITY > len(stream)}
            assert heavy <= cands, (heavy - cands, len(stream))

        prop()


def test_stateful_counts_transform_with_state(spark, sf_dir):
    """Spark 4's transformWithStateInPandas twin of the stateful-counts
    operator: same per-user totals as the batch groupBy. The tws
    Python worker needs google.protobuf (its state-server protocol);
    absent in this container, so this runs where the dependency
    exists and documents the API parity honestly otherwise."""
    import pytest

    pytest.importorskip("google.protobuf")
    from pyspark.sql import functions as F

    from deep_field_spark.catalog import table
    from deep_field_spark.streaming import windows as SW

    got = {
        (r.user_id, r.n_events)
        for r in SW.stateful_user_counts_tws(spark, sf_dir).collect()
    }
    expect = {
        (r.user_id, r.n)
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == expect


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    """corpus_weighted_sample is weight-proportional (A-ES): the
    selected docs' mean n_chars must exceed the corpus mean — the
    whole point of weighting; a uniform sampler has no such bias."""
    from pyspark.sql import functions as F

    from deep_field_spark.queries import load_registry

    reg = load_registry()
    sel = reg["corpus_weighted_sample"].fn(spark, sf_dir)
    sel_mean = sel.agg(F.avg("n_chars")).first()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    all_mean = docs.agg(F.avg("n_chars")).first()[0]
    assert sel_mean > all_mean * 1.05, (sel_mean, all_mean)


class TestDecontamBloom:
    """queries/curation.py:decontam_bloom — bloom-prefilter + exact
    verify must EQUAL the exact twin, and the prefilter must really
    prune (the whole point) without false negatives."""

    def test_equals_exact_twin(self, spark, sf_dir):
        from deep_field_spark.queries import load_registry

        reg = load_registry()
        a = {
            (r.doc_id, r.n_shared_grams)
            for r in reg["decontam_bloom"].fn(spark, sf_dir).collect()
        }
        b = {
            (r.doc_id, r.n_shared_grams)
            for r in reg["decontam_ngram_overlap"].fn(spark, sf_dir).collect()
        }
        assert a == b and len(a) > 0

    def test_prunes_without_false_negatives(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from deep_field_spark.queries.curation import _bloom_survivors

        corpus, bench, might = _bloom_survivors(spark, sf_dir)
        n_corpus = corpus.count()
        n_might = might.count()
        true_hits = corpus.join(F.broadcast(bench), "gram").count()
        assert true_hits <= n_might, "bloom dropped a true hit (FN)"
        assert n_might < n_corpus * 0.05, (
            f"bloom pruned nothing: {n_might}/{n_corpus} survive"
        )
